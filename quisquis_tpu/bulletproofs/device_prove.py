"""Fully on-device batched range-proof PROVING.

The reference proves range proofs one at a time on the CPU
(/root/reference/src/accounts/prover.rs:544-591 calling the vendored
crate's `prove_multiple`). Round 2 proved the hard sub-problems — batched
STROBE transcripts, mod-l challenge arithmetic, batched point kernels —
for *verification*; this module applies the same machinery to proving,
the larger half of the workload (prove is ~6x verify on the host).

For B proofs of one shape (n bits, m values) the ENTIRE prover runs as one
jitted program:

  upload:  witness bits, value/blinding scalars, the host-drawn random
           scalars (a/s blindings, s_L, s_R — drawn per lane from the
           caller's RNG in exactly the host prover's order, so outputs are
           byte-identical under a pinned seed), STROBE prefix states
  device:  V commitments -> A (bit-select sum) and S in one shared-base
           MSM -> challenges y, z -> t-polynomial inner products ->
           T1/T2 -> x, w -> l, r vectors -> the IPP rounds, with each
           round's L/R computed as a shared-base MSM over the ORIGINAL
           generator basis (per-original-index coefficient vectors cG/cH
           updated by u^{+-1} each round — no point-vector folding at
           all), challenges replayed on the batched device transcript
  fetch:   every proof component (compressed points + canonical scalars)

Byte-identical to RangeProof.prove_multiple under the same RNG stream
(tests/test_device_prove.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import exact as ex
from ..ops import field as fe
from ..ops import point as pt
from ..ops import msm as qmsm
from ..ops import scalar_field as sf
from ..ops.device_strobe import (DeviceStrobe, DeviceTranscript,
                                 snapshot_host_strobe)
from ..primitives.pedersen import default_pedersen_gens
from .generators import bulletproof_gens
from .inner_product import InnerProductProof
from .range_proof import RangeProof

L = ex.L

_msm_shared_xla = jax.jit(qmsm.msm_shared_base_raw)


def _msm_shared(nib: jnp.ndarray, basis: pt.ExtPoint) -> pt.ExtPoint:
    """Shared-basis rows MSM: nib [..., R, k, 64] over basis [k] -> [..., R].

    Pallas rows pipeline on a real TPU (the XLA shared-base form is
    dispatch-bound: measured 4.8 s/proof at agg m=16 on-chip — ~7,000
    sequential tiny ops per program); XLA elsewhere (CPU tests)."""
    if jax.default_backend() != "tpu":
        return _msm_shared_xla(nib, basis)
    from ..ops import pallas_point as kp

    lead = nib.shape[:-2]
    k = nib.shape[-2]
    flat = nib.reshape((-1, k, 64))
    R = flat.shape[0]
    bpts = pt.ExtPoint(*(jnp.broadcast_to(c[None], (R,) + c.shape)
                         for c in basis))
    out = kp.msm_rows_pallas(flat, bpts)
    return pt.ExtPoint(*(c.reshape(lead + c.shape[1:]) for c in out))


def _sf_tree_sum(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-2]
    while n > 1:
        if n % 2:
            x = jnp.concatenate([x, sf.zeros(x.shape[:-2] + (1,))], axis=-2)
            n += 1
        h = n // 2
        x = sf.add(x[..., :h, :], x[..., h:, :])
        n = h
    return x[..., 0, :]


def _inner(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _sf_tree_sum(sf.mul(a, b))


_pack_bytes32 = jax.jit(sf._pack_bytes)


class DeviceRangeProver:
    """Compiled batched prover for aggregated range proofs of a fixed
    shape (n bits, m values per proof, B proofs per batch).

    Usage::

        drp = DeviceRangeProver(n=64, m=16, batch=8)
        proofs, vlists = drp.prove(values, blindings, rngs=rngs)

    `transcripts` (optional) are per-lane host Transcript objects in the
    pre-proof state; the host-side transcripts are NOT advanced (callers
    embedding these proofs should advance with proof.advance_transcript).
    """

    def __init__(self, n: int, m: int, batch: int,
                 transcript_label: bytes = b"RangeProof"):
        assert m & (m - 1) == 0
        assert n in (8, 16, 32, 64)
        self.n, self.m, self.batch = n, m, batch
        self.label = bytes(transcript_label)
        self.nm = n * m
        self.k = self.nm.bit_length() - 1
        pc = default_pedersen_gens()
        bp = bulletproof_gens(n, m)
        self._G = bp.G(n, m)
        self._H = bp.H(n, m)
        # MSM basis order: [B_pt, B_blinding, G..., H...]
        self._basis = pt.from_exact_batch(
            [pc.B, pc.B_blinding] + self._G + self._H)
        self._prove_jit = jax.jit(self._build, static_argnums=5)

    # ------------------------------------------------------------- device

    def _build(self, vb, blb, bits, svecs, rand4, frame, states):
        """vb/blb: [B, m, 32] value/blinding scalar bytes; bits: [B, nm]
        int32 in {0,1}; svecs: [B, 2, nm, 32] (s_L, s_R); rand4:
        [B, 4, 32] (a_blinding, s_blinding, t1_blinding, t2_blinding);
        states: [B, 200]; frame: static STROBE frame."""
        # B from the input shape (not self.batch): under shard_map the
        # program runs per-shard with a sliced lane axis
        n, m, B, nm, k = self.n, self.m, vb.shape[0], self.nm, self.k
        v = sf.from_bytes(vb)                       # [B, m, 24]
        bl = sf.from_bytes(blb)
        s_L = sf.from_bytes(svecs[:, 0])            # [B, nm, 24]
        s_R = sf.from_bytes(svecs[:, 1])
        a_blind = sf.from_bytes(rand4[:, 0])
        s_blind = sf.from_bytes(rand4[:, 1])
        t1_blind = sf.from_bytes(rand4[:, 2])
        t2_blind = sf.from_bytes(rand4[:, 3])
        one = sf.one((B,))

        basis = self._basis                         # [2 + 2nm]
        zero_col = sf.zeros((B, 1))

        # ----- V, A, S in ONE shared-base MSM: rows per lane =
        #   m rows (V_j) + A row + S row over [B_pt, B~, G, H]
        bit_sc = jnp.where(bits[..., None] == 1,
                           sf.one((B, nm)), sf.zeros((B, nm)))  # [B, nm, 24]
        neg1 = sf.neg(one)                                       # [B, 24]
        aR_sc = jnp.where(bits[..., None] == 1, sf.zeros((B, nm)),
                          jnp.broadcast_to(neg1[:, None, :],
                                           (B, nm, sf.NLIMBS)))
        zero_nm = sf.zeros((B, nm))
        v_rows = []
        for j in range(m):
            row = jnp.concatenate([
                v[:, j:j + 1], bl[:, j:j + 1], zero_nm, zero_nm], axis=1)
            v_rows.append(row)
        a_row = jnp.concatenate([zero_col, a_blind[:, None], bit_sc, aR_sc],
                                axis=1)
        s_row = jnp.concatenate([zero_col, s_blind[:, None], s_L, s_R],
                                axis=1)
        rows = jnp.stack(v_rows + [a_row, s_row], axis=1)  # [B, m+2, 2+2nm, 24]
        pts_out = _msm_shared(sf.to_nibbles(rows), basis)  # [B, m+2] points
        enc = _pack_bytes32(pt.compress_raw(pts_out))      # [B, m+2, 32]
        V_b = enc[:, :m]
        A_b = enc[:, m]
        S_b = enc[:, m + 1]

        # ----- transcript to y, z -----
        dt = object.__new__(DeviceTranscript)
        dt.strobe = DeviceStrobe.from_host_states(states, *frame)
        dt.append_message(b"dom-sep", b"rangeproof v1")
        dt.append_u64(b"n", n)
        dt.append_u64(b"m", m)
        for j in range(m):
            dt.append_message(b"V", V_b[:, j], 32)
        dt.append_message(b"A", A_b, 32)
        dt.append_message(b"S", S_b, 32)
        y = sf.from_bytes_wide(dt.get_challenge_bytes(b"y"))
        z = sf.from_bytes_wide(dt.get_challenge_bytes(b"z"))

        # ----- t polynomial -----
        y_nm = sf.powers(y, nm)                     # [B, nm, 24]
        z_pows = sf.powers(z, m + 2)
        z2 = z_pows[..., 2, :]
        two_pows = jnp.asarray(sf.from_int_batch([1 << i for i in range(n)]))
        zeta = sf.mul(z_pows[..., 2:2 + m, :][..., :, None, :],
                      two_pows[None, None, :, :]).reshape((B, nm, sf.NLIMBS))
        zb = jnp.broadcast_to(z[:, None, :], (B, nm, sf.NLIMBS))
        l0 = sf.sub(bit_sc, zb)
        l1 = s_L
        r0 = sf.add(sf.mul(y_nm, sf.add(aR_sc, zb)), zeta)
        r1 = sf.mul(y_nm, s_R)
        t0 = _inner(l0, r0)
        t2 = _inner(l1, r1)
        t1 = sf.sub(sf.sub(_inner(sf.add(l0, l1), sf.add(r0, r1)), t0), t2)

        # T1 = t1 B + t1b B~ ; T2 = t2 B + t2b B~
        t_rows = jnp.stack([
            jnp.stack([t1, t1_blind], axis=1),
            jnp.stack([t2, t2_blind], axis=1)], axis=1)    # [B, 2, 2, 24]
        T_pts = _msm_shared(sf.to_nibbles(t_rows),
                            pt.ExtPoint(*(c[:2] for c in basis)))
        T_enc = _pack_bytes32(pt.compress_raw(T_pts))      # [B, 2, 32]
        dt.append_message(b"T_1", T_enc[:, 0], 32)
        dt.append_message(b"T_2", T_enc[:, 1], 32)
        x = sf.from_bytes_wide(dt.get_challenge_bytes(b"x"))

        xsq = sf.mul(x, x)
        t_x = sf.add(t0, sf.add(sf.mul(t1, x), sf.mul(t2, xsq)))
        txb = sf.add(sf.mul(t1_blind, x), sf.mul(t2_blind, xsq))
        # + sum_j z^{2+j} blinding_j
        zj = z_pows[..., 2:2 + m, :]
        txb = sf.add(txb, _sf_tree_sum(sf.mul(zj, bl)))
        e_blind = sf.add(a_blind, sf.mul(x, s_blind))
        t_x_bytes = sf.to_bytes_array(t_x)
        txb_bytes = sf.to_bytes_array(txb)
        eb_bytes = sf.to_bytes_array(e_blind)
        dt.append_scalar_var(b"t_x", t_x_bytes)
        dt.append_scalar_var(b"t_x_blinding", txb_bytes)
        dt.append_scalar_var(b"e_blinding", eb_bytes)
        w = sf.from_bytes_wide(dt.get_challenge_bytes(b"w"))

        # ----- IPP (l, r vectors; L/R as shared-base MSMs over the
        #       original [B_pt, G, H] basis via coefficient vectors) -----
        dt.append_message(b"dom-sep", b"ipp v1")
        dt.append_u64(b"n", nm)
        a_vec = sf.add(l0, sf.mul(l1, x[:, None, :]))      # [B, nm]
        b_vec = sf.add(r0, sf.mul(r1, x[:, None, :]))
        cG = sf.one((B, nm))                                # G_factors
        cH = sf.powers(sf.invert(y), nm)                    # H_factors y^-i
        ipp_basis = pt.ExtPoint(*(
            jnp.concatenate([c[0:1], c[2:]], axis=0) for c in basis))
        L_out, R_out = [], []
        ncur = nm
        for rnd in range(k):
            ncur //= 2
            a_lo, a_hi = a_vec[:, :ncur], a_vec[:, ncur:]
            b_lo, b_hi = b_vec[:, :ncur], b_vec[:, ncur:]
            c_Lw = sf.mul(_inner(a_lo, b_hi), w)
            c_Rw = sf.mul(_inner(a_hi, b_lo), w)
            # original index t folds via bit (k-1-rnd) of t; position
            # within the current half is t mod ncur... on the ORIGINAL
            # basis: t's current position p = t mod (2*ncur'),... with
            # MSB-first consumption: idx_map[t] = t mod ncur after
            # masking; hi-half mask = bit (k-1-rnd) of t
            tidx = np.arange(nm)
            hi_mask = ((tidx >> (k - 1 - rnd)) & 1).astype(bool)
            pos = (tidx % ncur).astype(np.int32)
            himask = jnp.asarray(hi_mask)[None, :, None]
            posj = jnp.asarray(pos)
            aw_lo = jnp.take(a_lo, posj, axis=1)            # [B, nm, 24]
            aw_hi = jnp.take(a_hi, posj, axis=1)
            bw_lo = jnp.take(b_lo, posj, axis=1)
            bw_hi = jnp.take(b_hi, posj, axis=1)
            zeros = sf.zeros((B, nm))
            # L: a_lo on G_hi-part, b_hi on H_lo-part
            gL = jnp.where(himask, sf.mul(aw_lo, cG), zeros)
            hL = jnp.where(himask, zeros, sf.mul(bw_hi, cH))
            gR = jnp.where(himask, zeros, sf.mul(aw_hi, cG))
            hR = jnp.where(himask, sf.mul(bw_lo, cH), zeros)
            rows = jnp.stack([
                jnp.concatenate([c_Lw[:, None], gL, hL], axis=1),
                jnp.concatenate([c_Rw[:, None], gR, hR], axis=1)],
                axis=1)                                     # [B, 2, 1+2nm]
            LR = _msm_shared(sf.to_nibbles(rows), ipp_basis)
            LR_enc = _pack_bytes32(pt.compress_raw(LR))     # [B, 2, 32]
            L_out.append(LR_enc[:, 0])
            R_out.append(LR_enc[:, 1])
            dt.append_message(b"L", LR_enc[:, 0], 32)
            dt.append_message(b"R", LR_enc[:, 1], 32)
            u = sf.from_bytes_wide(dt.get_challenge_bytes(b"u"))
            u_inv = sf.invert(u)
            ub = u[:, None, :]
            uib = u_inv[:, None, :]
            a_vec = sf.add(sf.mul(a_lo, ub), sf.mul(a_hi, uib))
            b_vec = sf.add(sf.mul(b_lo, uib), sf.mul(b_hi, ub))
            cG = sf.mul(cG, jnp.where(himask, jnp.broadcast_to(
                ub, (B, nm, sf.NLIMBS)), jnp.broadcast_to(
                uib, (B, nm, sf.NLIMBS))))
            cH = sf.mul(cH, jnp.where(himask, jnp.broadcast_to(
                uib, (B, nm, sf.NLIMBS)), jnp.broadcast_to(
                ub, (B, nm, sf.NLIMBS))))

        a_fin = sf.to_bytes_array(a_vec[:, 0])
        b_fin = sf.to_bytes_array(b_vec[:, 0])
        L_arr = jnp.stack(L_out, axis=1) if k else jnp.zeros((B, 0, 32),
                                                             jnp.int32)
        R_arr = jnp.stack(R_out, axis=1) if k else jnp.zeros((B, 0, 32),
                                                             jnp.int32)
        return (V_b, A_b, S_b, T_enc[:, 0], T_enc[:, 1],
                t_x_bytes, txb_bytes, eb_bytes, L_arr, R_arr, a_fin, b_fin)

    # --------------------------------------------------------------- host

    def _pack_lane(self, values_i, blindings_i, rng,
                   vb_i, blb_i, bits_i, svecs_i, rand4_i) -> None:
        """Pack one lane's witnesses, consuming `rng` in the host
        prover's exact draw order (range_proof.py prove_multiple):
        a_blinding, s_L, s_R, s_blinding, t1_blinding, t2_blinding."""
        n, m, nm = self.n, self.m, self.nm
        if len(values_i) != m:
            raise ValueError("value count mismatch")
        for v in values_i:
            if not 0 <= v < (1 << n):
                raise ValueError(f"value out of range for {n}-bit proof")
        for j, (v, b_) in enumerate(zip(values_i, blindings_i)):
            vb_i[j] = np.frombuffer(ex.sc_to_bytes(v), np.uint8)
            blb_i[j] = np.frombuffer(ex.sc_to_bytes(b_), np.uint8)
            for kk in range(n):
                bits_i[j * n + kk] = (v >> kk) & 1
        rand4_i[0] = np.frombuffer(
            ex.sc_to_bytes(rng.random_scalar()), np.uint8)
        for t in range(2):
            for idx in range(nm):
                svecs_i[t, idx] = np.frombuffer(
                    ex.sc_to_bytes(rng.random_scalar()), np.uint8)
        for t in (1, 2, 3):
            rand4_i[t] = np.frombuffer(
                ex.sc_to_bytes(rng.random_scalar()), np.uint8)

    def prove(self, values: Sequence[Sequence[int]],
              blindings: Sequence[Sequence[int]],
              rngs: Sequence, transcripts=None
              ) -> Tuple[List[RangeProof], List[List[bytes]]]:
        """values/blindings: B lanes of m entries; rngs: one SeededRng per
        lane (drawn in the host prover's exact order). Returns
        (RangeProof list, V byte lists), byte-identical to the host
        prover under the same RNG streams."""
        from ..accounts.transcript import Transcript

        n, m, B, nm = self.n, self.m, self.batch, self.nm
        if len(values) != B or len(blindings) != B or len(rngs) != B:
            raise ValueError("lane count mismatch")
        vb = np.zeros((B, m, 32), np.uint8)
        blb = np.zeros((B, m, 32), np.uint8)
        bits = np.zeros((B, nm), np.int32)
        svecs = np.zeros((B, 2, nm, 32), np.uint8)
        rand4 = np.zeros((B, 4, 32), np.uint8)
        for i in range(B):
            self._pack_lane(values[i], blindings[i], rngs[i],
                            vb[i], blb[i], bits[i], svecs[i], rand4[i])
        if transcripts is None:
            transcripts = [Transcript(self.label) for _ in range(B)]
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        if any(s[1:] != frame for s in snaps):
            raise ValueError("lane transcripts diverged in framing")
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        out = self._prove_jit(jnp.asarray(vb.astype(np.int32)),
                              jnp.asarray(blb.astype(np.int32)),
                              jnp.asarray(bits),
                              jnp.asarray(svecs.astype(np.int32)),
                              jnp.asarray(rand4.astype(np.int32)),
                              frame, jnp.asarray(states))
        return self._decode(out)

    def prove_sharded(self, values: Sequence[Sequence[int]],
                      blindings: Sequence[Sequence[int]],
                      rngs: Sequence, mesh, transcripts=None
                      ) -> Tuple[List[RangeProof], List[List[bytes]]]:
        """prove() with the lane (batch) axis sharded over `mesh`.

        Aggregated range proving is embarrassingly parallel across lanes
        (BASELINE config 4 at multi-chip scale): each device runs the
        full one-program prover on its lane slice; no collectives —
        outputs stay lane-sharded until fetch. Byte-identical to prove()
        (virtual-mesh identity test: tests/test_sharded_prove.py)."""
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        from ..accounts.transcript import Transcript

        ndev = mesh.devices.size
        if self.batch % ndev:
            raise ValueError(f"batch {self.batch} not divisible by "
                             f"{ndev} devices")
        n, m, B, nm = self.n, self.m, self.batch, self.nm
        if len(values) != B or len(blindings) != B or len(rngs) != B:
            raise ValueError("lane count mismatch")
        vb = np.zeros((B, m, 32), np.uint8)
        blb = np.zeros((B, m, 32), np.uint8)
        bits = np.zeros((B, nm), np.int32)
        svecs = np.zeros((B, 2, nm, 32), np.uint8)
        rand4 = np.zeros((B, 4, 32), np.uint8)
        for i in range(B):
            self._pack_lane(values[i], blindings[i], rngs[i],
                            vb[i], blb[i], bits[i], svecs[i], rand4[i])
        if transcripts is None:
            transcripts = [Transcript(self.label) for _ in range(B)]
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        if any(s[1:] != frame for s in snaps):
            raise ValueError("lane transcripts diverged in framing")
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        axis = mesh.axis_names[0]
        spec = P(axis)

        @partial(shard_map, mesh=mesh, in_specs=(spec,) * 6,
                 out_specs=spec)
        def run(v, bl, bt, sv, r4, st):
            return self._build(v, bl, bt, sv, r4, frame, st)

        # jit the shard_map: an eager shard_map call runs the body
        # op-by-op per shard (measured 838 s on the virtual mesh) and
        # never reaches the persistent cache
        out = jax.jit(run)(jnp.asarray(vb.astype(np.int32)),
                           jnp.asarray(blb.astype(np.int32)),
                           jnp.asarray(bits),
                           jnp.asarray(svecs.astype(np.int32)),
                           jnp.asarray(rand4.astype(np.int32)),
                           jnp.asarray(states))
        return self._decode(out)

    def _decode(self, out) -> Tuple[List[RangeProof], List[List[bytes]]]:
        """Decode the 12 jit output arrays into (proofs, V byte lists)."""
        (V_b, A_b, S_b, T1_b, T2_b, txb_, txbb_, ebb_, L_arr, R_arr,
         a_fin, b_fin) = [np.asarray(o).astype(np.uint8) for o in out]
        B, m = self.batch, self.m
        proofs, vlists = [], []
        for i in range(B):
            ipp = InnerProductProof(
                [bytes(L_arr[i, r]) for r in range(self.k)],
                [bytes(R_arr[i, r]) for r in range(self.k)],
                int.from_bytes(bytes(a_fin[i]), "little"),
                int.from_bytes(bytes(b_fin[i]), "little"))
            proofs.append(RangeProof(
                bytes(A_b[i]), bytes(S_b[i]), bytes(T1_b[i]), bytes(T2_b[i]),
                int.from_bytes(bytes(txb_[i]), "little"),
                int.from_bytes(bytes(txbb_[i]), "little"),
                int.from_bytes(bytes(ebb_[i]), "little"), ipp))
            vlists.append([bytes(V_b[i, j]) for j in range(m)])
        return proofs, vlists

    def warmup(self, transcripts=None) -> None:
        """Compile (or cache-load) this shape bucket's prover program up
        front on zero inputs (the arithmetic is input-independent), so the
        first real batch proves at steady-state latency."""
        from ..accounts.transcript import Transcript

        B, m, nm = self.batch, self.m, self.nm
        if transcripts is None:
            transcripts = [Transcript(self.label) for _ in range(B)]
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        out = self._prove_jit(
            jnp.asarray(np.zeros((B, m, 32), np.int32)),
            jnp.asarray(np.zeros((B, m, 32), np.int32)),
            jnp.asarray(np.zeros((B, nm), np.int32)),
            jnp.asarray(np.zeros((B, 2, nm, 32), np.int32)),
            jnp.asarray(np.zeros((B, 4, 32), np.int32)),
            frame, jnp.asarray(states))
        np.asarray(out[0])   # force execution through the axon tunnel


# ---------------------------------------------------------------------------
# production dispatch: shape-bucketed prover instances
# ---------------------------------------------------------------------------

_PROVER_CACHE: dict = {}


def get_device_range_prover(n: int, m: int, batch: int,
                            transcript_label: bytes = b"RangeProof"
                            ) -> DeviceRangeProver:
    """Process-wide cache of compiled prover instances, keyed by shape."""
    key = (n, m, batch, bytes(transcript_label))
    p = _PROVER_CACHE.get(key)
    if p is None:
        p = _PROVER_CACHE.setdefault(
            key, DeviceRangeProver(n, m, batch, transcript_label))
    return p
