"""Fully on-device batched range-proof verification.

The reference verifies range proofs one at a time on the CPU
(/root/reference/src/accounts/verifier.rs:504-555 calling the vendored
crate's `verify_multiple`). Round-1 profiling showed the TPU can't win
that workload by accelerating only the final MSM: after cross-proof
coalescing the MSM is a few thousand terms, and per-call host<->device
latency dwarfs the compute. The TPU-native answer is to put the ENTIRE
verifier — Fiat-Shamir transcript replay, challenge arithmetic mod l, and
the combined multiscalar multiplication — inside ONE jitted program:

  upload:  proof bytes (SoA uint8), value commitments, random weights
  device:  batched STROBE transcripts (ops/device_strobe.py)
           -> challenges y, z, x, w, u_j     (ops/scalar_field.py)
           -> verification scalars (powers, Fermat/batch inversion, the
              IPP s-vector), both check equations per proof
           -> one MSM over [static generators | per-proof points]
  fetch:   one boolean

Static generators (BulletproofGens G/H, the Pedersen base pair) are
decompressed and resident on device from construction, so per-request
traffic is proof material only. Soundness of the combination is the same
random-linear-combination argument as accounts/deferred.py: every check of
every proof carries an independent unpredictable 128-bit weight (sampled
on the host, uploaded with the batch).

Bit-exact with the host verifier: accepts exactly the proofs
RangeProof.verify_multiple accepts (tests/test_device_range_verify.py).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

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

L = ex.L


def _sf_tree_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Mod-l sum along axis -2 (log-depth, fixed order)."""
    n = x.shape[-2]
    while n > 1:
        if n % 2:
            x = jnp.concatenate(
                [x, sf.zeros(x.shape[:-2] + (1,))], axis=-2)
            n += 1
        h = n // 2
        x = sf.add(x[..., :h, :], x[..., h:, :])
        n = h
    return x[..., 0, :]


def _sf_tree_prod(x: jnp.ndarray) -> jnp.ndarray:
    """Mod-l product along axis -2 (log-depth, fixed order)."""
    n = x.shape[-2]
    while n > 1:
        if n % 2:
            one = sf.one(x.shape[:-2] + (1,))
            x = jnp.concatenate([x, one], axis=-2)
            n += 1
        h = n // 2
        x = sf.mul(x[..., :h, :], x[..., h:, :])
        n = h
    return x[..., 0, :]


#: loose scalar limbs [..., 24] -> [..., 64] canonical 4-bit MSM digits
_to_nibbles = sf.to_nibbles

_P_DIGITS = np.array([(ex.P >> (fe.BITS * i)) & fe.MASK
                      for i in range(fe.NLIMBS)], dtype=np.int32)


def _decompress_u8_impl(b: jnp.ndarray):
    """[..., 32] int32 byte encodings -> (ok, ExtPoint), canonicity included.

    Device-side version of point.decompress_from_bytes: the value-<p check
    runs in limb space (no host trip). Byte->limb extraction and the
    canonicity compare are fully vectorized (constant-index gathers).
    """
    raw = sf._limbs_from_bytes(b, fe.NLIMBS)   # same 11x24 radix as field
    ge_p = sf._lex_ge(raw, _P_DIGITS)
    masked = raw.at[..., fe.NLIMBS - 1].set(raw[..., fe.NLIMBS - 1] & 3)
    # bit 255 set is also non-canonical; from_bytes masks it, detect here
    top_bit = (b[..., 31] >> 7) & 1
    ok_enc = jnp.logical_and(jnp.logical_not(ge_p), top_bit == 0)
    ok, p = pt.decompress_raw(masked)
    return jnp.logical_and(ok, ok_enc), p


_decompress_u8 = jax.jit(_decompress_u8_impl)
_msm_jit = jax.jit(qmsm.msm_raw)


def _ext_concat(points: List[pt.ExtPoint]) -> pt.ExtPoint:
    return pt.ExtPoint(*(jnp.concatenate([getattr(p_, c) for p_ in points],
                                         axis=0)
                         for c in ("x", "y", "z", "t")))


class DeviceRangeVerifier:
    """Compiled batched verifier for aggregated range proofs of a fixed
    shape (n bits, m values per proof, B proofs per batch).

    Usage::

        drv = DeviceRangeVerifier(n=64, m=16, batch=64)
        drv.verify(proofs, value_commitment_lists)   # raises ValueError

    Each call uploads proof bytes + fresh host-sampled weights and fetches
    one boolean. Transcripts are fresh `Transcript(label)` per proof (pass
    `transcript_label`); for proofs embedded in a larger protocol, pass
    per-proof host transcripts to `verify(..., transcripts=...)` — the
    replayed prefix states ship with the batch and the (static) prefix
    framing selects a jit specialization, so mixed standalone/embedded
    flows coexist in the compilation cache.
    """

    def __init__(self, n: int, m: int, batch: int,
                 transcript_label: bytes = b"RangeProof"):
        assert m & (m - 1) == 0
        self.n, self.m, self.batch = n, m, batch
        self.label = bytes(transcript_label)
        self.nm = n * m
        self.k = self.nm.bit_length() - 1  # log2 rounds
        pc = default_pedersen_gens()
        bp = bulletproof_gens(n, m)
        G = bp.G(n, m)
        H = bp.H(n, m)
        # device-resident static generators: [2 + 2nm] points
        self._static = pt.from_exact_batch([pc.B, pc.B_blinding] + G + H)
        self._verify_jit = jax.jit(self._build, static_argnums=4)
        #: final MSM backend: Pallas pipeline on a real TPU for batches
        #: that amortize it; XLA form on CPU and under shard_map
        #: (verify_sharded clears the flag around its trace)
        self._use_pallas_msm = jax.default_backend() == "tpu"

    # -- device program ------------------------------------------------------

    def _build(self, comp, scal, weights, states, frame):
        """comp: [B, P, 32] compressed points (V m | A S T1 T2 | L k | R k);
        scal: [B, 5, 32] (t_x, t_x_blinding, e_blinding, ipp a, ipp b);
        weights: [B, 2, 64] uniform bytes; states: [B, 200] STROBE states;
        frame: static (pos, pos_begin, cur_flags) of the uploaded states.
        """
        # B from the input shape (not self.batch): under shard_map the
        # program runs on a per-device slice of the lane axis
        n, m, nm, k = self.n, self.m, self.nm, self.k
        B = comp.shape[0]
        ok_pts, pts = _decompress_u8(comp)       # [B, P], points [B, P]
        all_ok = jnp.all(ok_pts)

        t_x = sf.from_bytes(scal[:, 0])
        t_x_b = sf.from_bytes(scal[:, 1])
        e_b = sf.from_bytes(scal[:, 2])
        ipp_a = sf.from_bytes(scal[:, 3])
        ipp_b = sf.from_bytes(scal[:, 4])
        w1 = sf.from_bytes_wide(weights[:, 0])
        w2 = sf.from_bytes_wide(weights[:, 1])

        # canonical byte views for transcript appends (host appends
        # sc_to_bytes(reduced scalar), so device must re-canonicalize)
        t_x_bytes = sf.to_bytes_array(t_x)
        t_x_b_bytes = sf.to_bytes_array(t_x_b)
        e_b_bytes = sf.to_bytes_array(e_b)

        dt = object.__new__(DeviceTranscript)
        dt.strobe = DeviceStrobe.from_host_states(states, *frame)

        dt.append_message(b"dom-sep", b"rangeproof v1")
        dt.append_u64(b"n", n)
        dt.append_u64(b"m", m)
        for j in range(m):
            dt.append_message(b"V", comp[:, j], 32)
        dt.append_message(b"A", comp[:, m], 32)
        dt.append_message(b"S", comp[:, m + 1], 32)
        y = sf.from_bytes_wide(dt.get_challenge_bytes(b"y"))
        z = sf.from_bytes_wide(dt.get_challenge_bytes(b"z"))
        dt.append_message(b"T_1", comp[:, m + 2], 32)
        dt.append_message(b"T_2", comp[:, m + 3], 32)
        x = sf.from_bytes_wide(dt.get_challenge_bytes(b"x"))
        dt.append_scalar_var(b"t_x", t_x_bytes)
        dt.append_scalar_var(b"t_x_blinding", t_x_b_bytes)
        dt.append_scalar_var(b"e_blinding", e_b_bytes)
        w = sf.from_bytes_wide(dt.get_challenge_bytes(b"w"))
        # IPP rounds
        dt.append_message(b"dom-sep", b"ipp v1")
        dt.append_u64(b"n", nm)
        u = []
        for j in range(k):
            dt.append_message(b"L", comp[:, m + 4 + j], 32)
            dt.append_message(b"R", comp[:, m + 4 + k + j], 32)
            u.append(sf.from_bytes_wide(dt.get_challenge_bytes(b"u")))
        u = jnp.stack(u, axis=-2)                  # [B, k, 24]

        # ----- scalar work (loose limbs mod l) -----
        y_pows = sf.powers(y, nm)                  # [B, nm, 24]
        y_inv = sf.invert(y)
        h_fact = sf.powers(y_inv, nm)              # y^-i
        z_pows = sf.powers(z, m + 3)               # z^0..z^{m+2}
        z2 = z_pows[..., 2, :]
        two_pows = jnp.asarray(sf.from_int_batch(
            [1 << i for i in range(n)]))           # 2^i  [n, 24]
        # zeta[j, i] = z^{2+j} * 2^i  -> flatten [B, nm]
        zeta = sf.mul(z_pows[..., 2:2 + m, :][..., :, None, :],
                      two_pows[None, None, :, :])        # [B, m, n, 24]
        zeta = zeta.reshape((B, nm, sf.NLIMBS))

        # delta(y,z) = (z - z^2) sum(y^i) - sum_j z^{3+j} * (2^n - 1)
        sum_y = _sf_tree_sum(y_pows)
        sum_2m = sf.const((1 << n) - 1, (B,))
        zj3 = z_pows[..., 3:3 + m, :]
        sum_z3 = _sf_tree_sum(zj3)
        delta = sf.sub(sf.mul(sf.sub(z, z2), sum_y),
                       sf.mul(sum_z3, sum_2m))

        # IPP verification scalars
        u_inv = sf.batch_invert_rows(u)            # [B, k, 24]
        u_sq = sf.mul(u, u)
        u_inv_sq = sf.mul(u_inv, u_inv)
        s0 = _sf_tree_prod(u_inv)                  # [B, 24]
        # s_i = s0 * prod_{j: bit_{k-1-j}(i)} u_sq[j]
        s_vec = jnp.broadcast_to(s0[:, None, :], (B, nm, sf.NLIMBS))
        for j in range(k):
            bit = (np.arange(nm) >> (k - 1 - j)) & 1   # [nm] constants
            mult = jnp.where(jnp.asarray(bit[None, :, None] == 1),
                             u_sq[:, j, None, :],
                             sf.one((B, nm)))
            s_vec = sf.mul(s_vec, mult)
        s_inv_vec = s_vec[:, ::-1, :]              # 1/s_i = s_{nm-1-i}

        # ----- check 1 (t-poly):  w1 * [ (t_x - delta) B + t_x_b B~
        #                                 - sum z^{2+j} V_j - x T1 - x^2 T2 ]
        c1_B = sf.mul(w1, sf.sub(t_x, delta))
        c1_Bb = sf.mul(w1, t_x_b)
        c1_V = sf.neg(sf.mul(w1[:, None, :], z_pows[..., 2:2 + m, :]))  # [B,m]
        c1_T1 = sf.neg(sf.mul(w1, x))
        c1_T2 = sf.neg(sf.mul(w1, sf.mul(x, x)))

        # ----- check 2 (IPP commitment):
        #   w2 * [ A + x S - e_b B~ + w(t_x - a b) B + sum(-z - a s_i) G_i
        #          + sum((z y^i + zeta_i) Hf_i - b s_inv_i Hf_i) H_i
        #          + sum(u_sq L + u_inv_sq R) ]
        c2_A = w2
        c2_S = sf.mul(w2, x)
        c2_Bb = sf.neg(sf.mul(w2, e_b))
        ab = sf.mul(ipp_a, ipp_b)
        c2_B = sf.mul(w2, sf.mul(w, sf.sub(t_x, ab)))
        zb = jnp.broadcast_to(z[:, None, :], (B, nm, sf.NLIMBS))
        c2_G = sf.neg(sf.add(zb, sf.mul(ipp_a[:, None, :], s_vec)))
        h_scal = sf.mul(sf.add(sf.mul(zb, y_pows), zeta), h_fact)
        c2_H = sf.sub(h_scal,
                      sf.mul(sf.mul(ipp_b[:, None, :], s_inv_vec), h_fact))
        c2_G = sf.mul(w2[:, None, :], c2_G)
        c2_H = sf.mul(w2[:, None, :], c2_H)
        c2_L = sf.mul(w2[:, None, :], u_sq)
        c2_R = sf.mul(w2[:, None, :], u_inv_sq)

        # ----- assemble the single MSM -----
        # static points: [B_pedersen(2) | G nm | H nm], scalars summed over B
        st_B = sf.add(c1_B, c2_B)
        st_Bb = sf.add(c1_Bb, c2_Bb)
        static_scal = jnp.concatenate([
            st_B[:, None, :], st_Bb[:, None, :], c2_G, c2_H], axis=1)
        static_total = _sf_tree_sum(jnp.moveaxis(static_scal, 0, 1))
        # dynamic per-proof points: order must match `comp` layout
        dyn_scal = jnp.concatenate([
            c1_V,                                   # V_j
            c2_A[:, None, :], c2_S[:, None, :],
            c1_T1[:, None, :], c1_T2[:, None, :],
            c2_L, c2_R], axis=1)                    # [B, P, 24]

        all_scal = jnp.concatenate(
            [static_total, dyn_scal.reshape((-1, sf.NLIMBS))], axis=0)
        nib = _to_nibbles(all_scal)
        flat_pts = pt.ExtPoint(*(c.reshape((-1, fe.NLIMBS))
                                 for c in pts))
        all_pts = _ext_concat([self._static, flat_pts])
        if self._use_pallas_msm and all_scal.shape[0] >= 1024:
            from ..ops import pallas_point as kp

            total = kp.msm_pallas(nib, all_pts)
        else:
            total = _msm_jit(nib, all_pts)
        return jnp.logical_and(all_ok, pt.is_identity_raw(total))

    # -- host API --------------------------------------------------------------

    def _pack(self, proofs, value_commitments, transcripts):
        from ..accounts.transcript import Transcript

        B, m, k = self.batch, self.m, self.k
        if len(proofs) != B:
            raise ValueError(f"batch size mismatch: {len(proofs)} != {B}")
        comp = np.zeros((B, m + 4 + 2 * k, 32), dtype=np.uint8)
        scal = np.zeros((B, 5, 32), dtype=np.uint8)
        for i, (proof, V) in enumerate(zip(proofs, value_commitments)):
            if len(V) != m or len(proof.ipp_proof.L_vec) != k:
                raise ValueError("proof shape mismatch")
            rows = (list(V) + [proof.A, proof.S, proof.T_1, proof.T_2]
                    + list(proof.ipp_proof.L_vec) + list(proof.ipp_proof.R_vec))
            for j, rb in enumerate(rows):
                comp[i, j] = np.frombuffer(rb, np.uint8)
            svals = [proof.t_x, proof.t_x_blinding, proof.e_blinding,
                     proof.ipp_proof.a, proof.ipp_proof.b]
            for j, sv in enumerate(svals):
                scal[i, j] = np.frombuffer(ex.sc_to_bytes(sv), np.uint8)
        if transcripts is None:
            transcripts = [Transcript(self.label) for _ in range(B)]
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        if any(s[1:] != frame for s in snaps):
            raise ValueError("lane transcripts diverged in framing")
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        return comp.astype(np.int32), scal.astype(np.int32), states, frame

    def warmup(self, transcripts=None) -> None:
        """Compile (or cache-load) this shape bucket's program up front on
        zero inputs (identity points / zero scalars — same program, verdict
        discarded), so the first real batch runs at steady-state latency."""
        from ..accounts.transcript import Transcript

        B, m, k = self.batch, self.m, self.k
        if transcripts is None:
            transcripts = [Transcript(self.label) for _ in range(B)]
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        comp = np.zeros((B, m + 4 + 2 * k, 32), np.int32)
        scal = np.zeros((B, 5, 32), np.int32)
        weights = np.zeros((B, 2, 64), np.int32)
        bool(self._verify_jit(jnp.asarray(comp), jnp.asarray(scal),
                              jnp.asarray(weights), jnp.asarray(states),
                              frame))

    def verify(self, proofs: Sequence, value_commitments: Sequence[Sequence[bytes]],
               transcripts=None, rng: Optional[object] = None) -> None:
        """Verify a full batch; raises ValueError unless every proof passes."""
        comp, scal, states, frame = self._pack(proofs, value_commitments,
                                               transcripts)
        if rng is None:
            wbytes = os.urandom(self.batch * 2 * 64)
        else:
            wbytes = rng.fill_bytes(self.batch * 2 * 64)
        weights = np.frombuffer(wbytes, np.uint8).reshape(
            self.batch, 2, 64).astype(np.int32)
        ok = self._verify_jit(jnp.asarray(comp), jnp.asarray(scal),
                              jnp.asarray(weights), jnp.asarray(states),
                              frame)
        if not bool(ok):
            raise ValueError("Device batched range-proof verification failed")

    def verify_sharded(self, proofs, value_commitments, mesh,
                       transcripts=None, rng=None) -> None:
        """Verify the batch with the lane axis sharded over `mesh`
        (BASELINE config 4 at multi-chip scale): each device runs the full
        one-program verifier on its lane slice — transcript replay,
        challenge arithmetic, and its slice's MSM are entirely local, and
        the only collective is a one-integer psum of failure counts over
        ICI. Raises ValueError unless every lane on every device passes."""
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ndev = mesh.devices.size
        if self.batch % ndev:
            raise ValueError(f"batch {self.batch} not divisible by "
                             f"{ndev} devices")
        comp, scal, states, frame = self._pack(proofs, value_commitments,
                                               transcripts)
        nbytes = self.batch * 2 * 64
        wbytes = os.urandom(nbytes) if rng is None else rng.fill_bytes(nbytes)
        weights = np.frombuffer(wbytes, np.uint8).reshape(
            self.batch, 2, 64).astype(np.int32)
        axis = mesh.axis_names[0]
        spec = P(axis)

        @partial(shard_map, mesh=mesh, in_specs=(spec,) * 4, out_specs=P())
        def run(c, s, w, st):
            ok = self._build(c, s, w, st, frame)
            return jax.lax.psum(jnp.where(ok, 0, 1).astype(jnp.int32), axis)

        prev_pallas = self._use_pallas_msm
        self._use_pallas_msm = False     # captured at trace time below
        try:
            nbad = jax.jit(run)(jnp.asarray(comp), jnp.asarray(scal),
                                jnp.asarray(weights), jnp.asarray(states))
        finally:
            self._use_pallas_msm = prev_pallas
        if int(nbad):
            raise ValueError("Device batched range-proof verification "
                             "failed (sharded)")


# ---------------------------------------------------------------------------
# production dispatch: shape-bucketed verifier instances
# ---------------------------------------------------------------------------

_VERIFIER_CACHE: dict = {}


def get_device_range_verifier(n: int, m: int, batch: int,
                              transcript_label: bytes = b"RangeProof"
                              ) -> DeviceRangeVerifier:
    """Process-wide cache of compiled verifier instances, keyed by shape.

    XLA compiles one executable per (n, m, batch, prefix-frame); reusing
    instances keeps a serving process at a handful of resident programs.
    """
    key = (n, m, batch, bytes(transcript_label))
    v = _VERIFIER_CACHE.get(key)
    if v is None:
        v = _VERIFIER_CACHE.setdefault(
            key, DeviceRangeVerifier(n, m, batch, transcript_label))
    return v


def device_batch_verify(instances, n: int, rng=None,
                        min_bucket: int = 4) -> None:
    """Verify [(proof, value_commitments, transcript), ...] entirely on
    device: group by aggregation width m, pad each group to a power-of-two
    lane bucket (duplicate lanes re-verify an existing entry — harmless),
    and run each group as ONE jitted program.

    This is the TPU-native successor of the host `RangeProof.batch_verify`
    (reference hot path: /root/reference/src/accounts/verifier.rs:504-555):
    instead of replaying B transcripts serially on the host and evaluating
    one MSM, all B transcripts replay in lockstep on the VPU and the MSM
    runs in the same program. Raises ValueError if any proof fails.
    """
    groups: dict = {}
    for inst in instances:
        # bucket by aggregation width AND transcript framing: lanes of one
        # program must share the static STROBE frame (mixed standalone /
        # embedded proofs land in separate buckets)
        frame = snapshot_host_strobe(inst[2].strobe)[1:]
        groups.setdefault((len(inst[1]), frame), []).append(inst)
    for (m, _), group in sorted(groups.items()):
        B = max(min_bucket, 1 << (len(group) - 1).bit_length())
        padded = group + [group[0]] * (B - len(group))
        drv = get_device_range_verifier(n, m, B)
        drv.verify([p for p, _, _ in padded],
                   [V for _, V, _ in padded],
                   transcripts=[t for _, _, t in padded], rng=rng)
