"""Fully on-device batched shuffle-proof verification.

The shuffle argument is the reference's headline workload
(/root/reference/src/shuffle/shuffle.rs:547-712) and the round-1 profile
showed its *verifier replay* — transcript framing, challenge derivation,
Lagrange/product scalar work — dominates batched verification wall-clock
(GIL-bound Python), not the final MSM. This module is the TPU-native
answer, the shuffle twin of bulletproofs/device_verify.py: for B proofs of
one shape (m x m anonymity matrix, N = m^2 accounts), the ENTIRE verifier
runs inside one jitted program —

  upload:  proof + statement + account bytes (SoA uint8), fresh weights
  device:  batched STROBE transcripts -> challenges (x, Hadamard, y, z,
           MultiHadamard x/y, Zero x, SVP x, DDH, 2x Multiexpo x)
           -> Lagrange evaluations, power vectors, bilinear map scalars
           -> every sub-argument's point-identity checks, weighted into
              ONE MSM; eager Schnorr-style recomputations (DDH first
              messages, c_E recombination) run as batched point ops with
              on-device ristretto re-encoding feeding the transcript
  fetch:   one boolean

Exactly mirrors the host verifier's accept set (ShuffleProof.verify,
tests/test_device_shuffle_verify.py); wire-static structural checks
(lengths, pinned identity commitments, omega uniqueness) run at pack time
on the host, exactly the checks the host verifier performs before any
challenge is derived.
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
from ..primitives.pedersen import default_pedersen_gens, vector_pedersen_gens
from ..bulletproofs.device_verify import (_decompress_u8, _to_nibbles,
                                          _sf_tree_sum, _sf_tree_prod,
                                          _ext_concat, _msm_jit,
                                          _P_DIGITS)

L = ex.L


def _limbs_from_wire32_impl(b: jnp.ndarray):
    """[..., 32] int32 bytes -> (canonical?, field limbs [..., 24]).

    For encode-comparisons: a compressed-point byte string equals a
    canonical device encoding iff the limb views match AND the wire itself
    is canonical (value < p, top bit clear)."""
    raw = sf._limbs_from_bytes(b, fe.NLIMBS)   # shared 11x24 radix
    ge_p = sf._lex_ge(raw, _P_DIGITS)
    top_bit = (b[..., 31] >> 7) & 1
    ok = jnp.logical_and(jnp.logical_not(ge_p), top_bit == 0)
    return ok, raw


_limbs_from_wire32 = jax.jit(_limbs_from_wire32_impl)
_compress_jit = jax.jit(pt.compress_raw)


def _enc_eq_wire(points: pt.ExtPoint, wire: jnp.ndarray) -> jnp.ndarray:
    """compress(points) == wire bytes, elementwise over leading axes."""
    enc = _compress_jit(points)             # canonical limbs [..., 24]
    ok, raw = _limbs_from_wire32(wire)
    return jnp.logical_and(ok, jnp.all(enc == raw, axis=-1))


# nested jits: every call site of a given shape shares one lowered
# computation (the unrolled window table would otherwise inline ~7k ops
# per scalar-mul call site into the outer graph)
_scalar_mul_jit = jax.jit(pt.scalar_mul_raw)
_add_jit = jax.jit(pt.add_raw)
_sum_points_jit = jax.jit(pt.sum_points_raw, static_argnums=1)
_msm_rows_jit = jax.jit(qmsm.msm_rows_raw)


def _mul_pt(s: jnp.ndarray, p: pt.ExtPoint) -> pt.ExtPoint:
    """Per-lane scalar multiplication: s [..., 24] loose limbs, p [...]."""
    return _scalar_mul_jit(_to_nibbles(s), p)


def _msm_lane(s: jnp.ndarray, p: pt.ExtPoint) -> pt.ExtPoint:
    """Per-lane MSM over the second axis: s [B, k, 24], p [B, k] -> [B]."""
    return _sum_points_jit(_mul_pt(s, p), 1)


class _LaneChecks:
    """Device accumulator of per-lane point-identity checks.

    Each check(scalars [B, k, 24] Montgomery, points ExtPoint [B, k])
    asserts sum_j s_j P_j == identity per lane; it is scaled by the lane's
    next random weight and appended to one global MSM (the device twin of
    accounts.deferred.DeferredPointChecks).
    """

    def __init__(self, weights: jnp.ndarray):
        self._w = weights           # [B, NCHECKS, 24]
        self._ctr = 0
        self._scal: List[jnp.ndarray] = []
        self._pts: List[pt.ExtPoint] = []

    def check(self, scalars: jnp.ndarray, points: pt.ExtPoint) -> None:
        w = self._w[:, self._ctr]   # [B, 24]
        self._ctr += 1
        self._scal.append(sf.mul(scalars, w[:, None, :]))
        self._pts.append(points)

    def verify_msm(self, use_pallas: bool = False) -> jnp.ndarray:
        scal = jnp.concatenate([s.reshape(-1, sf.NLIMBS) for s in self._scal])
        pts = _ext_concat([pt.ExtPoint(*(c.reshape((-1, fe.NLIMBS))
                                         for c in p)) for p in self._pts])
        if use_pallas:
            # the three-kernel Pallas MSM pipeline (1.15M pts/s marginal
            # at 2^16 vs ~170k for the XLA Pippenger form); pads itself
            from ..ops import pallas_point as kp

            return pt.is_identity_raw(kp.msm_pallas(_to_nibbles(scal), pts))
        n = scal.shape[0]
        npad = 1 << (n - 1).bit_length()
        if npad != n:
            scal = jnp.concatenate([scal, sf.zeros((npad - n,))])
            idp = pt.identity((npad - n,))
            pts = _ext_concat([pts, idp])
        return pt.is_identity_raw(_msm_jit(_to_nibbles(scal), pts))


def _broadcast_static(points, batch: int) -> pt.ExtPoint:
    """Host points -> device ExtPoint broadcast to [batch, k]."""
    ext = pt.from_exact_batch(points)
    return pt.ExtPoint(*(jnp.broadcast_to(c[None], (batch,) + c.shape)
                         for c in ext))


def _barrier_pt(p: pt.ExtPoint) -> pt.ExtPoint:
    """Fusion fence around a point tensor.

    The one-program verifiers feed a few expensive producers (the batched
    decompress, the consolidated scalar-mul phase) into MANY consumers;
    without a fence XLA's producer fusion can duplicate those producers
    into each consumer, compounding across phases until the executable,
    while finite, effectively never finishes on TPU (observed: a [16]-lane
    m=3 verify whose phases each run in <0.3s standalone did not complete
    in 30 minutes fused). optimization_barrier pins the value to be
    computed once.
    """
    return pt.ExtPoint(*jax.lax.optimization_barrier(tuple(p)))


class DeviceShuffleVerifier:
    """Compiled batched verifier for shuffle proofs of one shape.

    Usage::

        dsv = DeviceShuffleVerifier(m=8, batch=16)   # 64-account shuffles
        dsv.verify(entries)   # entries: (proof, statement, inputs, outputs)

    Transcripts are fresh Verifier(proof_label, Transcript(label)) per
    lane by default; pass `transcripts=` (host Transcript objects with
    shape-identical histories) for shuffles embedded in a larger protocol
    (the transaction flow).
    """

    def __init__(self, m: int, batch: int, proof_label: bytes = b"Shuffle",
                 transcript_label: bytes = b"ShuffleProof"):
        self.m = m
        self.N = m * m
        self.batch = batch
        self.proof_label = bytes(proof_label)
        self.transcript_label = bytes(transcript_label)
        xpc = vector_pedersen_gens(m + 1)
        pc = default_pedersen_gens()
        from ..primitives.keys import RistrettoPublicKey

        base_pk = RistrettoPublicKey.generate_base_pk()
        self._base_g = base_pk.gr_point
        self._base_h = base_pk.grsk_point
        #: static point table (host order):
        #: [H, G_0..G_{m-1}, B, B_blinding, base_g, base_h, c_minus_one,
        #:  sumG (for com of constant vectors)]
        c_minus_one = xpc.commit([(-1) % L] * m, 0)
        sum_g = ex.pt_msm([1] * m, xpc.G_vec[:m])
        self._xpc = xpc
        self._static_pts = ([xpc.H] + xpc.G_vec[:m]
                            + [pc.B, pc.B_blinding, self._base_g,
                               self._base_h, c_minus_one, sum_g])
        self._verify_jit = jax.jit(self._build, static_argnums=4)
        #: final combined MSM backend: the Pallas pipeline on a real TPU,
        #: the XLA form on CPU (Mosaic needs interpret mode there) and
        #: under shard_map (verify_sharded clears the flag around its
        #: trace — per-shard term counts are smaller and Mosaic calls
        #: inside shard_map are kept off the multi-chip path)
        self._use_pallas_msm = jax.default_backend() == "tpu"
        #: per-lane point stages (ladder + rows-MSM) on the Pallas
        #: mega-kernels when a real TPU is the backend — the XLA forms of
        #: these stages are dispatch-bound at production widths (measured
        #: round 4: 80 ms ladder + 284 ms aggregate stages at m=8 B=16)
        self._use_pallas_pt = jax.default_backend() == "tpu"
        #: debug knob: truncate the program after a named phase
        #: ("decompress" | "hadamard" | "scalars" | "mulphase" | "ddh" |
        #:  "multiexpo"); None = full verification. Used to bisect
        #: backend-specific execution pathologies phase by phase.
        self._stop_at = None

    # ---------------------------------------------------------------- layout

    @property
    def _npoints(self) -> int:
        m, N = self.m, self.N
        return 21 * m + 14 + 8 * N

    @property
    def _nscalars(self) -> int:
        return 10 * self.m + 19

    NCHECKS = 19

    def _point_layout(self):
        m, N = self.m, self.N
        idx = {}
        off = 0

        def take(name, k):
            nonlocal off
            idx[name] = (off, off + k)
            off += k

        take("c_A", m)
        take("c_tau", m)
        take("c_B", m)
        take("c_B_dash", m)
        take("had_0", 3)            # c_a_0, c_b_0, c_c_0
        take("had_delta", m + 1)
        take("mh_cB", m)
        take("zero_head", 2)        # c_A_0, c_B_m
        take("zero_cD", 2 * m + 1)
        take("zero_stmt_cA", m - 1)  # last is replaced by c_minus_one
        take("svp", 4)              # d, delta_small, delta_capital, stmt c_a
        take("ddh", 2)              # G_dash, H_dash
        take("mepk_A0", 1)
        take("mepk_cBk", 2 * m)
        take("mepk_Ek0", 2 * m)
        take("mepk_Ek1", 2 * m)
        take("mec_A0", 1)
        take("mec_cBk", 2 * m)
        take("mec_Ek0", 2 * m)
        take("mec_Ek1", 2 * m)
        take("in_g", N)
        take("in_h", N)
        take("in_c", N)
        take("in_d", N)
        take("out_g", N)
        take("out_h", N)
        take("out_c", N)
        take("out_d", N)
        assert off == self._npoints, (off, self._npoints)
        return idx

    def _scalar_layout(self):
        m = self.m
        idx = {}
        off = 0

        def take(name, k):
            nonlocal off
            idx[name] = (off, off + k)
            off += k

        take("omega", m)
        take("had_a_bar", m)
        take("had_b_bar", m)
        take("had_c_bar", m)
        take("had_blind", 4)        # r_bar, s_bar, t_bar, rho_bar
        take("zero_a", m)
        take("zero_b", m)
        take("zero_blind", 3)       # r, s, t
        take("svp_a", m)
        take("svp_b", m)
        take("svp_blind", 3)        # r_tw, s_tw, statement b
        take("mepk", m + 3)         # a_vec, r, b, s
        take("mec", m + 4)          # a_vec, r, b, s, t
        take("ddh", 2)              # challenge, z
        assert off == self._nscalars, (off, self._nscalars)
        return idx

    # ---------------------------------------------------------------- device

    def _mul_pt_dispatch(self, s: jnp.ndarray, p: pt.ExtPoint) -> pt.ExtPoint:
        """Per-lane scalar-muls [B, K]: Pallas mega-kernel on a real TPU
        (one launch per 256-lane tile), XLA windowed ladder elsewhere."""
        if not self._use_pallas_pt:
            return _mul_pt(s, p)
        from ..ops import pallas_point as kp

        B, K = s.shape[0], s.shape[1]
        n = B * K
        tile = 256
        nib = _to_nibbles(s).reshape(n, 64)
        flat = pt.ExtPoint(*(c.reshape((n,) + c.shape[2:]) for c in p))
        padn = (-n) % tile
        if padn:
            nib = jnp.concatenate(
                [nib, jnp.zeros((padn, 64), nib.dtype)], axis=0)
            idp = pt.identity((padn,))
            flat = pt.ExtPoint(*(jnp.concatenate([a, b], axis=0)
                                 for a, b in zip(flat, idp)))
        out = kp.scalar_mul_pallas(nib, flat, tile=tile)
        return pt.ExtPoint(*(c[:n].reshape((B, K) + c.shape[1:])
                             for c in out))

    def _build(self, comp, scal, weights, states, frame):
        # B from the input shape: under shard_map this runs per-shard
        m, N = self.m, self.N
        B = comp.shape[0]
        P = self._point_layout()
        S = self._scalar_layout()

        ok_pts, pts_all = _decompress_u8(comp)
        pts_all = _barrier_pt(pts_all)              # computed once, many uses
        lane_ok = jnp.all(ok_pts, axis=-1)          # [B]
        if self._stop_at == "decompress":
            return jnp.all(lane_ok)

        def pts(name) -> pt.ExtPoint:
            a, b_ = P[name]
            return pt.ExtPoint(*(c[:, a:b_] for c in pts_all))

        def wire(name) -> jnp.ndarray:
            a, b_ = P[name]
            return comp[:, a:b_]

        def sc(name) -> jnp.ndarray:
            a, b_ = S[name]
            return sf.from_bytes(scal[:, a:b_])     # loose limbs [B, k, 24]

        w_limbs = sf.from_bytes_wide(weights)       # [B, NCHECKS, 24]
        checks = _LaneChecks(w_limbs)

        statics = _broadcast_static(self._static_pts, B)

        def static_slice(a, b_) -> pt.ExtPoint:
            return pt.ExtPoint(*(c[:, a:b_] for c in statics))

        H_pt = static_slice(0, 1)                   # xpc H
        G_pts = static_slice(1, 1 + m)              # G_0..G_{m-1}
        pc_B = static_slice(m + 1, m + 2)
        pc_Bb = static_slice(m + 2, m + 3)
        base_g = static_slice(m + 3, m + 4)
        base_h = static_slice(m + 4, m + 5)
        c_minus_one = static_slice(m + 5, m + 6)
        sum_G = static_slice(m + 6, m + 7)

        def _lane_cat(plist: List[pt.ExtPoint]) -> pt.ExtPoint:
            return pt.ExtPoint(*(jnp.concatenate(cs, axis=1)
                                 for cs in zip(*plist)))

        one = sf.one((B,))
        neg1 = sf.neg(one)

        # ---------------- transcript ----------------
        dt = object.__new__(DeviceTranscript)
        dt.strobe = DeviceStrobe.from_host_states(states, *frame)

        for i in range(m):
            dt.append_point_var(b"ACommitment", wire("c_A")[:, i])
            dt.append_point_var(b"tauCommitment", wire("c_tau")[:, i])
        x = sf.from_bytes_wide(dt.get_challenge_bytes(b"xChallenge"))
        exp_x = sf.powers(x, N + 1)[:, 1:]          # x^1..x^N  [B, N, 24]
        for i in range(m):
            dt.append_point_var(b"BCommitment", wire("c_B")[:, i])
            dt.append_point_var(b"BDashCommitment", wire("c_B_dash")[:, i])

        # ---------------- Hadamard ----------------
        dt.domain_sep(b"HadamardProductProof")
        for i in range(m):
            dt.append_point_var(b"c_a", wire("c_B_dash")[:, i])
            dt.append_point_var(b"c_b", wire("c_tau")[:, i])
            dt.append_point_var(b"c_c", wire("c_B")[:, i])
        dt.append_point_var(b"c_a_0", wire("had_0")[:, 0])
        dt.append_point_var(b"c_b_0", wire("had_0")[:, 1])
        dt.append_point_var(b"c_c_0", wire("had_0")[:, 2])
        for i in range(m + 1):
            dt.append_point_var(b"c_delta", wire("had_delta")[:, i])
        hx = sf.from_bytes_wide(dt.get_challenge_bytes(b"challenge"))

        # Lagrange evaluations at hx over nodes omega (pack() verified
        # uniqueness): l_0(hx) = prod(hx - w_j); l_i(hx) = l_0(hx) /
        # ((hx - w_i) * prod_{j != i}(w_i - w_j)). Reject hx == w_i.
        omega = sc("omega")                         # [B, m, 24]
        diffs = sf.sub(jnp.broadcast_to(hx[:, None, :], omega.shape), omega)
        lane_ok = jnp.logical_and(lane_ok,
                                  jnp.all(~sf.is_zero(diffs), axis=-1))
        ev0 = _sf_tree_prod(diffs)                  # [B, 24]
        # denom_i = prod_{j != i} (w_i - w_j)
        wi = omega[:, :, None, :]
        wj = omega[:, None, :, :]
        pair = sf.sub(jnp.broadcast_to(wi, (B, m, m, sf.NLIMBS)),
                      jnp.broadcast_to(wj, (B, m, m, sf.NLIMBS)))
        eye = np.eye(m, dtype=bool)
        pair = jnp.where(jnp.asarray(eye)[None, :, :, None],
                         sf.one((B, m, m)), pair)
        # product over j for each i: reduce pair [B, m(i), m(j), 24] on axis 2
        denom = pair
        nred = m
        while nred > 1:
            if nred % 2:
                padv = sf.one((B, m, 1))
                denom = jnp.concatenate([denom, padv], axis=2)
                nred += 1
            h = nred // 2
            denom = sf.mul(denom[:, :, :h], denom[:, :, h:nred])
            nred = h
        denom = denom[:, :, 0]                      # [B, m, 24]
        inv_in = jnp.concatenate([diffs, denom], axis=1)   # [B, 2m, 24]
        inv_out = sf.batch_invert_rows(inv_in)
        l_ev = sf.mul(sf.mul(inv_out[:, :m], inv_out[:, m:]),
                      ev0[:, None, :])              # l_1..l_m at hx [B, m]
        l0 = ev0                                    # l_0(hx) = l(hx)

        a_bar, b_bar, c_bar = sc("had_a_bar"), sc("had_b_bar"), sc("had_c_bar")
        had_blind = sc("had_blind")
        r_bar = had_blind[:, 0]
        s_bar = had_blind[:, 1]
        t_bar = had_blind[:, 2]
        rho_bar = had_blind[:, 3]

        def recombine(c0: pt.ExtPoint, commits: pt.ExtPoint,
                      blind: jnp.ndarray, vals: jnp.ndarray) -> None:
            # l_0(hx) c_0 + sum l_i(hx) C_i - blind*H - sum v_j G_j == 0
            s_comb = jnp.concatenate(
                [l0[:, None, :], l_ev,
                 sf.neg(blind)[:, None, :], sf.neg(vals)], axis=1)
            p_comb = _lane_cat([c0, commits, H_pt, G_pts])
            checks.check(s_comb, p_comb)

        had0 = pts("had_0")
        recombine(pt.ExtPoint(*(c[:, 0:1] for c in had0)), pts("c_B_dash"),
                  r_bar, a_bar)
        recombine(pt.ExtPoint(*(c[:, 1:2] for c in had0)), pts("c_tau"),
                  s_bar, b_bar)
        recombine(pt.ExtPoint(*(c[:, 2:3] for c in had0)), pts("c_B"),
                  t_bar, c_bar)

        exp_hx = sf.powers(hx, m + 1)               # [B, m+1, 24]
        abc = sf.sub(sf.mul(a_bar, b_bar), c_bar)
        s_delta = jnp.concatenate(
            [sf.mul(l0[:, None, :], exp_hx),
             sf.neg(rho_bar)[:, None, :], sf.neg(abc)], axis=1)
        checks.check(s_delta, _lane_cat([pts("had_delta"), H_pt, G_pts]))
        if self._stop_at == "hadamard":
            return jnp.logical_and(jnp.all(lane_ok), jnp.all(hx >= 0))

        # ---------------- y, z + product statement ----------------
        y = sf.from_bytes_wide(dt.get_challenge_bytes(b"yChallenge"))
        z = sf.from_bytes_wide(dt.get_challenge_bytes(b"zChallenge"))
        idx_sc = jnp.asarray(sf.from_int_batch(
            [i + 1 for i in range(N)]))                # i+1 as limbs
        terms = sf.sub(sf.add(sf.mul(y[:, None, :], idx_sc[None]), exp_x),
                       jnp.broadcast_to(z[:, None, :], exp_x.shape))
        product = _sf_tree_prod(terms)              # [B, 24]
        svp_blind = sc("svp_blind")
        svp_stmt_b = svp_blind[:, 2]
        lane_ok = jnp.logical_and(lane_ok, sf.eq(product, svp_stmt_b))

        # ---------------- MultiHadamard ----------------
        # (the c_E recombination and its encode-comparisons run in the
        # consolidated point phase below — transcript framing is
        # independent of them)
        mh_wire = wire("mh_cB")
        dt.domain_sep(b"MultiHadamardProductProof")
        for i in range(m):
            dt.append_point_var(b"BVectorCommitment", mh_wire[:, i])
        mhx = sf.from_bytes_wide(dt.get_challenge_bytes(b"XChallenge"))
        mhy = sf.from_bytes_wide(dt.get_challenge_bytes(b"YChallenge"))
        mh_x_exp = sf.powers(mhx, m + 1)[:, 1:]     # x^1..x^m [B, m]
        mh_pts = pts("mh_cB")

        # ---------------- Zero argument ----------------
        dt.domain_sep(b"ZeroArgumentProof")
        dt.append_point_var(b"A0Commitment", wire("zero_head")[:, 0])
        dt.append_point_var(b"BmCommitment", wire("zero_head")[:, 1])
        for i in range(2 * m + 1):
            dt.append_point_var(b"DCommitment", wire("zero_cD")[:, i])
        zx = sf.from_bytes_wide(dt.get_challenge_bytes(b"challenge"))
        zx_exp = sf.powers(zx, 2 * m + 1)           # x^0..x^2m
        zx_m1 = zx_exp[:, 1:m + 1]                  # x^1..x^m
        zero_a, zero_b = sc("zero_a"), sc("zero_b")
        zero_blind = sc("zero_blind")
        z_r, z_s, z_t = (zero_blind[:, 0], zero_blind[:, 1], zero_blind[:, 2])

        zero_head = pts("zero_head")
        c_A0_pt = pt.ExtPoint(*(c[:, 0:1] for c in zero_head))
        c_Bm_pt = pt.ExtPoint(*(c[:, 1:2] for c in zero_head))
        # c_zero_A points: statement wires 0..m-2 then c_minus_one
        c_zero_A = _lane_cat([pts("zero_stmt_cA"), c_minus_one]) \
            if m > 1 else c_minus_one

        # com(a_bar, r) - C_A_0 - sum x^i C_A_i == 0
        s1 = jnp.concatenate([z_r[:, None, :], zero_a,
                              neg1[:, None, :], sf.neg(zx_m1)], axis=1)
        checks.check(s1, _lane_cat([H_pt, G_pts, c_A0_pt, c_zero_A]))
        # (the com(b_bar, s) check needs the commit_D points: deferred to
        # the consolidated point phase)
        # com(a_bar . b_bar, t) - sum x^k C_D_k == 0 (plain Pedersen)
        y_i = sf.powers(mhy, m + 1)[:, 1:]          # y^1..y^m
        abb = _sf_tree_sum(sf.mul(sf.mul(zero_a, zero_b), y_i))
        s3 = jnp.concatenate([abb[:, None, :], z_t[:, None, :],
                              sf.neg(zx_exp)], axis=1)
        checks.check(s3, _lane_cat([pc_B, pc_Bb, pts("zero_cD")]))

        # ---------------- SVP ----------------
        dt.domain_sep(b"SingleValueProductProof")
        dt.append_point_var(b"DeltaSmall", wire("svp")[:, 1])
        dt.append_point_var(b"DeltaCapital", wire("svp")[:, 2])
        dt.append_point_var(b"d", wire("svp")[:, 0])
        sx = sf.from_bytes_wide(dt.get_challenge_bytes(b"challenge"))
        svp_a, svp_b = sc("svp_a"), sc("svp_b")
        r_tw, s_tw = svp_blind[:, 0], svp_blind[:, 1]
        lane_ok = jnp.logical_and(
            lane_ok, sf.eq(sf.mul(svp_stmt_b, sx), svp_b[:, -1]))
        svp_pts = pts("svp")
        # x C_a + C_d - com(a_bar, r_bar) == 0
        s4 = jnp.concatenate([sx[:, None, :], one[:, None, :],
                              sf.neg(r_tw)[:, None, :], sf.neg(svp_a)],
                             axis=1)
        p4 = _lane_cat([pt.ExtPoint(*(c[:, 3:4] for c in svp_pts)),
                        pt.ExtPoint(*(c[:, 0:1] for c in svp_pts)),
                        H_pt, G_pts])
        checks.check(s4, p4)
        # comvec_i = b[i+1] x - b[i] a[i+1]
        comvec = sf.sub(sf.mul(svp_b[:, 1:], sx[:, None, :]),
                        sf.mul(svp_b[:, :-1], svp_a[:, 1:]))   # [B, m-1]
        s5 = jnp.concatenate([sx[:, None, :], one[:, None, :],
                              sf.neg(s_tw)[:, None, :], sf.neg(comvec)],
                             axis=1)
        p5 = _lane_cat([pt.ExtPoint(*(c[:, 2:3] for c in svp_pts)),
                        pt.ExtPoint(*(c[:, 1:2] for c in svp_pts)),
                        H_pt,
                        pt.ExtPoint(*(c[:, :m - 1] for c in G_pts))])
        checks.check(s5, p5)
        if self._stop_at == "scalars":
            return jnp.logical_and(jnp.all(lane_ok), jnp.all(sx >= 0))

        # ---------------- consolidated point phase ----------------
        # EVERY per-lane scalar multiplication in one batched call: the
        # unrolled window-table kernel inlines ~8k HLO ops per call site,
        # so one [B, K] call instead of a dozen keeps compilation sane.
        ddh_sc = sc("ddh")
        ddh_chal, ddh_z = ddh_sc[:, 0], ddh_sc[:, 1]
        ddh_pts = pts("ddh")
        mepk = sc("mepk")
        mec = sc("mec")
        cA_pts, cB_pts = pts("c_A"), pts("c_B")
        in_g, in_h = pts("in_g"), pts("in_h")
        bcast = lambda s, k: jnp.broadcast_to(  # noqa: E731
            s[:, None, :], (B, k, sf.NLIMBS))
        mul_scal = jnp.concatenate([
            bcast(y, m),                        # yA: y * c_A_i           [m]
            sf.neg(z)[:, None, :],              # zG: -z * sum_G          [1]
            mh_x_exp,                           # c_D_mh: x^i * mh_cB     [m]
            mh_x_exp[:, :m - 1],                # c_D tail terms        [m-1]
            bcast(mepk[:, m + 1], 2),           # pk reenc: b*base_{g,h}  [2]
            mec[:, m + 1][:, None, :],          # mec reenc: b*BASE       [1]
        ], axis=1)
        mul_pts = _lane_cat([
            cA_pts, sum_G, mh_pts,
            pt.ExtPoint(*(c[:, 1:m] for c in mh_pts)),
            base_g, base_h,
            pt.ExtPoint(*(jnp.broadcast_to(c[None, None],
                                           (B, 1) + c.shape)
                          for c in pt.basepoint(()))),
        ])
        prods = _barrier_pt(self._mul_pt_dispatch(mul_scal, mul_pts))
        # Every per-lane statement aggregation as SIX rows of one
        # per-row MSM over [in_pks | DDH point] (N+1 points each):
        #   r0: G = sum x^i g_i              r1: H = sum x^i h_i
        #   r2: g_r = z_ddh*G + c*G_dash = sum (z_ddh x^i) g_i + c*G_dash
        #   r3: h_r = z_ddh*H + c*H_dash
        #   r4: t*G (commitment-multiexpo reencryption, key pk_GH)
        #   r5: t*H
        # This removes the old two-stage dependency (aggregate THEN
        # multiply the aggregate): all six come out of one shared-doubling
        # pass (Pallas pipeline on TPU, XLA rows form elsewhere).
        mec_t = mec[:, m + 3]
        zx = sf.mul(exp_x, ddh_z[:, None, :])             # z_ddh * x^i
        tx_ = sf.mul(exp_x, mec_t[:, None, :])            # t * x^i
        zero1 = sf.zeros((B, 1))
        chal1 = ddh_chal[:, None, :]
        row_scal = jnp.stack([
            jnp.concatenate([exp_x, zero1], axis=1),
            jnp.concatenate([exp_x, zero1], axis=1),
            jnp.concatenate([zx, chal1], axis=1),
            jnp.concatenate([zx, chal1], axis=1),
            jnp.concatenate([tx_, zero1], axis=1),
            jnp.concatenate([tx_, zero1], axis=1),
        ], axis=1)                                        # [B, 6, N+1]
        g_dash = pt.ExtPoint(*(c[:, 0:1] for c in ddh_pts))
        h_dash = pt.ExtPoint(*(c[:, 1:2] for c in ddh_pts))
        g_row = _lane_cat([in_g, g_dash])                 # [B, N+1]
        h_row = _lane_cat([in_h, h_dash])
        row_pts = pt.ExtPoint(*(jnp.stack([g, h, g, h, g, h], axis=1)
                                for g, h in zip(g_row, h_row)))
        rows_nib = _to_nibbles(row_scal).reshape(B * 6, N + 1, 64)
        rows_flat = pt.ExtPoint(*(c.reshape((B * 6, N + 1) + c.shape[3:])
                                  for c in row_pts))
        if self._use_pallas_pt:
            from ..ops import pallas_point as kp

            rows_out = kp.msm_rows_pallas(rows_nib, rows_flat)
        else:
            rows_out = _msm_rows_jit(rows_nib, rows_flat)
        rows_out = _barrier_pt(pt.ExtPoint(
            *(c.reshape((B, 6) + c.shape[1:]) for c in rows_out)))

        def row(i):
            return pt.ExtPoint(*(c[:, i] for c in rows_out))
        if self._stop_at == "mulphase":
            return jnp.logical_and(jnp.all(lane_ok),
                                   jnp.all(~pt.is_identity_raw(prods)))
        off = 0

        def nxt(k):
            nonlocal off
            sl = pt.ExtPoint(*(c[:, off:off + k] for c in prods))
            off += k
            return sl

        yA = nxt(m)
        zG = nxt(1)
        c_D_mh = nxt(m)
        c_D_tail = nxt(m - 1)
        re_pk = nxt(2)
        re_bB = nxt(1)
        assert off == mul_scal.shape[1]

        # c_E_i = y*c_A_i + c_B_i + (-z)*sum_G
        zG_b = pt.ExtPoint(*(jnp.broadcast_to(c, (B, m) + c.shape[2:])
                             for c in zG))
        c_E = _add_jit(_add_jit(yA, cB_pts), zG_b)   # [B, m]

        c_D_last = _sum_points_jit(c_D_tail, 1)
        commit_D = pt.ExtPoint(*(
            jnp.concatenate([c[:, :m - 1], cl[:, None]], axis=1)
            for c, cl in zip(c_D_mh, c_D_last)))
        # zero argument: com(b_bar, s) - sum x^{m-i} C_B_i - C_B_m == 0
        s2 = jnp.concatenate([z_s[:, None, :], zero_b,
                              sf.neg(zx_m1[:, ::-1]), neg1[:, None, :]],
                             axis=1)
        checks.check(s2, _lane_cat([H_pt, G_pts, commit_D, c_Bm_pt]))

        # all six statement aggregates come out of the one rows-MSM above.
        # DDH responses use pk_GH = (G_agg, H_agg) — NOT the base pk
        # (shuffle.rs:502-513 passes pk_GH into the commitment variant).
        # They are transcript-independent, so every point that needs a
        # ristretto encoding is ready BEFORE the DDH appends and ONE
        # batched compress serves the eq-checks and the transcript.
        G_agg = row(0)                                   # [B]
        H_agg = row(1)
        g_r = row(2)                                     # z*G + c*G_dash
        h_r = row(3)
        re_c0 = pt.ExtPoint(*(c[:, None] for c in row(4)))   # t * G_agg
        re_c1 = pt.ExtPoint(*(c[:, None] for c in row(5)))   # t * H_agg

        # consolidated encode: [c_E(m) | G_agg | H_agg | g_r | h_r]
        enc_in = pt.ExtPoint(*(
            jnp.concatenate([ce, ga[:, None], ha[:, None],
                             gr_[:, None], hr_[:, None]], axis=1)
            for ce, ga, ha, gr_, hr_ in zip(c_E, G_agg, H_agg, g_r, h_r)))
        enc = _compress_jit(enc_in)                     # [B, m+4, 24] limbs
        enc_bytes = _limbs_to_bytes_dev(enc)            # [B, m+4, 32]

        def _enc_slice_eq(idx, wire_bytes):
            ok_w, raw = _limbs_from_wire32(wire_bytes)
            return jnp.logical_and(ok_w,
                                   jnp.all(enc[:, idx] == raw, axis=-1))

        lane_ok = jnp.logical_and(lane_ok, _enc_slice_eq(0, mh_wire[:, 0]))
        if m > 1:
            eqs = jnp.stack(
                [_enc_slice_eq(i, wire("zero_stmt_cA")[:, i - 1])
                 for i in range(1, m)], axis=-1)
            lane_ok = jnp.logical_and(lane_ok, jnp.all(eqs, axis=-1))

        # ---------------- DDH ----------------
        dt.domain_sep(b"DDHTupleProof")
        dt.append_point_var(b"g", enc_bytes[:, m])
        dt.append_point_var(b"g_dash", wire("ddh")[:, 0])
        dt.append_point_var(b"h", enc_bytes[:, m + 1])
        dt.append_point_var(b"h_dash", wire("ddh")[:, 1])
        dt.append_point_var(b"gr", enc_bytes[:, m + 2])
        dt.append_point_var(b"hr", enc_bytes[:, m + 3])
        ddh_rechal = sf.from_bytes_wide(dt.get_challenge_bytes(b"Challenge"))
        lane_ok = jnp.logical_and(lane_ok, sf.eq(ddh_rechal, ddh_chal))
        if self._stop_at == "ddh":
            return jnp.all(lane_ok)

        # ---------------- Multiexpo (pubkey) ----------------
        # pk_GH.gr == E_k_0[m] bytes
        lane_ok = jnp.logical_and(lane_ok, _enc_slice_eq(
            m, wire("mepk_Ek0")[:, m]))
        lane_ok = jnp.logical_and(lane_ok, _enc_slice_eq(
            m + 1, wire("mepk_Ek1")[:, m]))
        self._multiexpo(
            dt, checks, b"MultiExponentialPubKeyProof",
            wire("mepk_A0"), wire("mepk_cBk"),
            wire("mepk_Ek0"), wire("mepk_Ek1"),
            pts("mepk_A0"), pts("mepk_cBk"), pts("mepk_Ek0"), pts("mepk_Ek1"),
            pts("c_B_dash"),
            a_vec=mepk[:, :m], r_s=mepk[:, m], b_s=mepk[:, m + 1],
            s_s=mepk[:, m + 2],
            re0=pt.ExtPoint(*(c[:, 0] for c in re_pk)),
            re1=pt.ExtPoint(*(c[:, 1] for c in re_pk)),
            rows0=pts("out_g"), rows1=pts("out_h"),
            H_pt=H_pt, G_pts=G_pts, pc_B=pc_B, pc_Bb=pc_Bb, one=one)

        # ---------------- Multiexpo (commitment) ----------------
        # sum exp_x * C_in_i - E_m == 0 (both components)
        Em0 = pt.ExtPoint(*(c[:, m:m + 1] for c in pts("mec_Ek0")))
        Em1 = pt.ExtPoint(*(c[:, m:m + 1] for c in pts("mec_Ek1")))
        checks.check(jnp.concatenate([exp_x, neg1[:, None, :]], axis=1),
                     _lane_cat([pts("in_c"), Em0]))
        checks.check(jnp.concatenate([exp_x, neg1[:, None, :]], axis=1),
                     _lane_cat([pts("in_d"), Em1]))
        self._multiexpo(
            dt, checks, b"MultiExponentialElgamalCommmitmentProof",
            wire("mec_A0"), wire("mec_cBk"),
            wire("mec_Ek0"), wire("mec_Ek1"),
            pts("mec_A0"), pts("mec_cBk"), pts("mec_Ek0"), pts("mec_Ek1"),
            pts("c_B"),
            a_vec=mec[:, :m], r_s=mec[:, m], b_s=mec[:, m + 1],
            s_s=mec[:, m + 2],
            re0=pt.ExtPoint(*(c[:, 0] for c in re_c0)),
            re1=_add_jit(pt.ExtPoint(*(c[:, 0] for c in re_bB)),
                         pt.ExtPoint(*(c[:, 0] for c in re_c1))),
            rows0=pts("out_c"), rows1=pts("out_d"),
            H_pt=H_pt, G_pts=G_pts, pc_B=pc_B, pc_Bb=pc_Bb, one=one)

        if self._stop_at == "multiexpo":
            return jnp.all(lane_ok)
        assert checks._ctr == self.NCHECKS, checks._ctr
        msm_ok = checks.verify_msm(use_pallas=self._use_pallas_msm)
        return jnp.logical_and(jnp.all(lane_ok), msm_ok)

    def _multiexpo(self, dt, checks, label, w_A0, w_cBk, w_Ek0, w_Ek1,
                   p_A0, p_cBk, p_Ek0, p_Ek1, p_cA, a_vec, r_s, b_s, s_s,
                   re0, re1, rows0, rows1, H_pt, G_pts, pc_B,
                   pc_Bb, one):
        """Shared multiexpo verification: transcript + 4 checks.

        `re0`/`re1` are the precomputed reencryption points: b*base for
        the pubkey variant, ElGamal Enc_base(b; t) = (t*base_g,
        b*BASE + t*base_h) for the commitment variant (computed in the
        caller's consolidated scalar-mul phase)."""
        m, B = self.m, self.batch
        dt.domain_sep(label)
        dt.append_point_var(b"A0Commitment", w_A0[:, 0])
        for k in range(2 * m):
            dt.append_point_var(b"BKCommitment", w_cBk[:, k])
            dt.append_point_var(b"EK0Commitment", w_Ek0[:, k])
            dt.append_point_var(b"EK1Commitment", w_Ek1[:, k])
        mx = sf.from_bytes_wide(dt.get_challenge_bytes(b"xchallenege"))
        x_exp = sf.powers(mx, 2 * m)                # x^0..x^{2m-1} [B, 2m]

        def _cat(plist):
            return pt.ExtPoint(*(jnp.concatenate(cs, axis=1)
                                 for cs in zip(*plist)))

        neg1 = sf.neg(one)
        # C_A_0 + sum x^i C_A_i - com(a_vec, r) == 0
        s1 = jnp.concatenate([one[:, None, :], x_exp[:, 1:m + 1],
                              sf.neg(r_s)[:, None, :], sf.neg(a_vec)], axis=1)
        checks.check(s1, _cat([p_A0, p_cA, H_pt, G_pts]))
        # com(b, s) - sum x^k C_B_k == 0
        s2 = jnp.concatenate([b_s[:, None, :], s_s[:, None, :],
                              sf.neg(x_exp)], axis=1)
        checks.check(s2, _cat([pc_B, pc_Bb, p_cBk]))

        # sum x^k E_k - sum_i x^{m-1-i} <a_vec, row_i> - reenc == 0
        def ek_check(e_pts, rows, reenc):
            # rows: [B, N] points as m rows of m
            row_scal = []
            for i in range(m):
                coef = x_exp[:, m - 1 - i]          # [B, 24]
                row_scal.append(sf.neg(sf.mul(a_vec, coef[:, None, :])))
            s_ = jnp.concatenate(
                [x_exp] + row_scal + [neg1[:, None, :]], axis=1)
            p_ = _cat([e_pts, rows,
                       pt.ExtPoint(*(c[:, None] for c in reenc))])
            checks.check(s_, p_)

        ek_check(p_Ek0, rows0, re0)
        ek_check(p_Ek1, rows1, re1)

    # ---------------------------------------------------------------- host

    def _pack(self, entries, transcripts):
        from ..accounts.transcript import Transcript
        from ..accounts.verifier import Verifier

        m, N, B = self.m, self.N, self.batch
        if len(entries) != B:
            raise ValueError(f"batch size mismatch: {len(entries)} != {B}")
        P = self._point_layout()
        S = self._scalar_layout()
        comp = np.zeros((B, self._npoints, 32), dtype=np.uint8)
        scal = np.zeros((B, self._nscalars, 32), dtype=np.uint8)
        enc_identity = ex.ristretto_encode(ex.IDENTITY)
        c_minus_one_b = ex.ristretto_encode(self._static_pts[m + 5])

        def put_pts(lane, name, blobs):
            a, b_ = P[name]
            if len(blobs) != b_ - a:
                raise ValueError(f"{name}: wrong length {len(blobs)}")
            for j, blob in enumerate(blobs):
                if len(blob) != 32:
                    raise ValueError(f"{name}: bad point size")
                comp[lane, a + j] = np.frombuffer(blob, np.uint8)

        def put_sc(lane, name, vals):
            a, b_ = S[name]
            if len(vals) != b_ - a:
                raise ValueError(f"{name}: wrong length")
            for j, v in enumerate(vals):
                scal[lane, a + j] = np.frombuffer(ex.sc_to_bytes(v % L),
                                                  np.uint8)

        for lane, (proof, statement, inputs, outputs) in enumerate(entries):
            if not (len(proof.c_A) == m and len(proof.c_tau) == m
                    and len(proof.c_B) == m and len(proof.c_B_dash) == m):
                raise ValueError(
                    "Shuffle Proof Verify: Invalid length of commitment vectors")
            if len(inputs) != N or len(outputs) != N:
                raise ValueError("account vector length mismatch")
            had = proof.hadamard_proof
            hs = statement.hadamard_statement
            if len(set(hs.omega)) != m:
                raise ValueError(
                    "Hadamard Proof Verify: Omega values are not unique")
            mh = proof.product_proof.multi_hadamard_proof
            mhs = statement.product_statement.multi_hadamard_statement
            zp = mh.zero_proof
            zs = mhs.zero_statement
            svp = proof.product_proof.svp_proof
            svps = statement.product_statement.svp_statement
            mepk = proof.multi_exponen_pk
            mec = proof.multi_exponen_commit
            ddh = proof.ddh_proof
            dds = statement.ddh_statement
            # wire-static structural checks (host verifier raises the same)
            if len(zp.c_D) != 2 * m + 1 or len(zp.b_vec) != m:
                raise ValueError("Zero Argument Proof Verify: Size check failed")
            if zp.c_D[m + 1] != enc_identity:
                raise ValueError(
                    "Zero Argument Proof Verify: c_d_(m+1) == com(0,0) Failed")
            if mhs.c_b != mh.c_B[m - 1]:
                raise ValueError(
                    "Multihadamard Product Proof Verify: c_B_m == c_b Failed")
            if len(svp.b_twildle) != m or len(svp.a_twildle) != m:
                raise ValueError(
                    "SingleValue Product Proof Verify: Size check failed")
            if svp.a_twildle[0] != svp.b_twildle[0]:
                raise ValueError("SingleValue Product Proof Verify: Failed")
            for me, kind in ((mepk, "Pubkey"), (mec, "Commitment")):
                if not (len(me.a_vec) == m
                        and me.c_B_k[m] == enc_identity):
                    raise ValueError(
                        f"Multi-exponentiation {kind} Argument: "
                        "Verify com(0,0) == c_B_m Failed")
            zero_stmt_cA = list(zs.c_A[:m - 1])
            # the m-th statement commitment is pinned to com(-1vec, 0) by
            # the verifier (host replaces it silently; reject is wrong)

            put_pts(lane, "c_A", proof.c_A)
            put_pts(lane, "c_tau", proof.c_tau)
            put_pts(lane, "c_B", proof.c_B)
            put_pts(lane, "c_B_dash", proof.c_B_dash)
            put_pts(lane, "had_0", [had.commitment_a_0, had.commitment_b_0,
                                    had.commitment_c_0])
            put_pts(lane, "had_delta", had.commitment_delta)
            put_pts(lane, "mh_cB", mh.c_B)
            put_pts(lane, "zero_head", [zp.c_A_0, zp.c_B_m])
            put_pts(lane, "zero_cD", zp.c_D)
            put_pts(lane, "zero_stmt_cA", zero_stmt_cA)
            put_pts(lane, "svp", [svp.commitment_d,
                                  svp.commitment_delta_small,
                                  svp.commitment_delta_capital,
                                  svps.commitment_a])
            put_pts(lane, "ddh", [dds.G_dash, dds.H_dash])
            put_pts(lane, "mepk_A0", [mepk.c_A_0])
            put_pts(lane, "mepk_cBk", mepk.c_B_k)
            put_pts(lane, "mepk_Ek0", mepk.E_k_0)
            put_pts(lane, "mepk_Ek1", mepk.E_k_1)
            put_pts(lane, "mec_A0", [mec.c_A_0])
            put_pts(lane, "mec_cBk", mec.c_B_k)
            put_pts(lane, "mec_Ek0", mec.E_k_0)
            put_pts(lane, "mec_Ek1", mec.E_k_1)
            put_pts(lane, "in_g", [a.pk.gr for a in inputs])
            put_pts(lane, "in_h", [a.pk.grsk for a in inputs])
            put_pts(lane, "in_c", [a.comm.c for a in inputs])
            put_pts(lane, "in_d", [a.comm.d for a in inputs])
            put_pts(lane, "out_g", [a.pk.gr for a in outputs])
            put_pts(lane, "out_h", [a.pk.grsk for a in outputs])
            put_pts(lane, "out_c", [a.comm.c for a in outputs])
            put_pts(lane, "out_d", [a.comm.d for a in outputs])

            put_sc(lane, "omega", hs.omega)
            put_sc(lane, "had_a_bar", had.a_bar)
            put_sc(lane, "had_b_bar", had.b_bar)
            put_sc(lane, "had_c_bar", had.c_bar)
            put_sc(lane, "had_blind", [had.r_bar, had.s_bar, had.t_bar,
                                       had.rho_bar])
            put_sc(lane, "zero_a", zp.a_vec)
            put_sc(lane, "zero_b", zp.b_vec)
            put_sc(lane, "zero_blind", [zp.r, zp.s, zp.t])
            put_sc(lane, "svp_a", svp.a_twildle)
            put_sc(lane, "svp_b", svp.b_twildle)
            put_sc(lane, "svp_blind", [svp.r_twildle, svp.s_twildle, svps.b])
            put_sc(lane, "mepk", list(mepk.a_vec) + [mepk.r, mepk.b, mepk.s])
            put_sc(lane, "mec", list(mec.a_vec) + [mec.r, mec.b, mec.s,
                                                   mec.t])
            put_sc(lane, "ddh", [ddh.challenge, ddh.z])

        if transcripts is None:
            transcripts = []
            for _ in range(B):
                t = Transcript(self.transcript_label)
                Verifier(self.proof_label, t)  # appends the proof dom-sep
                transcripts.append(t)
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        if any(s[1:] != frame for s in snaps):
            raise ValueError("lane transcripts diverged in framing")
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        return comp.astype(np.int32), scal.astype(np.int32), states, frame

    def warmup(self, transcripts=None) -> None:
        """Compile (or load from the persistent cache) this shape bucket's
        program without a real batch, so the first request runs at
        steady-state latency. Zero bytes decode as the identity point and
        the zero scalar, which exercise the identical program; the (False)
        verdict is discarded. Pass `transcripts` with the embedded-protocol
        prefix to warm that jit specialization instead of the standalone
        one (the static frame selects the specialization)."""
        from ..accounts.transcript import Transcript
        from ..accounts.verifier import Verifier

        B = self.batch
        if transcripts is None:
            transcripts = []
            for _ in range(B):
                t = Transcript(self.transcript_label)
                Verifier(self.proof_label, t)
                transcripts.append(t)
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        comp = np.zeros((B, self._npoints, 32), np.int32)
        scal = np.zeros((B, self._nscalars, 32), np.int32)
        weights = np.zeros((B, self.NCHECKS, 64), np.int32)
        bool(self._verify_jit(jnp.asarray(comp), jnp.asarray(scal),
                              jnp.asarray(weights), jnp.asarray(states),
                              frame))

    def verify(self, entries, transcripts=None, rng=None) -> None:
        """entries: (proof, statement, input accounts, output accounts) x B.
        Raises ValueError unless every lane verifies."""
        comp, scal, states, frame = self._pack(entries, transcripts)
        nbytes = self.batch * self.NCHECKS * 64
        wbytes = os.urandom(nbytes) if rng is None else rng.fill_bytes(nbytes)
        weights = np.frombuffer(wbytes, np.uint8).reshape(
            self.batch, self.NCHECKS, 64).astype(np.int32)
        ok = self._verify_jit(jnp.asarray(comp), jnp.asarray(scal),
                              jnp.asarray(weights), jnp.asarray(states),
                              frame)
        if not bool(ok):
            raise ValueError("Device batched shuffle verification failed")

    def verify_sharded(self, entries, mesh, transcripts=None,
                       rng=None) -> None:
        """Verify the batch with the lane axis sharded over `mesh`
        (BASELINE config 5 at multi-chip scale): each device runs the full
        one-program shuffle verifier on its lane slice; the only
        collective is a one-integer psum of failure counts over ICI."""
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ndev = mesh.devices.size
        if self.batch % ndev:
            raise ValueError(f"batch {self.batch} not divisible by "
                             f"{ndev} devices")
        comp, scal, states, frame = self._pack(entries, transcripts)
        nbytes = self.batch * self.NCHECKS * 64
        wbytes = os.urandom(nbytes) if rng is None else rng.fill_bytes(nbytes)
        weights = np.frombuffer(wbytes, np.uint8).reshape(
            self.batch, self.NCHECKS, 64).astype(np.int32)
        axis = mesh.axis_names[0]
        spec = P(axis)

        @partial(shard_map, mesh=mesh, in_specs=(spec,) * 4, out_specs=P())
        def run(c, s, w, st):
            ok = self._build(c, s, w, st, frame)
            return jax.lax.psum(jnp.where(ok, 0, 1).astype(jnp.int32), axis)

        prev = (self._use_pallas_msm, self._use_pallas_pt)
        self._use_pallas_msm = self._use_pallas_pt = False  # trace-time flags
        try:
            nbad = jax.jit(run)(jnp.asarray(comp), jnp.asarray(scal),
                                jnp.asarray(weights), jnp.asarray(states))
        finally:
            self._use_pallas_msm, self._use_pallas_pt = prev
        if int(nbad):
            raise ValueError(
                "Device batched shuffle verification failed (sharded)")


#: canonical field limbs [..., 24] -> [..., 32] int32 LE bytes (the field
#: and scalar engines share the 11x24 radix, so the packer is shared too)
_limbs_to_bytes_dev = jax.jit(sf._pack_bytes)


# ---------------------------------------------------------------------------
# production dispatch: shape-bucketed verifier instances
# ---------------------------------------------------------------------------

_VERIFIER_CACHE: dict = {}


def get_device_shuffle_verifier(m: int, batch: int,
                                proof_label: bytes = b"Shuffle",
                                transcript_label: bytes = b"ShuffleProof"
                                ) -> DeviceShuffleVerifier:
    """Process-wide cache of compiled verifier instances, keyed by shape."""
    key = (m, batch, bytes(proof_label), bytes(transcript_label))
    v = _VERIFIER_CACHE.get(key)
    if v is None:
        v = _VERIFIER_CACHE.setdefault(
            key, DeviceShuffleVerifier(m, batch, proof_label,
                                       transcript_label))
    return v


def device_batch_verify(entries, transcripts=None, rng=None,
                        min_bucket: int = 2) -> None:
    """Verify [(proof, statement, inputs, outputs), ...] entirely on device.

    Groups by anonymity-set size, pads each group to a power-of-two lane
    bucket (duplicate lanes re-verify an existing entry — harmless) and
    runs each group as ONE jitted program: batched STROBE transcript
    replay, challenge arithmetic, per-lane scalar-muls, and the combined
    19-check MSM. The TPU-native successor of looping the host verifier
    (/root/reference/src/shuffle/shuffle.rs:547-712).

    `transcripts`, when given, are per-entry host Transcript objects in the
    pre-proof state (for shuffles embedded in a larger protocol). All
    entries of one shape group must share transcript framing.
    """
    import math

    groups: dict = {}
    for i, e in enumerate(entries):
        n_acc = len(e[2])
        # lanes of one program must share the static STROBE frame; mixed
        # standalone / embedded prefixes bucket separately
        frame = (None if transcripts is None
                 else snapshot_host_strobe(transcripts[i].strobe)[1:])
        groups.setdefault((n_acc, frame), []).append(i)
    for (n_acc, _), idxs in sorted(groups.items(),
                                   key=lambda kv: repr(kv[0])):
        m = math.isqrt(n_acc)
        if m * m != n_acc:
            raise ValueError(f"anonymity set size {n_acc} is not square")
        B = max(min_bucket, 1 << (len(idxs) - 1).bit_length())
        pad_idx = idxs + [idxs[0]] * (B - len(idxs))
        dsv = get_device_shuffle_verifier(m, B)
        ts = None if transcripts is None else [transcripts[i]
                                               for i in pad_idx]
        dsv.verify([entries[i] for i in pad_idx], transcripts=ts, rng=rng)
