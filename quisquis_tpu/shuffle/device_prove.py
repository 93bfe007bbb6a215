"""Fully on-device batched shuffle-proof GENERATION.

The prove side of the headline workload
(/root/reference/src/shuffle/shuffle.rs:361-532): for B shuffles of one
shape (m x m anonymity matrix, N = m^2 accounts), the ENTIRE prover runs
inside one jitted program —

  upload:  permutation / tau / rho witnesses, account bytes, the host
           rng's pre-drawn blinding+entropy bytes, transcript snapshots
  device:  batched STROBE transcripts AND witness-rekeyed transcript
           RNGs (DeviceTranscriptRng — bit-exact merlin TranscriptRng);
           every commitment as rows of shared-doubling MSMs
           (Pallas pipeline on TPU); Lagrange/quotient polynomial
           arithmetic, bilinear maps, and all challenge responses as
           batched scalar-field tensor ops
  fetch:   every proof field (compressed points + canonical scalars)

Byte-identical to ShuffleProof.create_shuffle_proof under the same
SeededRng stream (tests/test_device_shuffle_prove.py): the host rng is
only ever used for the c_A blindings and the 9 transcript-RNG entropy
finalizations, all drawn at pack time in the host prover's exact order;
every other random draw is replayed on device from the transcript state,
exactly as merlin's witness-rekeyed TranscriptRng does it.

Sub-argument provers mirrored here (host modules in parentheses):
permutation/tau/b/b' commitments (shuffle.py:193-226), Hadamard
(hadamard.py:48-123), Product = MultiHadamard + Zero + SVP
(product.py:192-314, singlevalueproduct.py:51-90), DDH (ddh.py:31-51),
and both multi-exponentiation variants (multiexponential.py:116-190).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import exact as ex
from ..ops import field as fe
from ..ops import point as pt
from ..ops import scalar_field as sf
from ..ops.device_strobe import (DeviceStrobe, DeviceTranscript,
                                 DeviceTranscriptRng, snapshot_host_strobe)
from ..primitives.pedersen import default_pedersen_gens, vector_pedersen_gens
from ..primitives.keys import RistrettoPublicKey
from ..bulletproofs.device_verify import (_decompress_u8, _to_nibbles,
                                          _sf_tree_sum)
from .device_verify import _limbs_to_bytes_dev, _compress_jit

L = ex.L


def _tree_sum2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """sf tree-sum over an arbitrary axis."""
    x = jnp.moveaxis(x, axis, -2)
    return _sf_tree_sum(x.reshape((-1,) + x.shape[-2:])).reshape(
        x.shape[:-2] + (sf.NLIMBS,))


class DeviceShuffleProver:
    """Compiled batched prover for shuffle proofs of one shape.

    Usage::

        dsp = DeviceShuffleProver(m=8, batch=16)
        proofs_and_statements = dsp.prove(shuffles, rngs)

    `shuffles`: B Shuffle objects (inputs/outputs/tau/rho/pi);
    `rngs`: one SeededRng per lane, consumed in the host prover's exact
    order; `transcripts` (optional): per-lane host Transcript objects in
    the pre-proof state (NOT advanced — callers embedding these proofs
    advance with ShuffleProof verify-side replay or re-prove on host).
    """

    #: number of prover._rng entropy finalizations, in call order:
    #: shuffle trng, hadamard, product, multihadamard, zero, svp, ddh,
    #: multiexpo-pk, multiexpo-commit
    N_ENTROPY = 9

    def __init__(self, m: int, batch: int, proof_label: bytes = b"Shuffle",
                 transcript_label: bytes = b"ShuffleProof"):
        assert m >= 2, "shuffle prover needs m >= 2"
        self.m = m
        self.N = m * m
        self.batch = batch
        self.proof_label = bytes(proof_label)
        self.transcript_label = bytes(transcript_label)
        xpc = vector_pedersen_gens(m + 1)
        pc = default_pedersen_gens()
        base_pk = RistrettoPublicKey.generate_base_pk()
        #: shared commit basis [H, G_0..G_{m-1}] (pedersen.py:69-73); the
        #: SVP truncated gens are the same chain prefix [H, G_0..G_{m-2}]
        self._xpc_basis = pt.from_exact_batch([xpc.H] + xpc.G_vec[:m])
        self._pc_basis = pt.from_exact_batch([pc.B, pc.B_blinding])
        self._base_g = pt.from_exact_batch([base_pk.gr_point])
        self._base_h = pt.from_exact_batch([base_pk.grsk_point])
        self._basepoint = pt.from_exact_batch([ex.BASEPOINT])
        self._use_pallas = jax.default_backend() == "tpu"
        #: debug/profiling knob: truncate _build after the named phase
        #: ("commits" | "hadamard" | "product" | "ddh"; None = full).
        #: tools/profile_device_shuffle.py <m> <B> prove-phases uses it to
        #: attribute the prover's steady-state wall clock.
        self._stop_at: Optional[str] = None
        self._prove_jit = jax.jit(self._build, static_argnums=8)

    @staticmethod
    def _truncated(out_pts, out_scal, ok):
        """Early _build return for _stop_at profiling variants."""
        pts = jnp.concatenate(out_pts, axis=1)
        scal = (jnp.concatenate(out_scal, axis=1) if out_scal
                else jnp.zeros((ok.shape[0], 1, 32), jnp.int32))
        return pts, scal, ok

    # ------------------------------------------------------------- helpers

    def _rows_msm(self, coeffs: jnp.ndarray, points: pt.ExtPoint
                  ) -> pt.ExtPoint:
        """Per-row MSM: coeffs [B, R, k] sf limbs over ExtPoint [B, R, k]
        -> [B, R]. Pallas pipeline on TPU, XLA rows form elsewhere."""
        from ..ops import msm as qmsm

        B, R, k = coeffs.shape[0], coeffs.shape[1], coeffs.shape[2]
        nib = _to_nibbles(coeffs).reshape(B * R, k, 64)
        flat = pt.ExtPoint(*(c.reshape((B * R, k) + c.shape[3:])
                             for c in points))
        if self._use_pallas:
            from ..ops import pallas_point as kp

            out = kp.msm_rows_pallas(nib, flat)
        else:
            out = jax.jit(qmsm.msm_rows_raw)(nib, flat)
        return pt.ExtPoint(*(c.reshape((B, R) + c.shape[1:]) for c in out))

    def _commit_rows(self, vals: jnp.ndarray, blind: jnp.ndarray,
                     k_basis: int) -> pt.ExtPoint:
        """xpc commit per row: blind*H + sum vals_i G_i.

        vals [B, R, k<=m] limbs, blind [B, R] limbs; k_basis selects the
        chain prefix (m for full rows, m-1 for the SVP truncated gens)."""
        B, R, k = vals.shape[0], vals.shape[1], vals.shape[2]
        assert k == k_basis
        scal = jnp.concatenate([blind[:, :, None, :], vals], axis=2)
        basis = pt.ExtPoint(*(jnp.concatenate([c[0:1], c[1:1 + k]], axis=0)
                              for c in self._xpc_basis))
        bpts = pt.ExtPoint(*(jnp.broadcast_to(c[None, None],
                                              (B, R) + c.shape)
                             for c in basis))
        return self._rows_msm(scal, bpts)

    def _commit_pc(self, vals: jnp.ndarray, blind: jnp.ndarray
                   ) -> pt.ExtPoint:
        """Plain Pedersen per row: vals*B + blind*B_blinding; [B, R]."""
        B, R = vals.shape[0], vals.shape[1]
        scal = jnp.stack([vals, blind], axis=2)        # [B, R, 2]
        bpts = pt.ExtPoint(*(jnp.broadcast_to(c[None, None],
                                              (B, R) + c.shape)
                             for c in self._pc_basis))
        return self._rows_msm(scal, bpts)

    @staticmethod
    def _enc(points: pt.ExtPoint):
        """(canonical limbs [B,k,24], byte tensor [B,k,32])."""
        limbs = _compress_jit(points)
        return limbs, _limbs_to_bytes_dev(limbs)

    @staticmethod
    def _rekey(drng: DeviceTranscriptRng, arr_bytes: jnp.ndarray) -> None:
        """rekey_with_witness_batch(b'', ..., 32): arr_bytes [B, k, 32]."""
        for i in range(arr_bytes.shape[1]):
            drng.rekey_with_witness_bytes(b"", arr_bytes[:, i], 32)

    @staticmethod
    def _draw(drng: DeviceTranscriptRng) -> jnp.ndarray:
        """One Scalar::random draw: 64 PRF bytes reduced mod l."""
        return sf.from_bytes_wide(drng.random_scalar_bytes())

    def _draws(self, drng: DeviceTranscriptRng, k: int) -> jnp.ndarray:
        """k sequential draws stacked on axis 1: [B, k, 24]."""
        return jnp.stack([self._draw(drng) for _ in range(k)], axis=1)

    # ------------------------------------------------------------- device

    def _build(self, perm, tau_b, rho_b, r_b, ent, acc_in, acc_out,
               states, frame):
        m, N = self.m, self.N
        n = m                                   # square matrices: n == m
        B = perm.shape[0]

        out_pts: List[jnp.ndarray] = []         # encoded-point slices
        out_scal: List[jnp.ndarray] = []        # canonical scalar bytes

        dt = object.__new__(DeviceTranscript)
        dt.strobe = DeviceStrobe.from_host_states(states, *frame)

        ok_in, in_pts = _decompress_u8(acc_in)      # [B, 4N]
        ok_out, out_pts_dev = _decompress_u8(acc_out)
        ok = jnp.logical_and(jnp.all(ok_in, axis=-1),
                             jnp.all(ok_out, axis=-1))
        in_g = pt.ExtPoint(*(c[:, 0:N] for c in in_pts))
        in_h = pt.ExtPoint(*(c[:, N:2 * N] for c in in_pts))
        o_g = pt.ExtPoint(*(c[:, 0:N] for c in out_pts_dev))
        o_h = pt.ExtPoint(*(c[:, N:2 * N] for c in out_pts_dev))
        o_c = pt.ExtPoint(*(c[:, 2 * N:3 * N] for c in out_pts_dev))
        o_d = pt.ExtPoint(*(c[:, 3 * N:4 * N] for c in out_pts_dev))

        tau = sf.from_bytes(tau_b)                  # [B, N, 24]
        rho = sf.from_bytes(rho_b)                  # [B, 24]
        r_blind = sf.from_bytes(r_b)                # [B, m, 24]
        # witness matrix: permutation values as scalars (< 2^11 -> limb 0)
        wit = jnp.concatenate(
            [perm[..., None],
             jnp.zeros(perm.shape + (sf.NLIMBS - 1,), jnp.int32)], axis=-1)
        wit_rows = wit.reshape(B, m, n, sf.NLIMBS)

        # ---- permutation commitments c_A (shuffle.py:193-196) ----
        c_A = self._commit_rows(wit_rows, r_blind, m)
        cA_l, cA_b = self._enc(c_A)

        # ---- shuffle trng (shuffle.py:197): rekey tau, entropy E0 ----
        trng = DeviceTranscriptRng(dt.strobe)
        self._rekey(trng, tau_b)
        trng.finalize(ent[:, 0])
        r_dash = self._draws(trng, m)               # [B, m]

        tau_rows = tau.reshape(B, m, n, sf.NLIMBS)
        c_tau = self._commit_rows(tau_rows, r_dash, m)
        ctau_l, ctau_b = self._enc(c_tau)
        for i in range(m):
            dt.append_point_var(b"ACommitment", cA_b[:, i])
            dt.append_point_var(b"tauCommitment", ctau_b[:, i])
        x = sf.from_bytes_wide(dt.get_challenge_bytes(b"xChallenge"))
        exp_x = sf.powers(x, N + 1)[:, 1:]          # x^1..x^N [B, N]

        # ---- b, b' witnesses (shuffle.py:208-216, create_b_b_dash) ----
        idx = (perm - 1).astype(jnp.int32)          # [B, N]
        b_flat = jnp.take_along_axis(exp_x, idx[..., None], axis=1)
        tau_inv = sf.batch_invert_rows(tau)
        b_dash_flat = sf.mul(b_flat, tau_inv)
        s_vec = self._draws(trng, m)
        s_dash = self._draws(trng, m)
        b_rows = b_flat.reshape(B, m, n, sf.NLIMBS)
        bd_rows = b_dash_flat.reshape(B, m, n, sf.NLIMBS)
        c_B = self._commit_rows(b_rows, s_vec, m)
        c_Bd = self._commit_rows(bd_rows, s_dash, m)
        cB_l, cB_b = self._enc(c_B)
        cBd_l, cBd_b = self._enc(c_Bd)
        for i in range(m):
            dt.append_point_var(b"BCommitment", cB_b[:, i])
            dt.append_point_var(b"BDashCommitment", cBd_b[:, i])
        out_pts += [cA_b, ctau_b, cB_b, cBd_b]
        if self._stop_at == "commits":
            return self._truncated(out_pts, out_scal, ok)

        # ---- Hadamard argument (hadamard.py:48-123) ----
        # a_rows = b', b_rows = tau, c_rows = b;
        # witness_r = s_dash, witness_s = r_dash, witness_t = s_vec
        dt.domain_sep(b"HadamardProductProof")
        hrng = DeviceTranscriptRng(dt.strobe)
        combined = jnp.concatenate(
            [sf.to_bytes_array(s_dash), sf.to_bytes_array(r_dash),
             sf.to_bytes_array(s_vec), sf.to_bytes_array(b_dash_flat),
             sf.to_bytes_array(tau), sf.to_bytes_array(b_flat)], axis=1)
        self._rekey(hrng, combined)
        hrng.finalize(ent[:, 1])

        h_a0 = self._draws(hrng, n)                 # [B, n]
        h_b0 = self._draws(hrng, n)
        h_c0 = sf.mul(h_a0, h_b0)
        h_r0 = self._draw(hrng)
        h_s0 = self._draw(hrng)
        h_t0 = self._draw(hrng)
        had0 = self._commit_rows(
            jnp.stack([h_a0, h_b0, h_c0], axis=1),
            jnp.stack([h_r0, h_s0, h_t0], axis=1), m)
        had0_l, had0_b = self._enc(had0)

        omega = self._draws(hrng, m)                # [B, m]
        # l(X) = prod (X - w_i): coefficient convolution, m static steps
        lc = jnp.concatenate([sf.one((B,))[:, None], sf.zeros((B, m))[:, :0]],
                             axis=1)                # [B, 1] -> degree 0
        for i in range(m):
            wi = omega[:, i]
            shifted = jnp.concatenate([sf.zeros((B, 1)), lc], axis=1)
            scaled = jnp.concatenate(
                [sf.mul(lc, sf.neg(wi)[:, None, :]), sf.zeros((B, 1))],
                axis=1)
            lc = sf.add(shifted, scaled)            # [B, deg+2] (low->high)
        # lc: [B, m+1] coefficients of l(X), constant term first
        # l_i(X) numerators by synthetic division of l by (X - w_i):
        # q_{m-1} = c_m; q_{k-1} = c_k + w_i * q_k
        denom = []
        for i in range(m):
            d = sf.one((B,))
            for j in range(m):
                if j != i:
                    d = sf.mul(d, sf.sub(omega[:, i], omega[:, j]))
            denom.append(d)
        denom_inv = sf.batch_invert_rows(jnp.stack(denom, axis=1))
        li_coef = []                                # m polys of degree m-1
        for i in range(m):
            wi = omega[:, i]
            q = [lc[:, m]]                          # degree m-1 coeff
            for k_ in range(m - 1, 0, -1):
                q.append(sf.add(lc[:, k_], sf.mul(wi, q[-1])))
            q = jnp.stack(list(reversed(q)), axis=1)     # [B, m] low->high
            li_coef.append(sf.mul(q, denom_inv[:, i][:, None, :]))
        li = jnp.stack(li_coef, axis=1)             # [B, m, m]

        def col_expr(rows_, v0):
            """Per-column polys: v0_j*l(X) + sum_i rows_[i][j]*l_i(X).
            rows_ [B, m, n], v0 [B, n] -> [B, n, m+1] coeffs low->high."""
            t1 = sf.mul(lc[:, None], v0[:, :, None, :])       # [B,n,m+1]
            # sum_i rows_[:, i, j] * li[:, i, :] -> [B, n, m]
            t2 = _tree_sum2(sf.mul(rows_[:, :, :, None, :],
                                   li[:, :, None, :, :]), 1)
            t2 = jnp.concatenate([t2, sf.zeros((B, n, 1))], axis=2)
            return sf.add(t1, t2)

        a_expr = col_expr(bd_rows, h_a0)            # [B, n, m+1]
        b_expr = col_expr(tau_rows, h_b0)
        c_expr = col_expr(b_rows, h_c0)

        # (a_expr * b_expr - c_expr) / l(X): degree-2m product then long
        # division by monic-leading l (leading coeff of l is 1)
        deg = 2 * m
        prod_c = sf.zeros((B, n, deg + 1))
        for i_ in range(m + 1):
            for j_ in range(m + 1):
                prod_c = prod_c.at[:, :, i_ + j_].set(
                    sf.add(prod_c[:, :, i_ + j_],
                           sf.mul(a_expr[:, :, i_], b_expr[:, :, j_])))
        prod_c = prod_c.at[:, :, :m + 1].set(
            sf.sub(prod_c[:, :, :m + 1], c_expr))
        rem = prod_c
        qcoef = [None] * (m + 1)
        for k_ in range(deg, m - 1, -1):
            qk = rem[:, :, k_]
            qcoef[k_ - m] = qk
            for j_ in range(m + 1):
                rem = rem.at[:, :, k_ - m + j_].set(
                    sf.sub(rem[:, :, k_ - m + j_],
                           sf.mul(qk, lc[:, None, j_])))
        quot = jnp.stack(qcoef, axis=2)             # [B, n, m+1]

        # delta_vec rows: i-th coefficient across columns -> [B, m+1, n]
        delta_vec = jnp.moveaxis(quot, 2, 1)
        rho_h = self._draws(hrng, m + 1)
        c_delta = self._commit_rows(delta_vec, rho_h, m)
        cdelta_l, cdelta_b = self._enc(c_delta)

        for i in range(m):
            dt.append_point_var(b"c_a", cBd_b[:, i])
            dt.append_point_var(b"c_b", ctau_b[:, i])
            dt.append_point_var(b"c_c", cB_b[:, i])
        dt.append_point_var(b"c_a_0", had0_b[:, 0])
        dt.append_point_var(b"c_b_0", had0_b[:, 1])
        dt.append_point_var(b"c_c_0", had0_b[:, 2])
        for i in range(m + 1):
            dt.append_point_var(b"c_delta", cdelta_b[:, i])
        hx = sf.from_bytes_wide(dt.get_challenge_bytes(b"challenge"))

        hx_pow = sf.powers(hx, m + 2)               # x^0..x^{m+1}

        def poly_eval(coefs, npow):
            """Evaluate [B, n, deg+1] coeffs at hx via power dot."""
            return _tree_sum2(sf.mul(coefs, hx_pow[:, None, :npow, :]), 2)

        a_bar = poly_eval(a_expr, m + 1)            # [B, n]
        b_bar = poly_eval(b_expr, m + 1)
        c_bar = poly_eval(c_expr, m + 1)
        ev0 = _tree_sum2(sf.mul(lc, hx_pow[:, :m + 1]), 1)   # l(hx) [B]
        li_ev = _tree_sum2(sf.mul(li, hx_pow[:, None, :m, :]), 2)  # [B, m]
        r_bar = sf.add(sf.mul(h_r0, ev0),
                       _tree_sum2(sf.mul(s_dash, li_ev), 1))
        s_bar = sf.add(sf.mul(h_s0, ev0),
                       _tree_sum2(sf.mul(r_dash, li_ev), 1))
        t_bar = sf.add(sf.mul(h_t0, ev0),
                       _tree_sum2(sf.mul(s_vec, li_ev), 1))
        x_i_rho = _tree_sum2(sf.mul(hx_pow[:, :m + 1], rho_h), 1)
        rho_bar = sf.mul(ev0, x_i_rho)
        out_pts += [had0_b, cdelta_b]
        out_scal += [sf.to_bytes_array(omega), sf.to_bytes_array(a_bar),
                     sf.to_bytes_array(b_bar), sf.to_bytes_array(c_bar),
                     sf.to_bytes_array(jnp.stack(
                         [r_bar, s_bar, t_bar, rho_bar], axis=1))]

        if self._stop_at == "hadamard":
            return self._truncated(out_pts, out_scal, ok)

        # ---- y, z + e-matrix (shuffle.py:228-238) ----
        y = sf.from_bytes_wide(dt.get_challenge_bytes(b"yChallenge"))
        z = sf.from_bytes_wide(dt.get_challenge_bytes(b"zChallenge"))
        a_flat = wit.reshape(B, N, sf.NLIMBS)
        f = sf.add(sf.mul(a_flat, y[:, None, :]), b_flat)
        t_blind = sf.add(sf.mul(r_blind, y[:, None, :]), s_vec)  # [B, m]
        e = sf.sub(f, jnp.broadcast_to(z[:, None, :], f.shape))
        # column-major m x n: e_rows[i][j] = e[j*m + i]
        e_rows = jnp.moveaxis(e.reshape(B, n, m, sf.NLIMBS), 2, 1)

        # ---- Product argument (product.py:287-314) ----
        # witness_cols = columns(e_rows): cols[i][j] = e_rows[j][i]
        wit_cols = jnp.moveaxis(e_rows, 2, 1)       # [B, m(col), n(row)]
        c_prod_A = self._commit_rows(wit_cols, t_blind, m)
        cprodA_l, cprodA_b = self._enc(c_prod_A)
        # bvec = row products of e_rows
        bvec = e_rows[:, :, 0]
        for j_ in range(1, n):
            bvec = sf.mul(bvec, e_rows[:, :, j_])   # [B, m]
        prng = DeviceTranscriptRng(dt.strobe)
        bvec_bytes = sf.to_bytes_array(bvec)
        self._rekey(prng, bvec_bytes)
        prng.finalize(ent[:, 2])
        s3 = self._draw(prng)
        cb = self._commit_rows(bvec[:, None], s3[:, None], m)
        cb_l, cb_b = self._enc(cb)
        svp_b_stmt = bvec[:, 0]
        for i in range(1, m):
            svp_b_stmt = sf.mul(svp_b_stmt, bvec[:, i])

        # ---- MultiHadamard (product.py:192-242) ----
        dt.domain_sep(b"MultiHadamardProductProof")
        # running hadamard products over columns of the witness
        b_list = [wit_cols[:, 0]]
        for i in range(1, m - 1):
            b_list.append(sf.mul(b_list[-1], wit_cols[:, i]))
        b_list.append(bvec)
        mhrng = DeviceTranscriptRng(dt.strobe)
        self._rekey(mhrng, bvec_bytes)
        mhrng.finalize(ent[:, 3])
        s_mid = self._draws(mhrng, m - 2) if m > 2 else sf.zeros((B, 0))
        # s_vec_product = [t_blind[0], s_mid..., s3]
        s_prod = jnp.concatenate(
            [t_blind[:, 0:1], s_mid, s3[:, None]], axis=1)   # [B, m]
        if m > 2:
            c_mid = self._commit_rows(
                jnp.stack(b_list[1:m - 1], axis=1), s_mid, m)
            cmid_l, cmid_b = self._enc(c_mid)
        # c_B_initial encodings: [c_prod_A[0], mids..., cb]
        mh_cB_b = jnp.concatenate(
            [cprodA_b[:, 0:1]] + ([cmid_b] if m > 2 else [])
            + [cb_b], axis=1)                       # [B, m, 32]
        for i in range(m):
            dt.append_point_var(b"BVectorCommitment", mh_cB_b[:, i])
        mhx = sf.from_bytes_wide(dt.get_challenge_bytes(b"XChallenge"))
        mhy = sf.from_bytes_wide(dt.get_challenge_bytes(b"YChallenge"))
        mhx_exp = sf.powers(mhx, m + 1)[:, 1:]      # x^1..x^m [B, m]
        out_pts += [cb_b, mh_cB_b]

        # d-columns for the zero argument (product.py:225-235)
        blist_t = jnp.stack(b_list, axis=1)         # [B, m, n]
        d_list = sf.mul(blist_t[:, :m - 1],
                        mhx_exp[:, :m - 1, None, :])     # [B, m-1, n]
        t_list = sf.mul(s_prod[:, :m - 1], mhx_exp[:, :m - 1])
        d_sum = _tree_sum2(sf.mul(blist_t[:, 1:m],
                                  mhx_exp[:, :m - 1, None, :]), 1)  # [B,n]
        t_sum = _tree_sum2(sf.mul(mhx_exp[:, :m - 1], s_prod[:, 1:m]), 1)
        # zero-argument inputs: a_cols = wit_cols[1:m] + [-1 vector],
        # b_cols = d_list + [d_sum]; r_vec = t_blind, s_vec = t_list+[t_sum]
        neg_one_col = jnp.broadcast_to(
            sf.neg(sf.one((B,)))[:, None, :], (B, n, sf.NLIMBS))
        z_a_cols = jnp.concatenate(
            [wit_cols[:, 1:m], neg_one_col[:, None]], axis=1)   # [B, m, n]
        z_b_cols = jnp.concatenate(
            [d_list, d_sum[:, None]], axis=1)                   # [B, m, n]
        z_s_vec = jnp.concatenate([t_list, t_sum[:, None]], axis=1)

        # ---- Zero argument (product.py:59-109) ----
        dt.domain_sep(b"ZeroArgumentProof")
        # rekey = row-major flat of the a-matrix = columns(a_cols)
        a_mat_rows = jnp.moveaxis(z_a_cols, 2, 1)   # [B, n(row), m(col)]
        zrng = DeviceTranscriptRng(dt.strobe)
        self._rekey(zrng, sf.to_bytes_array(
            a_mat_rows.reshape(B, n * m, sf.NLIMBS)))
        zrng.finalize(ent[:, 4])
        z_a0 = self._draws(zrng, n)
        z_bm = self._draws(zrng, n)
        z_r0 = self._draw(zrng)
        z_sm = self._draw(zrng)
        z_head = self._commit_rows(jnp.stack([z_a0, z_bm], axis=1),
                                   jnp.stack([z_r0, z_sm], axis=1), m)
        zhead_l, zhead_b = self._enc(z_head)

        full_a = jnp.concatenate([z_a0[:, None], z_a_cols], axis=1)
        full_b = jnp.concatenate([z_b_cols, z_bm[:, None]], axis=1)
        y_i = sf.powers(mhy, n + 1)[:, 1:]          # y^1..y^n
        # bilinear map dv_k = sum_{i: j=m-k+i in [0,m]} <a_i, b_j>_y
        dv = []
        for k_ in range(2 * m + 1):
            acc = None
            for i_ in range(m + 1):
                j_ = m - k_ + i_
                if 0 <= j_ <= m:
                    term = _tree_sum2(
                        sf.mul(sf.mul(full_a[:, i_], full_b[:, j_]), y_i), 1)
                    acc = term if acc is None else sf.add(acc, term)
            dv.append(acc if acc is not None else sf.zeros((B,)))
        dv = jnp.stack(dv, axis=1)                  # [B, 2m+1]
        t_z = self._draws(zrng, 2 * m + 1)
        t_z = t_z.at[:, m + 1].set(sf.zeros((B,)))
        c_D = self._commit_pc(dv, t_z)
        cD_l, cD_b = self._enc(c_D)

        dt.append_point_var(b"A0Commitment", zhead_b[:, 0])
        dt.append_point_var(b"BmCommitment", zhead_b[:, 1])
        for i in range(2 * m + 1):
            dt.append_point_var(b"DCommitment", cD_b[:, i])
        zx = sf.from_bytes_wide(dt.get_challenge_bytes(b"challenge"))
        zx_exp = sf.powers(zx, 2 * m + 1)           # x^0..x^2m
        zx_m = zx_exp[:, :m + 1]
        zx_mr = zx_m[:, ::-1]                       # x^m..x^0
        z_a_bar = _tree_sum2(sf.mul(full_a, zx_m[:, :, None, :]), 1)
        z_b_bar = _tree_sum2(sf.mul(full_b, zx_mr[:, :, None, :]), 1)
        r_ext = jnp.concatenate(
            [z_r0[:, None], t_blind[:, 1:m], sf.zeros((B, 1))], axis=1)
        s_ext = jnp.concatenate([z_s_vec, z_sm[:, None]], axis=1)
        z_r_new = _tree_sum2(sf.mul(r_ext, zx_m), 1)
        z_s_new = _tree_sum2(sf.mul(s_ext, zx_mr), 1)
        z_t_new = _tree_sum2(sf.mul(t_z, zx_exp), 1)
        out_pts += [zhead_b, cD_b]
        out_scal += [sf.to_bytes_array(z_a_bar), sf.to_bytes_array(z_b_bar),
                     sf.to_bytes_array(jnp.stack(
                         [z_r_new, z_s_new, z_t_new], axis=1))]

        # ---- SVP (singlevalueproduct.py:51-90): a_vec = bvec, r = s3 ----
        dt.domain_sep(b"SingleValueProductProof")
        srng = DeviceTranscriptRng(dt.strobe)
        # SVP bvec = running products of its a_vec (== product bvec)
        run = [bvec[:, 0]]
        for i in range(1, m):
            run.append(sf.mul(run[-1], bvec[:, i]))
        run = jnp.stack(run, axis=1)                # [B, m]
        self._rekey(srng, sf.to_bytes_array(run))
        srng.finalize(ent[:, 5])
        sv_d = self._draws(srng, n)
        sv_rd = self._draw(srng)
        sv_cd = self._commit_rows(sv_d[:, None], sv_rd[:, None], m)
        sv_delta = self._draws(srng, n)
        sv_delta = sv_delta.at[:, 0].set(sv_d[:, 0])
        sv_delta = sv_delta.at[:, n - 1].set(sf.zeros((B,)))
        sv_s1 = self._draw(srng)
        sv_sx = self._draw(srng)
        d_lower = sf.neg(sf.mul(sv_delta[:, :n - 1], sv_d[:, 1:]))
        d_upper = sf.sub(
            sf.sub(sv_delta[:, 1:],
                   sf.mul(bvec[:, 1:], sv_delta[:, :n - 1])),
            sf.mul(run[:, :n - 1], sv_d[:, 1:]))
        sv_deltas = self._commit_rows(
            jnp.stack([d_lower, d_upper], axis=1),
            jnp.stack([sv_s1, sv_sx], axis=1), m - 1)
        svd_l, svd_b = self._enc(sv_cd)
        svdl_l, svdl_b = self._enc(sv_deltas)
        dt.append_point_var(b"DeltaSmall", svdl_b[:, 0])
        dt.append_point_var(b"DeltaCapital", svdl_b[:, 1])
        dt.append_point_var(b"d", svd_b[:, 0])
        sx = sf.from_bytes_wide(dt.get_challenge_bytes(b"challenge"))
        sv_a_bar = sf.add(sf.mul(bvec, sx[:, None, :]), sv_d)
        sv_b_bar = sf.add(sf.mul(run, sx[:, None, :]), sv_delta)
        sv_r_bar = sf.add(sf.mul(s3, sx), sv_rd)
        sv_s_bar = sf.add(sf.mul(sv_sx, sx), sv_s1)
        out_pts += [svd_b, svdl_b]
        out_scal += [sf.to_bytes_array(sv_a_bar), sf.to_bytes_array(sv_b_bar),
                     sf.to_bytes_array(jnp.stack(
                         [sv_r_bar, sv_s_bar, svp_b_stmt], axis=1))]

        if self._stop_at == "product":
            return self._truncated(out_pts, out_scal, ok)

        # ---- DDH (ddh.py:31-51) as 6 MSM rows over the input pks ----
        dt.domain_sep(b"DDHTupleProof")
        drng = DeviceTranscriptRng(dt.strobe)
        self._rekey(drng, sf.to_bytes_array(exp_x))
        drng.finalize(ent[:, 6])
        ddh_r = self._draw(drng)
        xr = sf.mul(exp_x, rho[:, None, :])
        xs = sf.mul(exp_x, ddh_r[:, None, :])
        ddh_coeffs = jnp.stack(
            [exp_x, exp_x, xr, xr, xs, xs], axis=1)       # [B, 6, N]
        ddh_points = pt.ExtPoint(*(jnp.stack([g, h, g, h, g, h], axis=1)
                                   for g, h in zip(in_g, in_h)))
        ddh_out = self._rows_msm(ddh_coeffs, ddh_points)  # [B, 6]
        ddh_l, ddh_b = self._enc(ddh_out)   # G, H, G', H', g_r, h_r
        dt.append_point_var(b"g", ddh_b[:, 0])
        dt.append_point_var(b"g_dash", ddh_b[:, 2])
        dt.append_point_var(b"h", ddh_b[:, 1])
        dt.append_point_var(b"h_dash", ddh_b[:, 3])
        dt.append_point_var(b"gr", ddh_b[:, 4])
        dt.append_point_var(b"hr", ddh_b[:, 5])
        ddh_chal = sf.from_bytes_wide(dt.get_challenge_bytes(b"Challenge"))
        ddh_z = sf.sub(ddh_r, sf.mul(ddh_chal, rho))
        out_pts += [ddh_b[:, 2:4]]
        out_scal += [sf.to_bytes_array(jnp.stack([ddh_chal, ddh_z], axis=1))]

        if self._stop_at == "ddh":
            return self._truncated(out_pts, out_scal, ok)

        # ---- Multi-exponentiation (multiexponential.py:116-190) ----
        # pk variant reencrypts under the real base pk; the commit variant
        # under pk_GH = (G, H) with randomness -rho (shuffle.py:249-257,
        # shuffle.rs:502-513)
        G_agg = pt.ExtPoint(*(c[:, 0] for c in ddh_out))
        H_agg = pt.ExtPoint(*(c[:, 1] for c in ddh_out))
        mepk = self._multiexpo(
            dt, b"MultiExponentialPubKeyProof", ent[:, 7],
            bd_rows, s_dash, o_g, o_h, reenc_base=("pk", None))
        mec = self._multiexpo(
            dt, b"MultiExponentialElgamalCommmitmentProof", ent[:, 8],
            b_rows, s_vec, o_c, o_d,
            reenc_base=("commit", (sf.neg(rho), G_agg, H_agg)))
        out_pts += mepk[0] + mec[0]
        out_scal += mepk[1] + mec[1]
        # ZeroStatement carries c_prod_A[1:m] (the verifier reconstructs
        # them as c_E from y*c_A + c_B - z*sumG)
        out_pts += [cprodA_b[:, 1:]]

        return (jnp.concatenate(out_pts, axis=1),
                jnp.concatenate(out_scal, axis=1), ok)

    def _multiexpo(self, dt, label, entropy, a_rows, s_blind, pts0, pts1,
                   reenc_base):
        """Shared multiexpo prover: returns ([point byte slices],
        [scalar byte slices]).

        a_rows [B, m, n] witness; s_blind [B, m]; pts0/pts1 [B, N] the
        shuffled output components (g/h or c/d). reenc_base selects the
        reencryption form: ("pk", None) adds b_k*base_pk to both
        components; ("commit", (neg_rho, G_agg, H_agg)) adds
        Enc_pk_GH(b_k; tau_k) with tau_m pinned to -rho — the shuffle
        caller passes pk_GH and the negated reencryption randomness
        (shuffle.py:254-257, multiexponential.rs:163-242)."""
        m, N, B = self.m, self.N, a_rows.shape[0]
        n = m
        dt.domain_sep(label)
        rng = DeviceTranscriptRng(dt.strobe)
        self._rekey(rng, sf.to_bytes_array(
            a_rows.reshape(B, N, sf.NLIMBS)))
        rng.finalize(entropy)
        a_0 = self._draws(rng, n)
        r_0 = self._draw(rng)
        b_vec = self._draws(rng, 2 * m)
        s_vec = self._draws(rng, 2 * m)
        b_vec = b_vec.at[:, m].set(sf.zeros((B,)))
        s_vec = s_vec.at[:, m].set(sf.zeros((B,)))
        c_A_0 = self._commit_rows(a_0[:, None], r_0[:, None], m)
        cA0_l, cA0_b = self._enc(c_A_0)
        cb_k = self._commit_pc(b_vec, s_vec)
        cbk_l, cbk_b = self._enc(cb_k)

        kind, rho = reenc_base
        if kind == "commit":
            neg_rho, gh0, gh1 = rho
            tau_vec = self._draws(rng, 2 * m)
            tau_vec = tau_vec.at[:, m].set(neg_rho)

        # E_k rows: coeffs over [row-major outputs | base points]
        # E_k = sum_i <a_{i+k-m+1}, row_i> + reenc_k
        a_full = jnp.concatenate([a_0[:, None], a_rows], axis=1)  # [B,m+1,n]
        coeff = jnp.zeros((B, 2 * m, N, sf.NLIMBS), jnp.int32)
        for k_ in range(2 * m):
            for i_ in range(m):
                j_ = i_ + k_ - m + 1
                if 0 <= j_ <= m:
                    coeff = coeff.at[:, k_, i_ * n:(i_ + 1) * n].set(
                        a_full[:, j_])
        zero2 = sf.zeros((B, 2 * m, 1))

        def bc(basis, k):
            return pt.ExtPoint(*(jnp.broadcast_to(
                c[None, None], (B, k) + c.shape) for c in basis))

        if kind == "pk":
            # E0_k over g-rows + b_k*base_g ; E1_k over h-rows + b_k*base_h
            c0 = jnp.concatenate([coeff, b_vec[:, :, None], zero2], axis=2)
            c1 = c0
            p0 = pt.ExtPoint(*(jnp.concatenate(
                [jnp.broadcast_to(g[:, None], (B, 2 * m) + g.shape[1:]),
                 b0, b0], axis=2)
                for g, b0 in zip(pts0, bc(self._base_g, 2 * m))))
            p1 = pt.ExtPoint(*(jnp.concatenate(
                [jnp.broadcast_to(h[:, None], (B, 2 * m) + h.shape[1:]),
                 b1, b1], axis=2)
                for h, b1 in zip(pts1, bc(self._base_h, 2 * m))))
        else:
            # E0_k over c-rows + tau_k*G_pkGH ;
            # E1_k over d-rows + b_k*BASE + tau_k*H_pkGH
            c0 = jnp.concatenate([coeff, tau_vec[:, :, None], zero2], axis=2)
            c1 = jnp.concatenate([coeff, b_vec[:, :, None],
                                  tau_vec[:, :, None]], axis=2)

            def lane_pt(p, k):
                return pt.ExtPoint(*(jnp.broadcast_to(
                    c[:, None, None], (B, k, 1) + c.shape[1:]) for c in p))

            p0 = pt.ExtPoint(*(jnp.concatenate(
                [jnp.broadcast_to(g[:, None], (B, 2 * m) + g.shape[1:]),
                 gg, gg], axis=2)
                for g, gg in zip(pts0, lane_pt(gh0, 2 * m))))
            p1 = pt.ExtPoint(*(jnp.concatenate(
                [jnp.broadcast_to(h[:, None], (B, 2 * m) + h.shape[1:]),
                 bb, hh], axis=2)
                for h, bb, hh in zip(pts1, bc(self._basepoint, 2 * m),
                                     lane_pt(gh1, 2 * m))))
        ek = self._rows_msm(
            jnp.concatenate([c0, c1], axis=1),
            pt.ExtPoint(*(jnp.concatenate([a, b], axis=1)
                          for a, b in zip(p0, p1))))
        ek_l, ek_b = self._enc(ek)                   # [B, 4m, 32]
        E0_b, E1_b = ek_b[:, :2 * m], ek_b[:, 2 * m:]

        dt.append_point_var(b"A0Commitment", cA0_b[:, 0])
        for k_ in range(2 * m):
            dt.append_point_var(b"BKCommitment", cbk_b[:, k_])
            dt.append_point_var(b"EK0Commitment", E0_b[:, k_])
            dt.append_point_var(b"EK1Commitment", E1_b[:, k_])
        mx = sf.from_bytes_wide(dt.get_challenge_bytes(b"xchallenege"))
        x_exp = sf.powers(mx, 2 * m)                # x^0..x^{2m-1}
        # challenge response (multiexponential.py:100-112): note the
        # reference indexes as_columns()[i] over ROWS (square matrices)
        cols = jnp.moveaxis(a_rows, 2, 1)           # [B, n(col), m(row)]
        ax = _tree_sum2(sf.mul(cols, x_exp[:, None, 1:m + 1]), 2)
        a_out = sf.add(ax, a_0)                     # [B, n]
        r_out = sf.add(r_0, _tree_sum2(
            sf.mul(s_blind, x_exp[:, 1:m + 1]), 1))
        b_out = _tree_sum2(sf.mul(b_vec, x_exp), 1)
        s_out = _tree_sum2(sf.mul(s_vec, x_exp), 1)
        if kind == "commit":
            t_out = _tree_sum2(sf.mul(tau_vec, x_exp), 1)
        else:
            t_out = sf.zeros((B,))
        pts_out = [cA0_b, cbk_b, E0_b, E1_b]
        scal_out = [sf.to_bytes_array(a_out),
                    sf.to_bytes_array(jnp.stack(
                        [r_out, b_out, s_out, t_out], axis=1))]
        return pts_out, scal_out

    # --------------------------------------------------------------- host

    def _out_layout(self):
        """Named slices of the packed (points, scalars) outputs, matching
        the concatenation order in _build."""
        m, n = self.m, self.m
        P, S = {}, {}
        po = so = 0

        def tp(name, k):
            nonlocal po
            P[name] = (po, po + k)
            po += k

        def ts(name, k):
            nonlocal so
            S[name] = (so, so + k)
            so += k

        tp("c_A", m); tp("c_tau", m); tp("c_B", m); tp("c_B_dash", m)
        tp("had0", 3); tp("had_delta", m + 1)
        ts("omega", m); ts("had_a_bar", n); ts("had_b_bar", n)
        ts("had_c_bar", n); ts("had_blind", 4)
        tp("cb", 1); tp("mh_cB", m)
        tp("zero_head", 2); tp("zero_cD", 2 * m + 1)
        ts("zero_a", n); ts("zero_b", n); ts("zero_blind", 3)
        tp("svp_d", 1); tp("svp_deltas", 2)
        ts("svp_a", n); ts("svp_b", n); ts("svp_blind", 3)
        tp("ddh_dash", 2)
        ts("ddh", 2)
        tp("mepk_A0", 1); tp("mepk_cBk", 2 * m)
        tp("mepk_Ek0", 2 * m); tp("mepk_Ek1", 2 * m)
        ts("mepk_a", m); ts("mepk_rbst", 4)
        tp("mec_A0", 1); tp("mec_cBk", 2 * m)
        tp("mec_Ek0", 2 * m); tp("mec_Ek1", 2 * m)
        ts("mec_a", m); ts("mec_rbst", 4)
        tp("_zs_tail", m - 1)
        return P, S, po, so

    def _pack_prove(self, shuffles: Sequence, rngs: Sequence,
                    transcripts: Optional[Sequence] = None):
        """Host-side packing shared by prove / prove_sharded / warmup:
        consumes each lane's rng in the host prover's exact draw order and
        returns the jit input arrays plus the static transcript frame."""
        from ..accounts.transcript import Transcript
        from ..accounts.prover import Prover as HostProver

        m, N, B = self.m, self.N, self.batch
        if len(shuffles) != B or len(rngs) != B:
            raise ValueError("lane count mismatch")
        perm = np.zeros((B, N), np.int32)
        tau_b = np.zeros((B, N, 32), np.uint8)
        rho_b = np.zeros((B, 32), np.uint8)
        r_b = np.zeros((B, m, 32), np.uint8)
        ent = np.zeros((B, self.N_ENTROPY, 32), np.uint8)
        acc_in = np.zeros((B, 4 * N, 32), np.uint8)
        acc_out = np.zeros((B, 4 * N, 32), np.uint8)
        for i, sh in enumerate(shuffles):
            if len(sh.inputs) != N:
                raise ValueError("anonymity set size mismatch")
            perm[i] = sh.pi.get_row_major()
            for j, t in enumerate(sh.shuffled_tau):
                tau_b[i, j] = np.frombuffer(ex.sc_to_bytes(t % L), np.uint8)
            rho_b[i] = np.frombuffer(ex.sc_to_bytes(sh.rho % L), np.uint8)
            # host draw order (shuffle.py:194 + each prove_rekey's
            # _entropy): r x m, then 9 x 32-byte entropies
            for j in range(m):
                r_b[i, j] = np.frombuffer(
                    ex.sc_to_bytes(rngs[i].random_scalar()), np.uint8)
            for j in range(self.N_ENTROPY):
                ent[i, j] = np.frombuffer(rngs[i].fill_bytes(32), np.uint8)
            for j, a in enumerate(sh.inputs):
                acc_in[i, j] = np.frombuffer(a.pk.gr, np.uint8)
                acc_in[i, N + j] = np.frombuffer(a.pk.grsk, np.uint8)
                acc_in[i, 2 * N + j] = np.frombuffer(a.comm.c, np.uint8)
                acc_in[i, 3 * N + j] = np.frombuffer(a.comm.d, np.uint8)
            for j, a in enumerate(sh.outputs):
                acc_out[i, j] = np.frombuffer(a.pk.gr, np.uint8)
                acc_out[i, N + j] = np.frombuffer(a.pk.grsk, np.uint8)
                acc_out[i, 2 * N + j] = np.frombuffer(a.comm.c, np.uint8)
                acc_out[i, 3 * N + j] = np.frombuffer(a.comm.d, np.uint8)
        if transcripts is None:
            transcripts = []
            for _ in range(B):
                t = Transcript(self.transcript_label)
                HostProver(self.proof_label, t)  # appends the dom-sep
                transcripts.append(t)
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        if any(s[1:] != frame for s in snaps):
            raise ValueError("lane transcripts diverged in framing")
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        arrays = (perm, tau_b.astype(np.int32), rho_b.astype(np.int32),
                  r_b.astype(np.int32), ent.astype(np.int32),
                  acc_in.astype(np.int32), acc_out.astype(np.int32),
                  states)
        return arrays, frame

    def prove(self, shuffles: Sequence, rngs: Sequence,
              transcripts: Optional[Sequence] = None):
        """Returns [(ShuffleProof, ShuffleStatement)] x B, byte-identical
        to the host prover under the same per-lane RNG streams."""
        arrays, frame = self._pack_prove(shuffles, rngs, transcripts)
        pts_b, scal_b, ok = self._prove_jit(
            *(jnp.asarray(a) for a in arrays), frame)
        if not bool(jnp.all(ok)):
            raise ValueError("invalid account point in shuffle prover input")
        return self._decode(np.asarray(pts_b).astype(np.uint8),
                            np.asarray(scal_b).astype(np.uint8))

    def prove_sharded(self, shuffles: Sequence, rngs: Sequence, mesh,
                      transcripts: Optional[Sequence] = None):
        """prove() with the lane (batch) axis sharded over `mesh`.

        Proof generation is embarrassingly parallel across lanes
        (BASELINE config 5 at multi-chip scale): each device runs the full
        one-program prover on its lane slice; there are no collectives —
        outputs stay lane-sharded and are gathered at fetch. Byte-identical
        to prove() (virtual-mesh identity test:
        tests/test_sharded_prove.py)."""
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ndev = mesh.devices.size
        if self.batch % ndev:
            raise ValueError(f"batch {self.batch} not divisible by "
                             f"{ndev} devices")
        arrays, frame = self._pack_prove(shuffles, rngs, transcripts)
        axis = mesh.axis_names[0]
        spec = P(axis)

        @partial(shard_map, mesh=mesh, in_specs=(spec,) * len(arrays),
                 out_specs=spec)
        def run(*args):
            return self._build(*args, frame)

        prev_pallas = self._use_pallas
        self._use_pallas = False     # captured at trace time below
        try:
            # jit the shard_map: an eager shard_map call runs the body
            # op-by-op per shard (measured 838 s for the range prover on
            # the virtual mesh) and never reaches the persistent cache
            pts_b, scal_b, ok = jax.jit(run)(
                *(jnp.asarray(a) for a in arrays))
        finally:
            self._use_pallas = prev_pallas
        if not bool(jnp.all(ok)):
            raise ValueError("invalid account point in shuffle prover input")
        return self._decode(np.asarray(pts_b).astype(np.uint8),
                            np.asarray(scal_b).astype(np.uint8))

    def warmup(self, transcripts: Optional[Sequence] = None) -> None:
        """Compile (or load from the persistent cache) this shape bucket's
        prover program without a real batch: zero-filled witnesses and
        identity-encoded accounts drive the identical program (the lane
        verdicts are discarded)."""
        from ..accounts.transcript import Transcript
        from ..accounts.prover import Prover as HostProver

        m, N, B = self.m, self.N, self.batch
        if transcripts is None:
            transcripts = []
            for _ in range(B):
                t = Transcript(self.transcript_label)
                HostProver(self.proof_label, t)
                transcripts.append(t)
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        frame = snaps[0][1:]
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        # zero bytes decode as the identity point and the zero scalar;
        # permutation rows of 1s keep take_along_axis indices in range
        arrays = (np.ones((B, N), np.int32),
                  np.zeros((B, N, 32), np.int32),
                  np.zeros((B, 32), np.int32),
                  np.zeros((B, m, 32), np.int32),
                  np.zeros((B, self.N_ENTROPY, 32), np.int32),
                  np.zeros((B, 4 * N, 32), np.int32),
                  np.zeros((B, 4 * N, 32), np.int32),
                  states)
        pts_b, _scal, _ok = self._prove_jit(
            *(jnp.asarray(a) for a in arrays), frame)
        np.asarray(pts_b)   # force execution through the axon tunnel

    def _decode(self, pts_np: np.ndarray, scal_np: np.ndarray):
        """Decode the jit outputs into [(ShuffleProof, ShuffleStatement)]."""
        from .shuffle import ShuffleProof, ShuffleStatement
        from .hadamard import HadamardProof, HadamardStatement
        from .product import (MultiHadamardProof, MultiHadamardStatement,
                              ProductProof, ProductStatement, ZeroProof,
                              ZeroStatement)
        from .singlevalueproduct import SVPProof, SVPStatement
        from .multiexponential import MultiexpoProof
        from .ddh import DDHProof, DDHStatement

        m, B = self.m, self.batch
        P, S, npts, nsc = self._out_layout()
        assert pts_np.shape[1] == npts and scal_np.shape[1] == nsc

        def pb(i, name):
            a, b_ = P[name]
            return [bytes(pts_np[i, j]) for j in range(a, b_)]

        def sc(i, name):
            a, b_ = S[name]
            return [int.from_bytes(bytes(scal_np[i, j]), "little")
                    for j in range(a, b_)]

        out = []
        for i in range(B):
            had_blind = sc(i, "had_blind")
            hp = HadamardProof(*pb(i, "had0"), pb(i, "had_delta"),
                               sc(i, "had_a_bar"), sc(i, "had_b_bar"),
                               sc(i, "had_c_bar"), *had_blind)
            hs = HadamardStatement(sc(i, "omega"))
            zb = sc(i, "zero_blind")
            zp = ZeroProof(*pb(i, "zero_head"), pb(i, "zero_cD"),
                           sc(i, "zero_a"), sc(i, "zero_b"), *zb)
            mh_cB = pb(i, "mh_cB")
            cb_enc = pb(i, "cb")[0]
            # ZeroStatement cA = c_prod_A[1:m] + [com(-1,0)]; c_prod_A[i]
            # equals mh_cB[0] for i=0 — the verifier reconstructs them as
            # c_E; the statement carries the prover-side encodings
            c_minus_one = ex.ristretto_encode(
                vector_pedersen_gens(m + 1).commit([(-1) % L] * m, 0))
            zs = ZeroStatement(self._prod_A_tail(i, pts_np, P)
                               + [c_minus_one])
            mhp = MultiHadamardProof(mh_cB, zp)
            mhs = MultiHadamardStatement(cb_enc, zs)
            svb = sc(i, "svp_blind")
            svp = SVPProof(pb(i, "svp_d")[0], *pb(i, "svp_deltas"),
                           sc(i, "svp_a"), sc(i, "svp_b"),
                           svb[0], svb[1])
            svs = SVPStatement(cb_enc, svb[2])
            ddh_sc = sc(i, "ddh")
            ddh_p = DDHProof(ddh_sc[0], ddh_sc[1])
            ddh_s = DDHStatement(*pb(i, "ddh_dash"))
            mepk_rbst = sc(i, "mepk_rbst")
            mepk = MultiexpoProof(
                pb(i, "mepk_A0")[0], pb(i, "mepk_cBk"),
                pb(i, "mepk_Ek0"), pb(i, "mepk_Ek1"),
                sc(i, "mepk_a"), mepk_rbst[0], mepk_rbst[1],
                mepk_rbst[2], 0)
            mec_rbst = sc(i, "mec_rbst")
            mec = MultiexpoProof(
                pb(i, "mec_A0")[0], pb(i, "mec_cBk"),
                pb(i, "mec_Ek0"), pb(i, "mec_Ek1"),
                sc(i, "mec_a"), mec_rbst[0], mec_rbst[1],
                mec_rbst[2], mec_rbst[3])
            proof = ShuffleProof(pb(i, "c_A"), pb(i, "c_tau"),
                                 pb(i, "c_B"), pb(i, "c_B_dash"),
                                 hp, ProductProof(mhp, svp), mepk, mec,
                                 ddh_p)
            stmt = ShuffleStatement(hs, ProductStatement(mhs, svs), ddh_s)
            out.append((proof, stmt))
        return out

    def _prod_A_tail(self, i, pts_np, P):
        """c_prod_A[1:m] encodings for the ZeroStatement.

        The device packs c_prod_A[0] into mh_cB[0]; the tail rows are the
        `_zs_tail` slice appended by _build (after mh_cB)."""
        a, b_ = P["_zs_tail"]
        return [bytes(pts_np[i, j]) for j in range(a, b_)]


# ---------------------------------------------------------------------------
# production dispatch: shape-bucketed prover instances
# ---------------------------------------------------------------------------

_PROVER_CACHE: dict = {}


def get_device_shuffle_prover(m: int, batch: int,
                              proof_label: bytes = b"Shuffle",
                              transcript_label: bytes = b"ShuffleProof"
                              ) -> DeviceShuffleProver:
    """Process-wide cache of compiled prover instances, keyed by shape.

    A fresh DeviceShuffleProver re-traces (and, without a persistent-cache
    hit, re-compiles) its one-program prover; every production call site
    must reuse instances through this getter."""
    key = (m, batch, bytes(proof_label), bytes(transcript_label))
    p = _PROVER_CACHE.get(key)
    if p is None:
        p = _PROVER_CACHE.setdefault(
            key, DeviceShuffleProver(m, batch, proof_label, transcript_label))
    return p
