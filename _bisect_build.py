"""Bisect DeviceRangeVerifier._build: jit progressively larger prefixes and
time each to find where the 283 ms hides. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
print("backend:", jax.default_backend(), flush=True)

from quisquis_tpu.ops import exact as ex, field as fe, point as pt
from quisquis_tpu.ops import msm as qmsm, scalar_field as sf
from quisquis_tpu.ops.device_strobe import (DeviceStrobe, DeviceTranscript,
                                            snapshot_host_strobe)
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs import device_verify as dv
from quisquis_tpu.bulletproofs.device_verify import (DeviceRangeVerifier,
                                                     _decompress_u8,
                                                     _sf_tree_sum,
                                                     _sf_tree_prod,
                                                     _to_nibbles, _ext_concat,
                                                     _msm_jit)

n_bits, m, B = 64, 1, 256
drv = DeviceRangeVerifier(n_bits, m, B)
rng2 = SeededRng(seed=b"prof")
from quisquis_tpu.bulletproofs.range_proof import RangeProof
proof, V = RangeProof.prove_multiple(Transcript(b"RangeProof"), [5],
                                     [rng2.random_scalar()], n_bits, rng=rng2)
comp, scal, states, frame = drv._pack([proof] * B, [V] * B, None)
weights = np.frombuffer(SeededRng(seed=b"w").fill_bytes(B * 2 * 64),
                        np.uint8).reshape(B, 2, 64).astype(np.int32)
cj, sj, wj, stj = (jnp.asarray(a) for a in (comp, scal, weights, states))


def build_prefix(stop):
    def fn(comp, scal, weights, states):
        self = drv
        n, m, nm, k = self.n, self.m, self.nm, self.k
        B_ = comp.shape[0]
        ok_pts, pts = _decompress_u8(comp)
        all_ok = jnp.all(ok_pts)
        if stop == "decompress":
            return all_ok
        t_x = sf.from_bytes(scal[:, 0])
        t_x_b = sf.from_bytes(scal[:, 1])
        e_b = sf.from_bytes(scal[:, 2])
        ipp_a = sf.from_bytes(scal[:, 3])
        ipp_b = sf.from_bytes(scal[:, 4])
        w1 = sf.from_bytes_wide(weights[:, 0])
        w2 = sf.from_bytes_wide(weights[:, 1])
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
        dt.append_message(b"dom-sep", b"ipp v1")
        dt.append_u64(b"n", nm)
        u = []
        for j in range(k):
            dt.append_message(b"L", comp[:, m + 4 + j], 32)
            dt.append_message(b"R", comp[:, m + 4 + k + j], 32)
            u.append(sf.from_bytes_wide(dt.get_challenge_bytes(b"u")))
        u = jnp.stack(u, axis=-2)
        if stop == "transcript":
            return all_ok, y, z, x, w, u, w1, w2
        y_pows = sf.powers(y, nm)
        y_inv = sf.invert(y)
        h_fact = sf.powers(y_inv, nm)
        z_pows = sf.powers(z, m + 3)
        z2 = z_pows[..., 2, :]
        two_pows = jnp.asarray(sf.from_int_batch([1 << i for i in range(n)]))
        zeta = sf.mul(z_pows[..., 2:2 + m, :][..., :, None, :],
                      two_pows[None, None, :, :]).reshape((B_, nm, sf.NLIMBS))
        sum_y = _sf_tree_sum(y_pows)
        sum_2m = sf.const((1 << n) - 1, (B_,))
        zj3 = z_pows[..., 3:3 + m, :]
        sum_z3 = _sf_tree_sum(zj3)
        delta = sf.sub(sf.mul(sf.sub(z, z2), sum_y), sf.mul(sum_z3, sum_2m))
        u_inv = sf.batch_invert_rows(u)
        u_sq = sf.mul(u, u)
        u_inv_sq = sf.mul(u_inv, u_inv)
        s0 = _sf_tree_prod(u_inv)
        s_vec = jnp.broadcast_to(s0[:, None, :], (B_, nm, sf.NLIMBS))
        for j in range(k):
            bit = (np.arange(nm) >> (k - 1 - j)) & 1
            mult = jnp.where(jnp.asarray(bit[None, :, None] == 1),
                             u_sq[:, j, None, :], sf.one((B_, nm)))
            s_vec = sf.mul(s_vec, mult)
        s_inv_vec = s_vec[:, ::-1, :]
        c1_B = sf.mul(w1, sf.sub(t_x, delta))
        c1_Bb = sf.mul(w1, t_x_b)
        c1_V = sf.neg(sf.mul(w1[:, None, :], z_pows[..., 2:2 + m, :]))
        c1_T1 = sf.neg(sf.mul(w1, x))
        c1_T2 = sf.neg(sf.mul(w1, sf.mul(x, x)))
        c2_A = w2
        c2_S = sf.mul(w2, x)
        c2_Bb = sf.neg(sf.mul(w2, e_b))
        ab = sf.mul(ipp_a, ipp_b)
        c2_B = sf.mul(w2, sf.mul(w, sf.sub(t_x, ab)))
        zb = jnp.broadcast_to(z[:, None, :], (B_, nm, sf.NLIMBS))
        c2_G = sf.neg(sf.add(zb, sf.mul(ipp_a[:, None, :], s_vec)))
        h_scal = sf.mul(sf.add(sf.mul(zb, y_pows), zeta), h_fact)
        c2_H = sf.sub(h_scal,
                      sf.mul(sf.mul(ipp_b[:, None, :], s_inv_vec), h_fact))
        c2_G = sf.mul(w2[:, None, :], c2_G)
        c2_H = sf.mul(w2[:, None, :], c2_H)
        c2_L = sf.mul(w2[:, None, :], u_sq)
        c2_R = sf.mul(w2[:, None, :], u_inv_sq)
        st_B = sf.add(c1_B, c2_B)
        st_Bb = sf.add(c1_Bb, c2_Bb)
        static_scal = jnp.concatenate([
            st_B[:, None, :], st_Bb[:, None, :], c2_G, c2_H], axis=1)
        static_total = _sf_tree_sum(jnp.moveaxis(static_scal, 0, 1))
        dyn_scal = jnp.concatenate([
            c1_V, c2_A[:, None, :], c2_S[:, None, :],
            c1_T1[:, None, :], c1_T2[:, None, :], c2_L, c2_R], axis=1)
        if stop == "scalars":
            return all_ok, static_total, dyn_scal
        all_scal = jnp.concatenate(
            [static_total, dyn_scal.reshape((-1, sf.NLIMBS))], axis=0)
        nib = _to_nibbles(all_scal)
        if stop == "nibbles":
            return all_ok, nib
        flat_pts = pt.ExtPoint(*(c.reshape((-1, fe.NLIMBS)) for c in pts))
        all_pts = _ext_concat([drv._static, flat_pts])
        total = _msm_jit(nib, all_pts)
        return jnp.logical_and(all_ok, pt.is_identity_raw(total))
    return jax.jit(fn)


for stop in ["decompress", "transcript", "scalars", "nibbles", "full"]:
    f = build_prefix(stop)
    t0 = time.time()
    r = f(cj, sj, wj, stj)
    jax.block_until_ready(r)
    tc = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(cj, sj, wj, stj)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{stop:12s} compile {tc:6.1f}s   steady {best*1e3:8.1f} ms",
          flush=True)
