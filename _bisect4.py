"""Test: does an optimization_barrier at the nibbles/points -> MSM seam fix
the one-program range verifier? Plus XLA cost analysis of slow vs fast. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
print("backend:", jax.default_backend(), flush=True)

from quisquis_tpu.ops import exact as ex, field as fe, point as pt
from quisquis_tpu.ops import msm as qmsm, scalar_field as sf
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs.range_proof import RangeProof
from quisquis_tpu.bulletproofs import device_verify as dvmod
from quisquis_tpu.bulletproofs.device_verify import (DeviceRangeVerifier,
                                                     _ext_concat)

n_bits, m, B = 64, 1, 256
drv = DeviceRangeVerifier(n_bits, m, B)
rng2 = SeededRng(seed=b"prof")
proof, V = RangeProof.prove_multiple(Transcript(b"RangeProof"), [5],
                                     [rng2.random_scalar()], n_bits, rng=rng2)
comp, scal, states, frame = drv._pack([proof] * B, [V] * B, None)
weights = np.frombuffer(SeededRng(seed=b"w").fill_bytes(B * 2 * 64),
                        np.uint8).reshape(B, 2, 64).astype(np.int32)
cj, sj, wj, stj = (jnp.asarray(a) for a in (comp, scal, weights, states))


def timeit(name, f, *a):
    t0 = time.time(); r = f(*a); jax.block_until_ready(r)
    tc = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); r = f(*a); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} compile {tc:6.1f}s steady {best*1e3:8.1f} ms",
          flush=True)
    return r


# monkeypatch a barrier into _build by wrapping msm inputs
orig_msm = dvmod._msm_jit

def barrier_msm(nib, pts):
    nib, px, py, pz, ptt = jax.lax.optimization_barrier(
        (nib, pts.x, pts.y, pts.z, pts.t))
    return orig_msm(nib, pt.ExtPoint(px, py, pz, ptt))

dvmod._msm_jit = barrier_msm
f_barrier = jax.jit(lambda c, s, w, st: drv._build(c, s, w, st, frame))
timeit("FULL with barrier at MSM seam", f_barrier, cj, sj, wj, stj)
dvmod._msm_jit = orig_msm
