"""Final narrowing: constant-vs-input static generators in the MSM concat.
(scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
print("backend:", jax.default_backend(), flush=True)

from quisquis_tpu.ops import exact as ex, field as fe, point as pt
from quisquis_tpu.ops import msm as qmsm
from quisquis_tpu.bulletproofs.device_verify import (DeviceRangeVerifier,
                                                     _ext_concat)

B, P, nm = 256, 17, 64
N_flat = B * P
N_total = 2 + 2 * nm + N_flat

rng = np.random.default_rng(7)
sc = np.zeros((N_total, 32), dtype=np.uint8)
for i in range(N_total):
    sc[i] = np.frombuffer(ex.sc_to_bytes(int(rng.integers(1, 2**63))), np.uint8)
nib_all = jnp.asarray(pt.scalar_to_nibbles(sc).astype(np.int32))
nib_flat = nib_all[:N_flat]

drv = DeviceRangeVerifier(64, 1, B)
static = drv._static          # numpy-backed constant ExtPoint [130]
static_dev = pt.ExtPoint(*(jnp.asarray(np.asarray(c)) for c in static))

flat_in = pt.from_exact_batch(
    [ex.pt_mul(2 + (i % 97), ex.BASEPOINT) for i in range(N_flat)])
whole_in = pt.ExtPoint(*(jnp.concatenate([jnp.asarray(np.asarray(s)), f], 0)
                         for s, f in zip(static_dev, flat_in)))


def timeit(name, f, *a):
    t0 = time.time(); r = f(*a); jax.block_until_ready(r)
    tc = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); r = f(*a); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} compile {tc:6.1f}s steady {best*1e3:8.1f} ms",
          flush=True)


@jax.jit
def M1(nib, px, py, pz, ptc):          # pure inputs, no concat
    return qmsm.msm_raw(nib, pt.ExtPoint(px, py, pz, ptc))

@jax.jit
def M2(nib, px, py, pz, ptc):          # concat with CAPTURED CONSTANT static
    allp = _ext_concat([static, pt.ExtPoint(px, py, pz, ptc)])
    return qmsm.msm_raw(nib, allp)

@jax.jit
def M3(nib, sx, sy, sz, st, px, py, pz, ptc):   # concat with INPUT static
    allp = _ext_concat([pt.ExtPoint(sx, sy, sz, st),
                        pt.ExtPoint(px, py, pz, ptc)])
    return qmsm.msm_raw(nib, allp)

timeit("M1: whole-array input, no concat", M1, nib_all,
       whole_in.x, whole_in.y, whole_in.z, whole_in.t)
timeit("M2: concat(const static, input flat)", M2, nib_all,
       flat_in.x, flat_in.y, flat_in.z, flat_in.t)
timeit("M3: concat(input static, input flat)", M3, nib_all,
       *(jnp.asarray(np.asarray(c)) for c in static),
       flat_in.x, flat_in.y, flat_in.z, flat_in.t)
