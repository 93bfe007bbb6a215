"""4-combo factorial: (nibbles input vs computed) x (numpy vs device args),
plus XLA cost_analysis, to pin the 600x MSM anomaly. (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
print("backend:", jax.default_backend(), flush=True)

from quisquis_tpu.ops import exact as ex, field as fe, point as pt
from quisquis_tpu.ops import msm as qmsm, scalar_field as sf

N = 4482
rng = np.random.default_rng(7)
sc = np.zeros((N, 32), dtype=np.uint8)
for i in range(N):
    sc[i] = np.frombuffer(ex.sc_to_bytes(int(rng.integers(1, 2**63))), np.uint8)
pts_np = pt.from_exact_batch([ex.pt_mul(2 + (i % 97), ex.BASEPOINT)
                              for i in range(N)])  # numpy coords
pts_dev = pt.ExtPoint(*(jnp.asarray(np.asarray(c)) for c in pts_np))
limbs_np = np.stack([np.asarray(sf.from_int(int.from_bytes(bytes(sc[i]),
                                                           "little")))
                     for i in range(N)])
limbs_dev = jnp.asarray(limbs_np)
nib_np = pt.scalar_to_nibbles(sc).astype(np.int32)
nib_dev = jnp.asarray(nib_np)


def timeit(name, f, *a):
    t0 = time.time(); r = f(*a); jax.block_until_ready(r)
    tc = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); r = f(*a); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    try:
        ca = f.lower(*a).compile().cost_analysis()
        fl = ca.get("flops", -1) if isinstance(ca, dict) else ca[0].get("flops", -1)
    except Exception as e:
        fl = f"err {e}"
    print(f"{name:40s} compile {tc:6.1f}s steady {best*1e3:8.1f} ms flops={fl}",
          flush=True)


def msm_from_limbs(sl, px, py, pz, ptt):
    nib = sf.to_nibbles(sl)
    return qmsm.msm_raw(nib, pt.ExtPoint(px, py, pz, ptt))

def msm_from_nib(nib, px, py, pz, ptt):
    return qmsm.msm_raw(nib, pt.ExtPoint(px, py, pz, ptt))

fL = jax.jit(msm_from_limbs)
fN = jax.jit(msm_from_nib)

timeit("limbs dev args", fL, limbs_dev, pts_dev.x, pts_dev.y, pts_dev.z, pts_dev.t)
timeit("limbs np args", fL, limbs_np, *(np.asarray(c) for c in pts_np))
timeit("nib dev args", fN, nib_dev, pts_dev.x, pts_dev.y, pts_dev.z, pts_dev.t)
timeit("nib np args", fN, nib_np, *(np.asarray(c) for c in pts_np))

# exact replica of profiler stage M: ExtPoint passed as one pytree arg
def stage_M(sl, p):
    nib = sf.to_nibbles(sl)
    return qmsm.msm_raw(nib, p)
fS = jax.jit(stage_M)
timeit("stageM replica (limbs dev, pts np tree)", fS, limbs_dev, pts_np)
