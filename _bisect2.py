"""Isolate the MSM pathology: which input chain makes the combined program
slow — decompressed points, or transcript-derived nibbles? (scratch)"""
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
from quisquis_tpu.bulletproofs.device_verify import (DeviceRangeVerifier,
                                                     _decompress_u8,
                                                     _to_nibbles, _ext_concat)

n_bits, m, B = 64, 1, 256
drv = DeviceRangeVerifier(n_bits, m, B)
rng2 = SeededRng(seed=b"prof")
proof, V = RangeProof.prove_multiple(Transcript(b"RangeProof"), [5],
                                     [rng2.random_scalar()], n_bits, rng=rng2)
comp, scal, states, frame = drv._pack([proof] * B, [V] * B, None)
cj = jnp.asarray(comp)
P = comp.shape[1]
N_total = 2 + 2 * drv.nm + B * P

rng = np.random.default_rng(7)
sc = np.zeros((N_total, 32), dtype=np.uint8)
for i in range(N_total):
    sc[i] = np.frombuffer(ex.sc_to_bytes(int(rng.integers(1, 2**63))), np.uint8)
nib_in = jnp.asarray(pt.scalar_to_nibbles(sc).astype(np.int32))


def timeit(name, f, *a):
    t0 = time.time()
    r = f(*a)
    jax.block_until_ready(r)
    tc = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*a)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} compile {tc:6.1f}s steady {best*1e3:8.1f} ms",
          flush=True)


# A: decompress -> concat -> MSM, nibbles from INPUT
@jax.jit
def variantA(comp_, nib_):
    ok, pts = _decompress_u8(comp_)
    flat = pt.ExtPoint(*(c.reshape((-1, fe.NLIMBS)) for c in pts))
    allp = _ext_concat([drv._static, flat])
    tot = qmsm.msm_raw(nib_, allp)
    return jnp.logical_and(jnp.all(ok), pt.is_identity_raw(tot))

timeit("A: decompress->MSM (input nibbles)", variantA, cj, nib_in)

# A2: same but points also from input (no decompress), nibbles from input
flatpts_in = pt.from_exact_batch(
    [ex.pt_mul(2 + (i % 97), ex.BASEPOINT) for i in range(B * P)])

@jax.jit
def variantA2(nib_, px, py, pz, ptc):
    allp = _ext_concat([drv._static, pt.ExtPoint(px, py, pz, ptc)])
    tot = qmsm.msm_raw(nib_, allp)
    return pt.is_identity_raw(tot)

timeit("A2: input points + static concat -> MSM", variantA2, nib_in,
       flatpts_in.x, flatpts_in.y, flatpts_in.z, flatpts_in.t)
