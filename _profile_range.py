"""Stage-ablation timing for DeviceRangeVerifier on the real chip (scratch).

Times three sub-programs at the production shape (n=64, m=1, B=256):
  T: decompress + batched STROBE transcript replay -> challenge bytes
  S: scalar verification work (powers, inversions, s-vector)
  M: the single combined MSM
so the steady-state 530 ms can be attributed to a stage.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
print("backend:", jax.default_backend(), flush=True)

from quisquis_tpu.ops import exact as ex, field as fe, point as pt
from quisquis_tpu.ops import msm as qmsm, scalar_field as sf
from quisquis_tpu.ops.device_strobe import (DeviceStrobe, DeviceTranscript,
                                            snapshot_host_strobe)
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs.device_verify import (DeviceRangeVerifier,
                                                     _decompress_u8_impl,
                                                     _to_nibbles)

n_bits, m, B = 64, 1, 256
if len(sys.argv) > 1:
    B = int(sys.argv[1])
nm = n_bits * m
k = nm.bit_length() - 1
P = m + 4 + 2 * k

rng = np.random.default_rng(7)
# random valid point encodings: compress random small multiples of basepoint
pts_host = [ex.ristretto_encode(ex.pt_mul(3 + i, ex.BASEPOINT))
            for i in range(P)]
comp = np.stack([np.stack([np.frombuffer(b, np.uint8) for b in pts_host])
                 for _ in range(B)]).astype(np.int32)
tr = Transcript(b"RangeProof")
snap = snapshot_host_strobe(tr.strobe)
frame = snap[1:]
states = np.stack([np.frombuffer(snap[0], np.uint8)
                   for _ in range(B)]).astype(np.int32)


def timeit(name, fn, *args):
    r = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.1f} ms", flush=True)
    return r


# ---- stage T: decompress + transcript replay ----
def stage_T(comp_, states_):
    ok, p = _decompress_u8_impl(comp_)
    dt = object.__new__(DeviceTranscript)
    dt.strobe = DeviceStrobe.from_host_states(states_, *frame)
    dt.append_message(b"dom-sep", b"rangeproof v1")
    dt.append_u64(b"n", n_bits)
    dt.append_u64(b"m", m)
    for j in range(m):
        dt.append_message(b"V", comp_[:, j], 32)
    dt.append_message(b"A", comp_[:, m], 32)
    dt.append_message(b"S", comp_[:, m + 1], 32)
    y = sf.from_bytes_wide(dt.get_challenge_bytes(b"y"))
    z = sf.from_bytes_wide(dt.get_challenge_bytes(b"z"))
    dt.append_message(b"T_1", comp_[:, m + 2], 32)
    dt.append_message(b"T_2", comp_[:, m + 3], 32)
    x = sf.from_bytes_wide(dt.get_challenge_bytes(b"x"))
    dt.append_message(b"dom-sep", b"ipp v1")
    dt.append_u64(b"n", nm)
    u = []
    for j in range(k):
        dt.append_message(b"L", comp_[:, m + 4 + j], 32)
        dt.append_message(b"R", comp_[:, m + 4 + k + j], 32)
        u.append(sf.from_bytes_wide(dt.get_challenge_bytes(b"u")))
    return ok, y, z, x, jnp.stack(u, axis=-2)


# decompress only
def stage_D(comp_):
    return _decompress_u8_impl(comp_)


# ---- stage S: scalar work ----
def stage_S(y, z, x, u):
    y_pows = sf.powers(y, nm)
    y_inv = sf.invert(y)
    h_fact = sf.powers(y_inv, nm)
    z_pows = sf.powers(z, m + 3)
    u_inv = sf.batch_invert_rows(u)
    u_sq = sf.mul(u, u)
    s0 = u_inv
    s_vec = jnp.broadcast_to(sf.mul(y_pows, h_fact)[:, :1, :], (B, nm, sf.NLIMBS))
    for j in range(k):
        bit = (np.arange(nm) >> (k - 1 - j)) & 1
        mult = jnp.where(jnp.asarray(bit[None, :, None] == 1),
                         u_sq[:, j, None, :], sf.one((B, nm)))
        s_vec = sf.mul(s_vec, mult)
    return s_vec, h_fact, z_pows


# ---- stage M: the MSM ----
N_static = 2 + 2 * nm
N_total = N_static + B * P
sc = np.zeros((N_total, 32), dtype=np.uint8)
for i in range(N_total):
    sc[i] = np.frombuffer(ex.sc_to_bytes(int(rng.integers(1, 2**63))), np.uint8)
all_pts_host = [ex.pt_mul(2 + (i % 97), ex.BASEPOINT)
                for i in range(N_total)]
all_pts = pt.from_exact_batch(all_pts_host)
scal_limbs = sf.from_bytes(jnp.asarray(sc.astype(np.int32)))


def stage_M(sl, p):
    nib = _to_nibbles(sl)
    return qmsm.msm_raw(nib, p)


cj = jnp.asarray(comp)
sj = jnp.asarray(states)
print(f"shape: n={n_bits} m={m} B={B}  MSM N={N_total}", flush=True)
T_j = jax.jit(stage_T)
D_j = jax.jit(stage_D)
S_j = jax.jit(stage_S)
M_j = jax.jit(stage_M)
res = timeit("T: decompress+transcript", T_j, cj, sj)
timeit("D: decompress only", D_j, cj)
ok, y, z, x, u = res
timeit("S: scalar work", S_j, y, z, x, u)
timeit("M: combined MSM", M_j, scal_limbs, all_pts)

# full verifier for comparison
drv = DeviceRangeVerifier(n_bits, m, B)
rng2 = SeededRng(seed=b"prof")
vals = [5]
blind = [rng2.random_scalar() for _ in range(m)]
from quisquis_tpu.bulletproofs.range_proof import RangeProof
proof, V = RangeProof.prove_multiple(Transcript(b"RangeProof"), vals, blind,
                                     n_bits, rng=rng2)
proofs = [proof] * B
vlists = [V] * B
drv.verify(proofs, vlists, rng=SeededRng(seed=b"w"))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    drv.verify(proofs, vlists, rng=SeededRng(seed=b"w"))
    best = min(best, time.perf_counter() - t0)
print(f"{'FULL verify (host API)':28s} {best*1e3:8.1f} ms "
      f"-> {B/best:.1f} proofs/s", flush=True)

# ---- upload-cost ablation ----
def time_host(name, fn):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.1f} ms", flush=True)

comp_np = comp  # int32 [B, P, 32]
states_np = states
w_np = np.zeros((B, 2, 64), np.int32)
sc_np = np.zeros((B, 5, 32), np.int32)

def upload_all():
    a = jnp.asarray(comp_np); b = jnp.asarray(sc_np)
    c = jnp.asarray(w_np); d = jnp.asarray(states_np)
    jax.block_until_ready((a, b, c, d))

time_host("U: upload int32 inputs", upload_all)

comp_u8 = comp_np.astype(np.uint8)
states_u8 = states_np.astype(np.uint8)
w_u8 = w_np.astype(np.uint8)
sc_u8 = sc_np.astype(np.uint8)

def upload_u8():
    a = jnp.asarray(comp_u8); b = jnp.asarray(sc_u8)
    c = jnp.asarray(w_u8); d = jnp.asarray(states_u8)
    jax.block_until_ready((a, b, c, d))

time_host("U8: upload uint8 inputs", upload_u8)

# jitted full build with pre-uploaded args
cj2 = jnp.asarray(comp_np); sj2 = jnp.asarray(sc_np)
wj2 = jnp.asarray(w_np); stj2 = jnp.asarray(states_np)
fn = drv._verify_jit
r = fn(cj2, sj2, wj2, stj2, frame); r.block_until_ready()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = fn(cj2, sj2, wj2, stj2, frame); r.block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(f"{'F: full program, dev args':28s} {best*1e3:8.1f} ms", flush=True)

def fetch():
    return bool(r)
time_host("B: bool fetch", fetch)

# ---- pipelined dispatch: is the 283ms host overhead or device time? ----
t0 = time.perf_counter()
rs = [fn(cj2, sj2, wj2, stj2, frame) for _ in range(10)]
jax.block_until_ready(rs)
dt = time.perf_counter() - t0
print(f"{'P: 10 pipelined full calls':28s} {dt*1e3/10:8.1f} ms/call", flush=True)
