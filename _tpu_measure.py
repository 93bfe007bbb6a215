"""Measure device-verifier compile + run times on the real TPU (scratch)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs.range_proof import RangeProof
from quisquis_tpu.bulletproofs.device_verify import DeviceRangeVerifier

which = sys.argv[1] if len(sys.argv) > 1 else "range1"

if which.startswith("range"):
    # 4c successor: n=64, m=1, B=256 single-value proofs
    n_bits, m, B = 64, 1, 256
    if which == "range16":
        n_bits, m, B = 64, 16, 32
    rng = SeededRng(seed=b"tpumeas")
    t0 = time.time()
    proofs, vlists = [], []
    base_proof, base_V = None, None
    for i in range(min(B, 16)):   # build 16 distinct, tile the rest
        vals = [100 + i + j for j in range(m)]
        blind = [rng.random_scalar() for _ in range(m)]
        p, V = RangeProof.prove_multiple(Transcript(b"RangeProof"), vals,
                                         blind, n_bits, rng=rng)
        proofs.append(p); vlists.append(V)
    while len(proofs) < B:
        proofs.append(proofs[len(proofs) % 16])
        vlists.append(vlists[len(vlists) % 16])
    print(f"proved {B} in {time.time()-t0:.1f}s", flush=True)
    drv = DeviceRangeVerifier(n_bits, m, B)
    t0 = time.time()
    drv.verify(proofs, vlists, rng=SeededRng(seed=b"w"))
    print(f"first verify (compile+run): {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        drv.verify(proofs, vlists, rng=SeededRng(seed=b"w"))
        dt = time.time() - t0
        print(f"steady verify: {dt*1e3:.0f} ms -> {B/dt:.1f} proofs/s", flush=True)
elif which.startswith("shuffle"):
    from quisquis_tpu.accounts.accounts import Account
    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.primitives.keys import (RistrettoPublicKey,
                                              RistrettoSecretKey)
    from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
    from quisquis_tpu.shuffle.device_verify import DeviceShuffleVerifier

    m, B = (3, 16) if which == "shuffle3" else (8, 16)
    rng = SeededRng(seed=b"tpumeas-sh")
    accounts = []
    for _ in range(m * m):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    t0 = time.time()
    entries = []
    for _ in range(min(B, 4)):
        sh = Shuffle.input_shuffle(accounts, rng=rng)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=rng)
        proof, stmt = ShuffleProof.create_shuffle_proof(prover, sh, rng=rng)
        entries.append((proof, stmt, sh.get_inputs_vector(),
                        sh.get_outputs_vector()))
    while len(entries) < B:
        entries.append(entries[len(entries) % 4])
    print(f"proved {B} (m={m}) in {time.time()-t0:.1f}s", flush=True)
    dsv = DeviceShuffleVerifier(m, B)
    t0 = time.time()
    dsv.verify(entries, rng=SeededRng(seed=b"w"))
    print(f"first verify (compile+run): {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        dsv.verify(entries, rng=SeededRng(seed=b"w"))
        dt = time.time() - t0
        print(f"steady verify: {dt*1e3:.0f} ms -> {B/dt:.1f} proofs/s", flush=True)
