"""Phase profile of the one-program device shuffle verifier on the chip.

Maintained measurement tool (not scratch): times the DeviceShuffleVerifier
program truncated after each phase (its `_stop_at` debug knob) so the
steady-state wall-clock can be attributed to decompress / transcript+scalar
work / the consolidated scalar-mul phase / the final MSM. Feeds the
crossover table in shuffle/shuffle.py and BENCHMARKS.md §5e.

Usage:
    python tools/profile_device_shuffle.py [m] [B] [phase ...]
e.g.
    python tools/profile_device_shuffle.py 8 16            # all phases
    python tools/profile_device_shuffle.py 8 64 full       # one point

Each phase variant is its own XLA executable (~minutes cold per shape on
a real chip); results load from the shared persistent cache on re-runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quisquis_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from quisquis_tpu.accounts.accounts import Account  # noqa: E402
from quisquis_tpu.accounts.prover import Prover  # noqa: E402
from quisquis_tpu.accounts.transcript import SeededRng, Transcript  # noqa: E402
from quisquis_tpu.shuffle.device_verify import DeviceShuffleVerifier  # noqa: E402
from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof  # noqa: E402
from quisquis_tpu.primitives.keys import (RistrettoPublicKey,  # noqa: E402
                                          RistrettoSecretKey)

PHASES = ["decompress", "hadamard", "scalars", "mulphase", "ddh",
          "multiexpo", "full"]


def build_entries(m: int, B: int, distinct: int = 4):
    rng = SeededRng(seed=b"profile-shuffle")
    accounts = []
    for _ in range(m * m):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    t0 = time.time()
    entries = []
    for _ in range(min(B, distinct)):
        sh = Shuffle.input_shuffle(accounts, rng=rng)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=rng)
        proof, stmt = ShuffleProof.create_shuffle_proof(prover, sh, rng=rng)
        entries.append((proof, stmt, sh.get_inputs_vector(),
                        sh.get_outputs_vector()))
    while len(entries) < B:
        entries.append(entries[len(entries) % distinct])
    print(f"proved {B} (m={m}) in {time.time() - t0:.1f}s", flush=True)
    return entries


def profile_prove(m: int, B: int):
    """Steady-state throughput of the one-program device shuffle PROVER
    vs the host prover loop (usage: ... <m> <B> prove)."""
    from quisquis_tpu.shuffle.device_prove import DeviceShuffleProver
    from quisquis_tpu.shuffle.shuffle import batch_create_shuffle_proofs

    rng = SeededRng(seed=b"profile-prove")
    accounts = []
    for _ in range(m * m):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    shuffles = [Shuffle.input_shuffle(accounts, rng=SeededRng(seed=b"s%d" % i))
                for i in range(B)]

    def rngs():
        return [SeededRng(seed=b"l%d" % i) for i in range(B)]

    t0 = time.time()
    host = batch_create_shuffle_proofs(shuffles, rngs(), backend="host")
    t_host = time.time() - t0
    print(f"host prove: {t_host * 1e3 / B:.1f} ms/proof "
          f"({B / t_host:.1f} proofs/s)", flush=True)
    dsp = DeviceShuffleProver(m, B)
    t0 = time.time()
    dev = dsp.prove(shuffles, rngs())
    print(f"device first prove (compile+run): {time.time() - t0:.1f}s",
          flush=True)
    assert all(d[0] == h[0] and d[1] == h[1] for d, h in zip(dev, host)), \
        "device/host proof mismatch"
    for _ in range(3):
        t0 = time.time()
        dsp.prove(shuffles, rngs())
        dt = time.time() - t0
        print(f"device steady prove: {dt * 1e3:.0f} ms -> "
              f"{B / dt:.1f} proofs/s", flush=True)


PROVE_PHASES = ["commits", "hadamard", "product", "ddh", "full"]


def profile_prove_phases(m: int, B: int, phases=None):
    """Per-phase wall-clock attribution of the device shuffle PROVER: the
    program truncated after each sub-argument (DeviceShuffleProver's
    `_stop_at` knob), steady-state best-of-3 per variant. Each variant is
    its own executable (~minutes cold); re-runs load from the cache.
    Usage: ... <m> <B> prove-phases [phase ...]"""
    import numpy as np
    import jax.numpy as jnp
    from quisquis_tpu.shuffle.device_prove import DeviceShuffleProver

    rng = SeededRng(seed=b"profile-prove")
    accounts = []
    for _ in range(m * m):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    shuffles = [Shuffle.input_shuffle(accounts, rng=SeededRng(seed=b"s%d" % i))
                for i in range(B)]
    packer = DeviceShuffleProver(m, B)
    arrays, frame = packer._pack_prove(
        shuffles, [SeededRng(seed=b"l%d" % i) for i in range(B)])
    jargs = [jnp.asarray(a) for a in arrays]
    results = {}
    for phase in (phases or PROVE_PHASES):
        dsp = DeviceShuffleProver(m, B)
        dsp._stop_at = None if phase == "full" else phase
        t0 = time.time()
        np.asarray(dsp._prove_jit(*jargs, frame)[0])
        print(f"{phase:>10}: compile+first {time.time() - t0:6.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(dsp._prove_jit(*jargs, frame)[0])
            best = min(best, time.time() - t0)
        results[phase] = best
        print(f"{phase:>10}: steady {best * 1e3:7.1f} ms", flush=True)
    prev = 0.0
    print(f"\nphase attribution (m={m}, B={B}):")
    for phase in (phases or PROVE_PHASES):
        if phase in results:
            delta = results[phase] - prev
            print(f"  {phase:>10}: cum {results[phase]*1e3:7.1f} ms  "
                  f"marginal {delta*1e3:+8.1f} ms")
            prev = results[phase]


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    phases = sys.argv[3:] or PHASES
    if phases == ["prove"]:
        profile_prove(m, B)
        return
    if phases and phases[0] == "prove-phases":
        profile_prove_phases(m, B, phases[1:] or None)
        return
    entries = build_entries(m, B)
    results = {}
    for phase in phases:
        dsv = DeviceShuffleVerifier(m, B)
        dsv._stop_at = None if phase == "full" else phase
        t0 = time.time()
        try:
            dsv.verify(entries, rng=SeededRng(seed=b"w"))
        except ValueError:
            pass  # truncated programs return False; timing is what matters
        compile_s = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.time()
            try:
                dsv.verify(entries, rng=SeededRng(seed=b"w"))
            except ValueError:
                pass
            reps.append(time.time() - t0)
        steady = min(reps)
        results[phase] = steady
        print(f"{phase:12s} compile+run {compile_s:7.1f}s  steady "
              f"{steady * 1e3:7.1f} ms  ({B / steady:6.1f} proofs/s)",
              flush=True)
    if "full" in results:
        prev = 0.0
        print("\nphase deltas (steady):")
        for phase in PHASES:
            if phase not in results:
                continue
            d = results[phase] - prev
            print(f"  {phase:12s} +{d * 1e3:7.1f} ms")
            prev = results[phase]


if __name__ == "__main__":
    main()
