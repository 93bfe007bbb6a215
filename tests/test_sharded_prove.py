"""Sharded device PROVING over the virtual 8-device mesh.

BASELINE config 4/5 at multi-chip scale, prove side: the lane (batch)
axis of DeviceRangeProver / DeviceShuffleProver is embarrassingly
parallel, so prove_sharded shard_maps the one-program prover over the
mesh with no collectives. These tests pin byte-identity of the sharded
output against the single-device prove() path (and therefore, through
tests/test_device_prove.py and tests/test_device_shuffle_prove.py,
against the host prover's exact bytes).

Reference prove paths:
- range:   vendored bulletproofs `RangeProof::prove_multiple`
           (used at /root/reference/src/accounts/prover.rs:544-591)
- shuffle: /root/reference/src/shuffle/shuffle.rs:361-532
(the reference is single-process Rust; sharding is TPU-build-only).
"""

import os

import pytest

from quisquis_tpu.accounts.transcript import SeededRng
from quisquis_tpu.parallel.mesh import make_mesh

N_BITS = 8


def test_range_prove_sharded_matches_single_device():
    """Byte-identity of the sharded prover against the HOST prover (which
    tests/test_device_prove.py already pins byte-identical to the
    single-device program — comparing against host avoids compiling a
    second one-program executable in this suite)."""
    from quisquis_tpu.accounts.transcript import Transcript
    from quisquis_tpu.bulletproofs.device_prove import DeviceRangeProver
    from quisquis_tpu.bulletproofs.range_proof import RangeProof

    m, B = 1, 8
    rng = SeededRng(seed=b"shard-rp")
    values = [[i * 3 + 1] for i in range(B)]
    blindings = [[rng.random_scalar()] for _ in range(B)]
    seeds = [b"shard-rp-lane-%d" % i for i in range(B)]

    drp = DeviceRangeProver(N_BITS, m, B)
    mesh = make_mesh(8)
    sh_proofs, sh_V = drp.prove_sharded(
        values, blindings, [SeededRng(seed=s) for s in seeds], mesh)
    for i in range(B):
        host_proof, host_V = RangeProof.prove_multiple(
            Transcript(b"RangeProof"), values[i], blindings[i], N_BITS,
            rng=SeededRng(seed=seeds[i]))
        assert sh_V[i] == host_V, f"lane {i}: V commitments differ"
        assert sh_proofs[i].to_bytes() == host_proof.to_bytes(), \
            f"lane {i}: proof bytes differ"


def test_range_prove_sharded_rejects_indivisible_batch():
    from quisquis_tpu.bulletproofs.device_prove import DeviceRangeProver

    drp = DeviceRangeProver(N_BITS, 1, 4)
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        drp.prove_sharded([[1]] * 4, [[2]] * 4,
                          [SeededRng(seed=b"x%d" % i) for i in range(4)],
                          mesh)


@pytest.mark.skipif(
    os.environ.get("QQ_HEAVY_TESTS") != "1",
    reason="compile-heavy one-program shuffle prover (set QQ_HEAVY_TESTS=1)")
def test_shuffle_prove_sharded_matches_single_device():
    from quisquis_tpu.accounts.accounts import Account
    from quisquis_tpu.primitives.keys import (RistrettoPublicKey,
                                              RistrettoSecretKey)
    from quisquis_tpu.shuffle.shuffle import Shuffle
    from quisquis_tpu.shuffle.device_prove import DeviceShuffleProver

    m, B = 2, 8
    rng = SeededRng(seed=b"shard-sp-acc")
    accounts = []
    for _ in range(m * m):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    shuffles = [Shuffle.input_shuffle(accounts,
                                      rng=SeededRng(seed=b"sh%d" % i))
                for i in range(B)]
    seeds = [b"shard-sp-lane-%d" % i for i in range(B)]

    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.accounts.transcript import Transcript
    from quisquis_tpu.shuffle.shuffle import ShuffleProof

    dsp = DeviceShuffleProver(m, B)
    mesh = make_mesh(8)
    sh = dsp.prove_sharded(shuffles, [SeededRng(seed=s) for s in seeds],
                           mesh)
    for i, (sp, ss) in enumerate(sh):
        lane = SeededRng(seed=seeds[i])
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=lane)
        hp, hs = ShuffleProof.create_shuffle_proof(prover, shuffles[i],
                                                   rng=lane)
        assert sp == hp
        assert ss == hs
