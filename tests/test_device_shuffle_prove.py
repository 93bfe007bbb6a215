"""On-device batched shuffle-proof PROVING vs the host prover, byte-for-byte.

The strongest parity statement for the prove side of the headline
workload (/root/reference/src/shuffle/shuffle.rs:361-532): every
commitment, every challenge, every response scalar of the device prover
must match ShuffleProof.create_shuffle_proof exactly under the same
SeededRng stream.

The one-program prover compiles for ~20 minutes cold on CPU (minutes on
a real TPU; instant from the shared persistent cache), so this module is
gated behind QQ_HEAVY_TESTS=1:

    QQ_HEAVY_TESTS=1 python -m pytest tests/test_device_shuffle_prove.py

CI runs it on the warmed cache; the default suite skips it.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("QQ_HEAVY_TESTS") != "1",
    reason="compile-heavy one-program prover (set QQ_HEAVY_TESTS=1)")

from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.prover import Prover
from quisquis_tpu.accounts.verifier import Verifier
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey


def _accounts(m, tag):
    rng = SeededRng(seed=tag)
    out = []
    for _ in range(m * m):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        out.append(acc)
    return out


def test_device_shuffle_prove_matches_host_bytes():
    from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
    from quisquis_tpu.shuffle.device_prove import DeviceShuffleProver

    m, B = 2, 2
    accounts = _accounts(m, b"dsp-acc")
    shuffles, host = [], []
    for i in range(B):
        sh = Shuffle.input_shuffle(accounts, rng=SeededRng(seed=b"sh%d" % i))
        shuffles.append(sh)
        lane = SeededRng(seed=b"lane%d" % i)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=lane)
        host.append(ShuffleProof.create_shuffle_proof(prover, sh, rng=lane))
    dsp = DeviceShuffleProver(m, B)
    dev = dsp.prove(shuffles, [SeededRng(seed=b"lane%d" % i)
                               for i in range(B)])
    for i in range(B):
        hp, hs = host[i]
        dp, ds = dev[i]
        assert dp.c_A == hp.c_A and dp.c_tau == hp.c_tau
        assert dp.c_B == hp.c_B and dp.c_B_dash == hp.c_B_dash
        assert dp.hadamard_proof == hp.hadamard_proof
        assert ds.hadamard_statement == hs.hadamard_statement
        assert dp.product_proof == hp.product_proof
        assert ds.product_statement == hs.product_statement
        assert dp.ddh_proof == hp.ddh_proof
        assert ds.ddh_statement == hs.ddh_statement
        assert dp.multi_exponen_pk == hp.multi_exponen_pk
        assert dp.multi_exponen_commit == hp.multi_exponen_commit
        # and the device proof verifies through the host verifier
        dp.verify(Verifier(b"Shuffle", Transcript(b"ShuffleProof")), ds,
                  shuffles[i].get_inputs_vector(),
                  shuffles[i].get_outputs_vector())


def test_batch_create_shuffle_proofs_device_backend():
    """The fielded batch entry point routes through the device prover and
    matches the host backend byte-for-byte."""
    from quisquis_tpu.shuffle.shuffle import (Shuffle,
                                              batch_create_shuffle_proofs)

    m = 2
    accounts = _accounts(m, b"bcsp-acc")
    shuffles = [Shuffle.input_shuffle(accounts, rng=SeededRng(seed=b"s%d" % i))
                for i in range(2)]
    host = batch_create_shuffle_proofs(
        shuffles, [SeededRng(seed=b"l%d" % i) for i in range(2)],
        backend="host")
    dev = batch_create_shuffle_proofs(
        shuffles, [SeededRng(seed=b"l%d" % i) for i in range(2)],
        backend="device-batched")
    for (hp, hs), (dp, ds) in zip(host, dev):
        assert dp == hp
        assert ds == hs
