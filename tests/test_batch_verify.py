"""Cross-proof batched verification via deferred point checks.

The TPU batch path: every point-identity check from a batch of proofs is
random-weighted into ONE MSM (accounts.deferred). These tests pin that the
deferred path accepts exactly what the eager path accepts (valid proofs)
and rejects tampered ones, on the host, device, and sharded backends.
"""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.prover import Prover
from quisquis_tpu.accounts.verifier import Verifier
from quisquis_tpu.accounts.deferred import DeferredPointChecks, assert_identity
from quisquis_tpu.shuffle.shuffle import (Shuffle, ShuffleProof,
                                          batch_verify_shuffle_proofs)

L = ex.L


def make_accounts(r, n=9):
    out = []
    for _ in range(n):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        out.append(acc)
    return out


def make_proofs(count=3, n=9, tag=b"batchverify"):
    r = SeededRng(seed=tag)
    entries = []
    for i in range(count):
        accounts = make_accounts(r, n)
        sh = Shuffle.input_shuffle(accounts, rng=r)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=r)
        proof, statement = ShuffleProof.create_shuffle_proof(prover, sh, rng=r)
        verifier = Verifier(b"Shuffle", Transcript(b"ShuffleProof"))
        entries.append((proof, verifier, statement, sh.get_inputs_vector(),
                        sh.get_outputs_vector()))
    return entries


def test_deferred_accumulator_basics():
    d = DeferredPointChecks(seed=b"t")
    G = ex.BASEPOINT
    P = ex.pt_mul(7, G)
    d.check_eq([7], [G], P, "7G == P")
    d.check([3, (-3) % L], [G, G], "3G - 3G == 0")
    d.verify(backend="host")

    bad = DeferredPointChecks(seed=b"t")
    bad.check_eq([8], [G], P, "8G == P must fail")
    with pytest.raises(ValueError, match="8G == P must fail"):
        bad.verify(backend="host")


def test_assert_identity_eager_path():
    G = ex.BASEPOINT
    assert_identity(None, [5, (-5) % L], [G, G], "ok")
    with pytest.raises(ValueError, match="boom"):
        assert_identity(None, [5, (-4) % L], [G, G], "boom")


def test_batch_verify_host_accepts():
    batch_verify_shuffle_proofs(make_proofs(3), backend="host",
                                seed=b"weights")


def test_batch_verify_rejects_tampered():
    entries = make_proofs(3, tag=b"tamper")
    proof, verifier, statement, inputs, outputs = entries[1]
    outputs = list(outputs)
    outputs[0], outputs[1] = outputs[1], outputs[0]
    entries[1] = (proof, verifier, statement, inputs, outputs)
    with pytest.raises(ValueError):
        batch_verify_shuffle_proofs(entries, backend="host", seed=b"weights")


def test_deferred_single_matches_eager():
    """One proof, deferred vs eager: both accept; tampering breaks both."""
    entries = make_proofs(1, tag=b"single")
    proof, verifier, statement, inputs, outputs = entries[0]
    defer = DeferredPointChecks(seed=b"w")
    proof.verify(verifier, statement, inputs, outputs, defer=defer)
    assert defer.num_terms > 0
    defer.verify(backend="host")
    # eager re-verify with a fresh transcript still passes
    proof.verify(Verifier(b"Shuffle", Transcript(b"ShuffleProof")),
                 statement, inputs, outputs)


def test_schnorr_batch_verify():
    from quisquis_tpu.primitives.schnorr import Signature, VerificationKey

    r = SeededRng(seed=b"schnorrbatch")
    items = []
    for i in range(8):
        sk = r.random_scalar()
        vk = VerificationKey.from_secret(sk, r.random_scalar())
        t = Transcript(b"sig%d" % i)
        sig = Signature.sign(t.clone(), vk, sk, rng=r)
        items.append((sig, t, vk))
    Signature.batch_verify([(s, t.clone(), v) for s, t, v in items],
                           backend="host", seed=b"w")
    # one forged signature poisons the batch
    bad = Signature((items[0][0].s + 1) % L, items[0][0].R)
    poisoned = [(bad, items[0][1].clone(), items[0][2])] + \
        [(s, t.clone(), v) for s, t, v in items[1:]]
    with pytest.raises(ValueError):
        Signature.batch_verify(poisoned, backend="host", seed=b"w")


def test_batch_verify_device_backend():
    batch_verify_shuffle_proofs(make_proofs(2, tag=b"dev"), backend="device",
                                seed=b"weights")


def test_batch_verify_sharded_backend():
    from quisquis_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    batch_verify_shuffle_proofs(make_proofs(2, tag=b"shard"),
                                backend="sharded", mesh=mesh,
                                seed=b"weights")


def test_deferred_derive_merge_matches_direct():
    """Splitting checks across derived sub-accumulators and merging is
    equivalent to collecting into one accumulator (same accept/reject)."""
    G = ex.BASEPOINT
    P = ex.pt_mul(11, G)
    parent = DeferredPointChecks(seed=b"m")
    subs = [parent.derive(i) for i in range(2)]
    subs[0].check_eq([11], [G], P, "11G == P")
    subs[1].check([4, (-4) % L], [G, G], "4G - 4G == 0")
    for s in subs:
        parent.merge(s)
    assert parent.num_terms > 0
    parent.verify(backend="host")

    bad_parent = DeferredPointChecks(seed=b"m")
    bad = bad_parent.derive(0)
    bad.check_eq([12], [G], P, "12G == P must fail")
    bad_parent.merge(bad)
    with pytest.raises(ValueError, match="12G == P must fail"):
        bad_parent.verify(backend="host")


def test_batch_verify_threaded_workers():
    batch_verify_shuffle_proofs(make_proofs(3, tag=b"thr"), backend="host",
                                seed=b"weights", workers=3)


def test_batch_verify_threaded_rejects_tampered():
    entries = make_proofs(3, tag=b"thr-tamper")
    proof, verifier, statement, inputs, outputs = entries[2]
    outputs = list(outputs)
    outputs[0], outputs[1] = outputs[1], outputs[0]
    entries[2] = (proof, verifier, statement, inputs, outputs)
    with pytest.raises(ValueError):
        batch_verify_shuffle_proofs(entries, backend="host",
                                    seed=b"weights", workers=3)
