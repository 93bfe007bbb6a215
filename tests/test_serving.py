"""Multi-process verification service (serving path).

Covers: wire round-trip through worker processes, accept on valid batches,
reject with chunk attribution on tampered wire bytes.
"""

import pytest

from quisquis_tpu.accounts.transcript import SeededRng
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.transaction.transaction import (
    Sender, Receiver, create_transaction, generate_value_and_account_vector)
from quisquis_tpu.serving import VerificationService, serialize_transaction


def make_items(count: int, tag: bytes):
    rng = SeededRng(seed=tag)
    items = []
    for i in range(count):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        acc = Account.update_account(acc, 10 + i, rng.random_scalar(),
                                     rng.random_scalar())
        rec_pk = RistrettoPublicKey.from_secret_key(
            RistrettoSecretKey.random(rng), rng)
        sender = Sender(total_amount=-5, account=acc,
                        receivers=[Receiver(5, rec_pk)])
        values, accounts, anon, diff, sc, rc = \
            generate_value_and_account_vector([sender], rng=rng)
        items.append(create_transaction(
            values, accounts, sender_updated_balance=[10 + i - 5],
            sender_sk=[sk], anonymity_comm_scalar=anon,
            anonymity_account_diff=diff, receiver_updated_balance=[5],
            senders_count=sc, receivers_count=rc, rng=rng))
    return items


def test_service_accepts_and_rejects():
    items = make_items(4, b"serving-test")
    pairs = [serialize_transaction(tx, pf) for tx, pf in items]
    with VerificationService(workers=2, seed=b"svc") as svc:
        assert svc.verify_wire(pairs) == 4
        assert svc.verify(items) == 4
        assert svc.verify_wire([]) == 0

        # flip one byte of one proof: exactly that chunk must fail
        blob = bytearray(pairs[2][1])
        blob[40] ^= 1
        bad = list(pairs)
        bad[2] = (bad[2][0], bytes(blob))
        with pytest.raises(ValueError, match="chunk"):
            svc.verify_wire(bad)

        # truncated wire bytes are a deserialization error, not a crash
        with pytest.raises(ValueError, match="chunk"):
            svc.verify_wire([(pairs[0][0], pairs[0][1][:100])])


def test_proving_service_builds_verifiable_transactions():
    from quisquis_tpu.serving import ProvingService, BuildRequest

    rng = SeededRng(seed=b"serving-prove")
    reqs = []
    for i in range(3):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        acc = Account.update_account(acc, 10 + i, rng.random_scalar(),
                                     rng.random_scalar())
        rec_pk = RistrettoPublicKey.from_secret_key(
            RistrettoSecretKey.random(rng), rng)
        reqs.append(BuildRequest(acc.as_bytes(), sk.as_bytes(), amount=5,
                                 receiver_pk=rec_pk.as_bytes(),
                                 sender_updated_balance=10 + i - 5))
    with ProvingService(workers=2, seed=b"pp") as pp:
        pairs = pp.build(reqs)
        assert pp.build([]) == []
    assert len(pairs) == 3
    with VerificationService(workers=2, seed=b"vv") as svc:
        assert svc.verify_wire(pairs) == 3


def test_service_collect_backends():
    """device / merged-host modes: workers export weighted terms, the parent
    folds every chunk into ONE MSM (accounts.deferred.absorb_wire)."""
    items = make_items(3, b"serving-collect")
    pairs = [serialize_transaction(tx, pf) for tx, pf in items]
    for backend in ("merged-host", "device"):
        with VerificationService(workers=2, seed=b"svc",
                                 backend=backend) as svc:
            assert svc.verify_wire(pairs) == 3

            # tamper with a *point identity* (an account byte): the sigma
            # transcript replay still passes in the worker, so the failure
            # must surface from the merged MSM in the parent
            blob = bytearray(pairs[1][0])
            blob[-7] ^= 1
            bad = list(pairs)
            bad[1] = (bytes(blob), bad[1][1])
            with pytest.raises(ValueError):
                svc.verify_wire(bad)


def test_shuffle_verification_service():
    from quisquis_tpu.accounts.transcript import Transcript
    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
    from quisquis_tpu.serving import ShuffleVerificationService
    from quisquis_tpu.utils import serde

    rng = SeededRng(seed=b"serving-shuffle")
    accounts = []
    for _ in range(9):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)

    entries = []
    for _ in range(3):
        sh = Shuffle.input_shuffle(accounts, rng=rng)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=rng)
        proof, statement = ShuffleProof.create_shuffle_proof(
            prover, sh, rng=rng)
        entries.append((proof, statement, sh.get_inputs_vector(),
                        sh.get_outputs_vector()))

    blobs = [serde.shuffle_entry_to_bytes(*e) for e in entries]
    # wire roundtrip is lossless
    p2, s2, in2, out2 = serde.shuffle_entry_from_bytes(blobs[0])
    assert p2.c_A == entries[0][0].c_A
    assert [a.as_bytes() for a in in2] == [a.as_bytes()
                                           for a in entries[0][2]]

    with ShuffleVerificationService(workers=2, seed=b"shsvc",
                                    backend="merged-host") as svc:
        assert svc.verify_wire(blobs) == 3
        assert svc.verify(entries) == 3
        assert svc.verify_wire([]) == 0

        bad = bytearray(blobs[2])
        bad[60] ^= 1
        with pytest.raises(ValueError):
            svc.verify_wire([blobs[0], blobs[1], bytes(bad)])


def test_r1cs_transaction_through_wire_and_service():
    """R1CS-path transactions survive the wire format and the service
    (VERDICT r1 item 9: serde/serving parity for the R1CS path)."""
    from quisquis_tpu.transaction.transaction import (
        create_transaction_r1cs, verify_transaction_auto)
    from quisquis_tpu.utils import serde

    rng = SeededRng(seed=b"serving-r1cs")
    sk = RistrettoSecretKey.random(rng)
    pk = RistrettoPublicKey.from_secret_key(sk, rng)
    acc, _ = Account.generate_account(pk, rng)
    acc = Account.update_account(acc, 10, rng.random_scalar(),
                                 rng.random_scalar())
    rec_pk = RistrettoPublicKey.from_secret_key(
        RistrettoSecretKey.random(rng), rng)
    sender = Sender(total_amount=-5, account=acc,
                    receivers=[Receiver(5, rec_pk)])
    values, accounts, anon, diff, sc, rc = \
        generate_value_and_account_vector([sender], rng=rng)
    tx, pf = create_transaction_r1cs(
        values, accounts, sender_updated_balance=[5], sender_sk=[sk],
        anonymity_comm_scalar=anon, anonymity_account_diff=diff,
        receiver_updated_balance=[5], senders_count=sc, receivers_count=rc,
        rng=rng)

    # wire roundtrip preserves the R1CS proof and it verifies
    pair = serialize_transaction(tx, pf)
    tx2 = serde.transaction_from_bytes(pair[0])
    pf2 = serde.transaction_proof_from_bytes(pair[1])
    from quisquis_tpu.bulletproofs.r1cs import R1CSProof
    assert isinstance(pf2.range_proofs[0], R1CSProof)
    verify_transaction_auto(tx2, pf2)

    # through the service (host and collect modes)
    for backend in ("host", "merged-host"):
        with VerificationService(workers=2, seed=b"r1cs",
                                 backend=backend) as svc:
            assert svc.verify_wire([pair]) == 1
            bad = bytearray(pair[1])
            bad[-40] ^= 1
            with pytest.raises(ValueError):
                svc.verify_wire([(pair[0], bytes(bad))])


def test_service_device_batched_backend():
    """backend='device-batched': embedded shuffle/range proofs run in the
    one-program device verifiers; accept + reject paths."""
    items = make_items(2, b"serving-devb")
    pairs = [serialize_transaction(tx, pf) for tx, pf in items]
    with VerificationService(workers=1, seed=b"svc-devb",
                             backend="device-batched") as svc:
        assert svc.verify_wire(pairs) == 2
        blob = bytearray(pairs[1][1])
        blob[40] ^= 1
        bad = [pairs[0], (pairs[1][0], bytes(blob))]
        with pytest.raises(ValueError):
            svc.verify_wire(bad)


def test_shuffle_service_device_batched_backend():
    from quisquis_tpu.accounts.transcript import Transcript
    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
    from quisquis_tpu.serving import ShuffleVerificationService
    from quisquis_tpu.utils import serde

    rng = SeededRng(seed=b"shsvc-devb")
    accounts = []
    for _ in range(9):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    blobs = []
    for _ in range(2):
        sh = Shuffle.input_shuffle(accounts, rng=rng)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=rng)
        proof, stmt = ShuffleProof.create_shuffle_proof(prover, sh, rng=rng)
        blobs.append(serde.shuffle_entry_to_bytes(
            proof, stmt, sh.get_inputs_vector(), sh.get_outputs_vector()))
    with ShuffleVerificationService(workers=1,
                                    backend="device-batched") as svc:
        assert svc.verify_wire(blobs) == 2
        bad = bytearray(blobs[0])
        bad[100] ^= 1
        with pytest.raises(ValueError):
            svc.verify_wire([bytes(bad), blobs[1]])


def test_range_proving_service_device_batched():
    """RangeProvingService proves request batches through the one-program
    device prover; proofs verify and match the host backend byte-for-byte
    under the same seed."""
    from quisquis_tpu.accounts.transcript import Transcript
    from quisquis_tpu.serving import RangeProvingService

    rng = SeededRng(seed=b"rps")
    reqs = [([i + 1, 100 + i], [rng.random_scalar(), rng.random_scalar()])
            for i in range(3)]
    dev = RangeProvingService(n_bits=8, backend="device-batched",
                              seed=b"rps-seed")
    host = RangeProvingService(n_bits=8, backend="host", seed=b"rps-seed")
    out_d = dev.prove(reqs)
    out_h = host.prove(reqs)
    assert len(out_d) == len(out_h) == 3
    for (pd, vd), (ph, vh) in zip(out_d, out_h):
        assert pd.to_bytes() == ph.to_bytes()
        assert vd == vh
        pd.verify_multiple(Transcript(b"RangeProof"), vd, 8)
