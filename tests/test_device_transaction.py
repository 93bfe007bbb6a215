"""Transaction batch verification through the device verifiers.

backend="device-batched" routes every embedded shuffle and range proof to
the one-program device verifiers (shuffle/bulletproofs device_verify) via
host transcript clones; the host only advances transcripts (appends +
challenge pulls — `advance_transcript`) and runs the sigma checks. These
tests pin that the advance-only replay is byte-exact (the sigma challenges
that follow it inside a transaction only verify if it is) and that device
rejection propagates per tampered component.
"""

import dataclasses

import pytest

from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import SeededRng
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.transaction.transaction import (
    Receiver, Sender, batch_verify_transactions, create_transaction,
    generate_value_and_account_vector, verify_transaction)


def build_tx(tag: bytes, amount: int = 5, balance: int = 10):
    rng = SeededRng(seed=tag)
    sk = RistrettoSecretKey.random(rng)
    pk = RistrettoPublicKey.from_secret_key(sk, rng)
    acc, _ = Account.generate_account(pk, rng)
    acc = Account.update_account(acc, balance, rng.random_scalar(),
                                 rng.random_scalar())
    rec_sk = RistrettoSecretKey.random(rng)
    rec_pk = RistrettoPublicKey.from_secret_key(rec_sk, rng)
    sender = Sender(total_amount=-amount, account=acc,
                    receivers=[Receiver(amount, rec_pk)])
    values, accounts, anon, diff, sc, rc = \
        generate_value_and_account_vector([sender], rng=rng, n=9)
    return create_transaction(
        values, accounts, sender_updated_balance=[balance - amount],
        sender_sk=[sk], anonymity_comm_scalar=anon,
        anonymity_account_diff=diff, receiver_updated_balance=[amount],
        senders_count=sc, receivers_count=rc, rng=rng)


def test_device_batched_transaction_verification():
    items = [build_tx(b"devtx-1"), build_tx(b"devtx-2", amount=3)]
    batch_verify_transactions(items, backend="device-batched", seed=b"s")


def test_device_batched_rejects_tampered_range_proof():
    items = [build_tx(b"devtx-3")]
    tx, proof = items[0]
    rp = proof.range_proofs[0]
    blob = bytearray(rp.to_bytes())
    blob[130] ^= 1   # t_x scalar
    bad = dataclasses.replace(proof,
                              range_proofs=[type(rp).from_bytes(bytes(blob))])
    with pytest.raises(ValueError):
        batch_verify_transactions([(tx, bad)], backend="device-batched",
                                  seed=b"s2")


def test_device_batched_rejects_tampered_shuffle():
    items = [build_tx(b"devtx-4")]
    tx, proof = items[0]
    sp = proof.output_shuffle_proof
    bad_sp = dataclasses.replace(
        sp, c_B=[bytes([sp.c_B[0][0] ^ 1]) + sp.c_B[0][1:]] + sp.c_B[1:])
    bad = dataclasses.replace(proof, output_shuffle_proof=bad_sp)
    with pytest.raises(ValueError):
        batch_verify_transactions([(tx, bad)], backend="device-batched",
                                  seed=b"s3")


def test_collector_advance_matches_full_replay():
    """The advance-only replay leaves the transcript byte-identical to the
    full host verification (otherwise every sigma challenge after an
    embedded proof would diverge and verification would fail loudly)."""
    from quisquis_tpu.accounts.deferred import (DeferredPointChecks,
                                                DeviceBatchCollector)

    tx, proof = build_tx(b"devtx-5")
    # full host verify passes
    verify_transaction(tx, proof, backend="host")
    # collector-mode host part (sigma checks) passes without ever calling
    # the device — proving the advanced transcript produced the right
    # sigma challenges; the collected proofs were verified at build time
    collector = DeviceBatchCollector()
    defer = DeferredPointChecks(b"\x11" * 32)
    verify_transaction(tx, proof, defer=defer, collector=collector)
    defer.verify(backend="host")
    assert len(collector.shuffle_entries) == 2
    assert sum(len(v) for v in collector.range_instances.values()) == 1
