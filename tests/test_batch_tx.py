"""Lockstep batched transaction building (transaction.batch_create_transactions).

The round-5 device route for transaction proving: steps 1-8/10-11 stay
per-transaction on the host, step-9 aggregated range proofs are
collected across ALL transactions and proved as one device program
(RangeProof.prove_batch -> bulletproofs.device_prove). These tests pin
byte-identity against looping create_transaction (the reference builds
one tx at a time, /root/reference/src/transaction/transaction.rs:487-749).

The device case runs at range_bits=8 so the one-program prover shape is
small enough for the default suite.
"""

import pytest

from quisquis_tpu import config as qconfig
from quisquis_tpu.accounts.transcript import SeededRng
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.primitives.keys import (RistrettoPublicKey,
                                          RistrettoSecretKey)
from quisquis_tpu.transaction.transaction import (
    Sender, Receiver, batch_create_transactions, create_transaction,
    generate_value_and_account_vector, batch_verify_transactions)


def _make_reqs(tag: bytes, count: int):
    reqs = []
    for i in range(count):
        r = SeededRng(seed=tag + b"-setup%d" % i)
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        acc = Account.update_account(acc, 10 + i, r.random_scalar(),
                                     r.random_scalar())
        rec_pk = RistrettoPublicKey.from_secret_key(
            RistrettoSecretKey.random(r), r)
        sender = Sender(total_amount=-5, account=acc,
                        receivers=[Receiver(5, rec_pk)])
        values, accounts, anon, diff, sc, rc = \
            generate_value_and_account_vector([sender], rng=r)
        reqs.append(dict(
            value_vector=values, account_vector=accounts,
            sender_updated_balance=[10 + i - 5], sender_sk=[sk],
            anonymity_comm_scalar=anon, anonymity_account_diff=diff,
            receiver_updated_balance=[5], senders_count=sc,
            receivers_count=rc, rng=SeededRng(seed=tag + b"-tx%d" % i)))
    return reqs


def _proof_bytes(pair):
    from quisquis_tpu.utils import serde

    tx, proof = pair
    return (serde.transaction_to_bytes(tx),
            serde.transaction_proof_to_bytes(proof))


def test_batch_create_host_matches_loop():
    batched = batch_create_transactions(_make_reqs(b"bt-h", 2),
                                        range_backend="host")
    for pair, req in zip(batched, _make_reqs(b"bt-h", 2)):
        assert _proof_bytes(pair) == _proof_bytes(create_transaction(**req))
    batch_verify_transactions(batched, seed=b"bt-check")


def test_batch_create_device_matches_loop():
    old = qconfig.DEFAULT
    qconfig.set_default(range_bits=8)
    try:
        batched = batch_create_transactions(_make_reqs(b"bt-d", 2),
                                            range_backend="device-batched")
        for pair, req in zip(batched, _make_reqs(b"bt-d", 2)):
            assert _proof_bytes(pair) == \
                _proof_bytes(create_transaction(**req))
        batch_verify_transactions(batched, seed=b"bt-dcheck")
    finally:
        qconfig.DEFAULT = old


def test_batch_create_multi_sender_aggregates():
    """4 senders + 4 receivers -> one aggregated m=8 range proof per tx
    (the reference aggregates when the value count is a power of two,
    prover.rs:563-571)."""
    r = SeededRng(seed=b"bt-ms")
    senders, sks, bals = [], [], []
    for s in range(4):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        acc = Account.update_account(acc, 20 + s, r.random_scalar(),
                                     r.random_scalar())
        rec_pk = RistrettoPublicKey.from_secret_key(
            RistrettoSecretKey.random(r), r)
        senders.append(Sender(total_amount=-5, account=acc,
                              receivers=[Receiver(5, rec_pk)]))
        sks.append(sk)
        bals.append(20 + s - 5)
    values, accounts, anon, diff, sc, rc = \
        generate_value_and_account_vector(senders, rng=r, n=16)
    req = dict(value_vector=values, account_vector=accounts,
               sender_updated_balance=bals, sender_sk=sks,
               anonymity_comm_scalar=anon, anonymity_account_diff=diff,
               receiver_updated_balance=[5] * 4, senders_count=sc,
               receivers_count=rc, rng=SeededRng(seed=b"bt-ms-tx"))
    out = batch_create_transactions([req], range_backend="host")
    assert len(out) == 1
    tx, proof = out[0]
    assert len(proof.range_proofs) == 1      # aggregated, not per-value
    batch_verify_transactions(out, seed=b"bt-ms-check")
