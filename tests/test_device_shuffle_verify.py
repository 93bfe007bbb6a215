"""On-device batched shuffle verification vs the host verifier.

Runs UN-gated in CI: the round-3 vectorized limb engines (gathered
schoolbook + matrix-fold reduction in ops/scalar_field.py and
ops/field.py, scanned window tables in ops/point.py) cut the traced
verifier graph ~15x, so the one-time XLA compile fits the normal test
loop and lands in the persistent cache.
"""

import dataclasses
import os

import pytest

from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.prover import Prover
from quisquis_tpu.accounts.verifier import Verifier
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
from quisquis_tpu.shuffle.device_verify import DeviceShuffleVerifier

M = 3       # 9-account anonymity set
B = 2


def make_entries(tag: bytes, count=B, n=M * M):
    rng = SeededRng(seed=tag)
    accounts = []
    for _ in range(n):
        sk = RistrettoSecretKey.random(rng)
        pk = RistrettoPublicKey.from_secret_key(sk, rng)
        acc, _ = Account.generate_account(pk, rng)
        accounts.append(acc)
    entries = []
    for _ in range(count):
        sh = Shuffle.input_shuffle(accounts, rng=rng)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=rng)
        proof, statement = ShuffleProof.create_shuffle_proof(
            prover, sh, rng=rng)
        entries.append((proof, statement, sh.get_inputs_vector(),
                        sh.get_outputs_vector()))
    return entries


def host_verify(entry):
    proof, statement, inputs, outputs = entry
    v = Verifier(b"Shuffle", Transcript(b"ShuffleProof"))
    proof.verify(v, statement, inputs, outputs)


def test_device_accepts_valid_shuffles():
    entries = make_entries(b"dsv-ok")
    for e in entries:
        host_verify(e)
    dsv = DeviceShuffleVerifier(M, B)
    dsv.verify(entries, rng=SeededRng(seed=b"w"))


def test_device_rejects_tampering():
    dsv = DeviceShuffleVerifier(M, B)
    rng = SeededRng(seed=b"w2")

    def expect_reject(mutate, name):
        entries = make_entries(b"dsv-bad")
        proof, statement, inputs, outputs = entries[1]
        proof2, statement2 = mutate(proof, statement)
        entries[1] = (proof2, statement2, inputs, outputs)
        # the host verifier must also reject (parity check)
        with pytest.raises(ValueError):
            host_verify(entries[1])
        with pytest.raises(ValueError):
            dsv.verify(entries, rng=rng)

    def flip(b: bytes) -> bytes:
        return bytes([b[0] ^ 1]) + b[1:]

    expect_reject(lambda p, s: (
        dataclasses.replace(p, c_A=[flip(p.c_A[0])] + p.c_A[1:]), s),
        "c_A point")
    expect_reject(lambda p, s: (dataclasses.replace(
        p, hadamard_proof=dataclasses.replace(
            p.hadamard_proof,
            a_bar=[(p.hadamard_proof.a_bar[0] + 1)]
            + p.hadamard_proof.a_bar[1:])), s), "hadamard a_bar")
    expect_reject(lambda p, s: (dataclasses.replace(
        p, ddh_proof=dataclasses.replace(
            p.ddh_proof, z=p.ddh_proof.z + 1)), s), "ddh z")
    expect_reject(lambda p, s: (dataclasses.replace(
        p, multi_exponen_commit=dataclasses.replace(
            p.multi_exponen_commit,
            E_k_0=[flip(p.multi_exponen_commit.E_k_0[0])]
            + p.multi_exponen_commit.E_k_0[1:])), s), "multiexpo E_k")

    # tampered statement: wrong svp b
    def bad_stmt(p, s):
        ps = dataclasses.replace(
            s.product_statement,
            svp_statement=dataclasses.replace(
                s.product_statement.svp_statement,
                b=s.product_statement.svp_statement.b + 1))
        return p, dataclasses.replace(s, product_statement=ps)
    expect_reject(bad_stmt, "svp statement b")


def test_device_rejects_swapped_accounts():
    entries = make_entries(b"dsv-swap")
    e0 = entries[0]
    # swap input and output vectors: statement no longer matches
    entries[0] = (e0[0], e0[1], e0[3], e0[2])
    dsv = DeviceShuffleVerifier(M, B)
    with pytest.raises(ValueError):
        dsv.verify(entries, rng=SeededRng(seed=b"w3"))


def test_batch_verify_device_batched_dispatch():
    """The production entry (shuffle.batch_verify_shuffle_proofs) routes to
    the device verifier: odd batch size exercises shape bucketing/padding."""
    from quisquis_tpu.shuffle.shuffle import batch_verify_shuffle_proofs

    entries = make_entries(b"dsv-dispatch", count=3)
    wrapped = [(p, Verifier(b"Shuffle", Transcript(b"ShuffleProof")),
                st, ins, outs) for p, st, ins, outs in entries]
    batch_verify_shuffle_proofs(wrapped, backend="device-batched",
                                seed=b"disp")

    # tampered lane still rejects through the dispatch path
    bad = make_entries(b"dsv-dispatch-bad", count=3)
    p, st, ins, outs = bad[2]
    bad[2] = (dataclasses.replace(
        p, c_B=[bytes([p.c_B[0][0] ^ 1]) + p.c_B[0][1:]] + p.c_B[1:]),
        st, ins, outs)
    wrapped = [(p, Verifier(b"Shuffle", Transcript(b"ShuffleProof")),
                st, ins, outs) for p, st, ins, outs in bad]
    with pytest.raises(ValueError):
        batch_verify_shuffle_proofs(wrapped, backend="device-batched",
                                    seed=b"disp2")
