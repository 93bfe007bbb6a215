"""Prove -> verify round-trips for every sigma protocol.

Mirrors the reference's verifier tests (src/accounts/verifier.rs:938-1523),
generalized and with negative cases.
"""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.primitives.elgamal import ElGamalCommitment
from quisquis_tpu.primitives.pedersen import default_pedersen_gens
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.prover import Prover, SigmaProof
from quisquis_tpu.accounts.verifier import Verifier

L = ex.L


def rng(tag=b"sigma"):
    return SeededRng(seed=tag)


def make_updated_accounts(r, n=9, value=0):
    accounts, sks = [], []
    for _ in range(n):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        accounts.append(Account.update_account(acc, value, r.random_scalar(),
                                               r.random_scalar()))
        sks.append(sk)
    return accounts, sks


def test_delta_compact_roundtrip():
    r = rng()
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [(-5) % L, 5, 0, 0, 0, 0, 0, 0, 0]
    accounts, _ = make_updated_accounts(r)
    delta, epsilon, rscalars = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)

    t = Transcript(b"DeltaCompact")
    prover = Prover(b"DLEQProof", t, rng=r)
    proof = Prover.verify_delta_compact_prover(delta, epsilon, rscalars,
                                               values, prover)
    zv, zr1, zr2, x = proof.get_dleq()

    t2 = Transcript(b"DeltaCompact")
    verifier = Verifier(b"DLEQProof", t2)
    Verifier.verify_delta_compact_verifier(delta, epsilon, zv, zr1, zr2, x,
                                           verifier)
    # epsilon identity check
    Verifier.verify_delta_identity_check(epsilon)
    # negative: wrong challenge
    t3 = Transcript(b"DeltaCompact")
    verifier3 = Verifier(b"DLEQProof", t3)
    with pytest.raises(ValueError):
        Verifier.verify_delta_compact_verifier(delta, epsilon, zv, zr1, zr2,
                                               (x + 1) % L, verifier3)


def test_update_account_roundtrip():
    r = rng(b"upd")
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [(-5) % L, 5, 0, 0, 0, 0, 0, 0, 0]
    accounts, _ = make_updated_accounts(r)
    delta, _, rscalars = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)
    updated_delta = Account.update_delta_accounts(accounts, delta)

    # anonymity set: indices 2..9 (value 0)
    acc_slice = accounts[2:9]
    delta_slice = updated_delta[2:9]
    rs_slice = rscalars[2:9]

    t = Transcript(b"UpdateAccount")
    prover = Prover(b"DLOGProof", t, rng=r)
    proof = Prover.verify_update_account_prover(acc_slice, delta_slice,
                                                rs_slice, prover)
    z, x = proof.get_dlog()
    assert len(z) == 7  # all 7 anonymity accounts detected

    t2 = Transcript(b"UpdateAccount")
    verifier = Verifier(b"DLOGProof", t2)
    Verifier.verify_update_account_verifier(acc_slice, delta_slice, z, x,
                                            verifier)
    # negative
    t3 = Transcript(b"UpdateAccount")
    with pytest.raises(ValueError):
        Verifier.verify_update_account_verifier(
            acc_slice, delta_slice, [(zz + 1) % L for zz in z], x,
            Verifier(b"DLOGProof", t3))


def test_account_prover_roundtrip():
    r = rng(b"acct")
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [(-5) % L, (-3) % L, 5, 3, 0, 0, 0, 0, 0]
    accounts, sks = [], []
    for _ in range(9):
        acc, sk = Account.generate_random_account_with_value(10, r)
        accounts.append(acc)
        sks.append(sk)
    delta, _, _ = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)
    updated_delta = Account.update_delta_accounts(accounts, delta)

    senders = updated_delta[:2]
    sender_bl = [10 - 5, 10 - 3]
    sender_sks = sks[:2]

    t = Transcript(b"SenderAccount")
    prover = Prover(b"DLEQProof", t, rng=r)
    epsilons, eps_rscalars, proof = Prover.verify_account_prover(
        senders, sender_bl, sender_sks, prover, base_pk)
    zv, zsk, zr, x = proof.get_dleq()

    t2 = Transcript(b"SenderAccount")
    verifier = Verifier(b"DLEQProof", t2)
    Verifier.verify_account_verifier_bulletproof(
        senders, epsilons, base_pk, zv, zsk, zr, x, verifier)
    # the emitted epsilon accounts commit the claimed balances
    for eps, bl, rs in zip(epsilons, sender_bl, eps_rscalars):
        expected = ElGamalCommitment.generate_commitment(base_pk, rs, bl)
        assert eps.comm == expected
    # negative: wrong sk response
    t3 = Transcript(b"SenderAccount")
    with pytest.raises(ValueError):
        Verifier.verify_account_verifier_bulletproof(
            senders, epsilons, base_pk, zv, [(z + 1) % L for z in zsk], zr, x,
            Verifier(b"DLEQProof", t3))


def test_zero_balance_single_roundtrip():
    r = rng(b"zb")
    base_pk = RistrettoPublicKey.generate_base_pk()
    pk = RistrettoPublicKey.update_public_key(
        RistrettoPublicKey.update_public_key(base_pk, r.random_scalar()),
        r.random_scalar())
    acc, comm_r = Account.generate_account(pk, r)

    t = Transcript(b"ZeroBalanceAccount")
    prover = Prover(b"DLOGProof", t, rng=r)
    z, x = Prover.zero_balance_account_prover(acc, comm_r, prover).get_dlog()

    t2 = Transcript(b"ZeroBalanceAccount")
    Verifier.zero_balance_account_verifier(acc, z[0], x,
                                           Verifier(b"DLOGProof", t2))


def test_zero_balance_vector_roundtrip_and_negative():
    r = rng(b"zbv")
    base_pk = RistrettoPublicKey.generate_base_pk()
    key = RistrettoPublicKey.update_public_key(base_pk, r.random_scalar())
    accounts, rscalars = [], []
    for _ in range(4):
        acc, cr = Account.generate_account(
            RistrettoPublicKey.update_public_key(key, r.random_scalar()), r)
        key = RistrettoPublicKey.update_public_key(key, r.random_scalar())
        accounts.append(acc)
        rscalars.append(cr)

    t = Transcript(b"ZeroBalanceAccount")
    prover = Prover(b"DLOGProof", t, rng=r)
    z, x = Prover.zero_balance_account_vector_prover(accounts, rscalars,
                                                     prover).get_dlog()
    t2 = Transcript(b"ZeroBalanceAccount")
    Verifier.zero_balance_account_vector_verifier(
        accounts, z, x, Verifier(b"DLOGProof", t2))

    # negative: append account whose rscalar the prover doesn't know
    # (mirrors zero_balance_account_vector_verifier_fail_test)
    bad_accounts = list(accounts)
    c_scalar = r.random_scalar()
    bad_accounts.append(Account(
        base_pk, ElGamalCommitment.generate_commitment(base_pk, c_scalar, 0)))
    bad_rscalars = rscalars + [rscalars[0]]
    t3 = Transcript(b"ZeroBalanceAccount")
    prover3 = Prover(b"DLOGProof", t3, rng=r)
    z3, x3 = Prover.zero_balance_account_vector_prover(
        bad_accounts, bad_rscalars, prover3).get_dlog()
    t4 = Transcript(b"ZeroBalanceAccount")
    with pytest.raises(ValueError):
        Verifier.zero_balance_account_vector_verifier(
            bad_accounts, z3, x3, Verifier(b"DLOGProof", t4))


def test_destroy_account_roundtrip():
    r = rng(b"destroy")
    zero_accounts, sk_vec = [], []
    for _ in range(4):
        acc, sk = Account.generate_random_account_with_value(0, r)
        zero_accounts.append(acc)
        sk_vec.append(sk)
    t = Transcript(b"DestroyAccount")
    prover = Prover(b"DLOGProof", t, rng=r)
    z, x = Prover.destroy_account_prover(zero_accounts, sk_vec, prover).get_dlog()
    t2 = Transcript(b"DestroyAccount")
    Verifier.destroy_account_verifier(zero_accounts, z, x,
                                      Verifier(b"DLOGProof", t2))
    # negative: nonzero balance account
    bad, bad_sk = Account.generate_random_account_with_value(7, r)
    t3 = Transcript(b"DestroyAccount")
    prover3 = Prover(b"DLOGProof", t3, rng=r)
    z3, x3 = Prover.destroy_account_prover(
        zero_accounts[:3] + [bad], sk_vec[:3] + [bad_sk], prover3).get_dlog()
    t4 = Transcript(b"DestroyAccount")
    with pytest.raises(ValueError):
        Verifier.destroy_account_verifier(
            zero_accounts[:3] + [bad], z3, x3, Verifier(b"DLOGProof", t4))


def test_same_value_roundtrip_and_tamper():
    r = rng(b"sv")
    sk = RistrettoSecretKey.random(r)
    pk = RistrettoPublicKey.from_secret_key(sk, r)
    value, rscalar = 57, r.random_scalar()
    comm = ElGamalCommitment.generate_commitment(pk, rscalar, value)
    acc = Account.set_account(pk, comm)
    pc = default_pedersen_gens()
    ped = ex.ristretto_encode(pc.commit(value, rscalar))

    proof = Prover.same_value_compact_prover(acc, rscalar, value, ped, rng=r)
    Verifier.verify_same_value_compact_verifier(acc, ped, proof)

    # tampered proof (mirrors verifier.rs:1754-1775)
    zv, zr1, zr2, x = proof.get_dleq()
    bad = SigmaProof.dleq([(zv[0] + 1) % L], zr1, zr2, x)
    with pytest.raises(ValueError):
        Verifier.verify_same_value_compact_verifier(acc, ped, bad)


def test_dark_tx_update_roundtrip():
    r = rng(b"dark")
    accounts, _ = make_updated_accounts(r, n=5, value=3)
    pk_rscalar = r.random_scalar()
    comm_rscalar = r.random_scalar()
    outputs = []
    for acc in accounts:
        # pk' = pk * pk_rscalar ; comm' = comm + pk * comm_rscalar (0 balance)
        new_pk = RistrettoPublicKey.update_public_key(acc.pk, pk_rscalar)
        zero_comm = ElGamalCommitment.generate_commitment(acc.pk, comm_rscalar, 0)
        outputs.append(Account(
            new_pk, ElGamalCommitment.add_commitments(acc.comm, zero_comm)))

    t = Transcript(b"DarkTx")
    prover = Prover(b"DLOGProof", t, rng=r)
    proof = Prover.verify_update_account_dark_tx_prover(
        accounts, outputs, pk_rscalar, comm_rscalar, prover)
    z, x = proof.get_dlog()
    t2 = Transcript(b"DarkTx")
    Verifier.verify_update_account_dark_tx_verifier(
        accounts, outputs, z, x, Verifier(b"DLOGProof", t2))
    # negative: tampered z
    t3 = Transcript(b"DarkTx")
    with pytest.raises(ValueError):
        Verifier.verify_update_account_dark_tx_verifier(
            accounts, outputs, [(z[0] + 1) % L, z[1]], x,
            Verifier(b"DLOGProof", t3))
