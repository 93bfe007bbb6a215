"""Primitives layer tests: keys, ElGamal, Pedersen, zkSchnorr, accounts.

Mirrors the reference's unit tests (inline #[cfg(test)] modules of
src/ristretto/keys.rs, src/elgamal/elgamal.rs, src/accounts/accounts.rs,
src/pedersen/vectorpedersen.rs, src/transaction/signature.rs).
"""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import (RistrettoPublicKey, RistrettoSecretKey,
                                          BASE_PK_BTC)
from quisquis_tpu.primitives.elgamal import ElGamalCommitment
from quisquis_tpu.primitives.pedersen import (PedersenGens, VectorPedersenGens,
                                              default_pedersen_gens)
from quisquis_tpu.primitives.schnorr import Signature, VerificationKey
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import SeededRng


def rng(tag=b"test"):
    return SeededRng(seed=tag)


def keypair(r):
    sk = RistrettoSecretKey.random(r)
    return sk, RistrettoPublicKey.from_secret_key(sk, r)


def test_update_key():
    r = rng()
    sk, pk = keypair(r)
    updated = RistrettoPublicKey.update_public_key(pk, r.random_scalar())
    assert pk != updated


def test_verify_keypair_after_update():
    r = rng()
    sk, pk = keypair(r)
    updated = RistrettoPublicKey.update_public_key(pk, r.random_scalar())
    updated.verify_keypair(sk)  # must not raise
    other = RistrettoSecretKey.random(r)
    with pytest.raises(ValueError):
        updated.verify_keypair(other)


def test_verify_public_key_update():
    r = rng()
    _, pk = keypair(r)
    c = r.random_scalar()
    updated = RistrettoPublicKey.update_public_key(pk, c)
    assert RistrettoPublicKey.verify_public_key_update(updated, pk, c)
    assert not RistrettoPublicKey.verify_public_key_update(updated, pk, c + 1)


def test_base_pk_equals_pedersen_default():
    """Reference test src/ristretto/keys.rs:316-326."""
    base_pk = RistrettoPublicKey.generate_base_pk()
    pc = default_pedersen_gens()
    assert base_pk.gr == ex.ristretto_encode(pc.B)
    assert base_pk.grsk == ex.ristretto_encode(pc.B_blinding)
    assert (base_pk.gr, base_pk.grsk) == BASE_PK_BTC


def test_pk_serde():
    r = rng()
    _, pk = keypair(r)
    b = pk.as_bytes()
    assert len(b) == 64
    pk2 = RistrettoPublicKey.from_bytes(b)
    assert pk == pk2


def test_sk_from_bytes_hash_to_scalar():
    sk = RistrettoSecretKey.from_bytes(b"some seed material")
    assert 0 <= sk.scalar < ex.L
    assert RistrettoSecretKey.from_bytes(b"some seed material") == sk


def test_signature():
    r = rng()
    sk, pk = keypair(r)
    msg = b"This is a signing message"
    sig = pk.sign_msg(msg, sk, b"valueSign", rng=r)
    pk.verify_msg(msg, sig, b"valueSign")  # must not raise
    with pytest.raises(ValueError):
        pk.verify_msg(b"other message", sig, b"valueSign")
    with pytest.raises(ValueError):
        pk.verify_msg(msg, sig, b"otherLabel")


def test_signature_reference_vectors():
    """Mirrors sign_and_verify_single (signature.rs:187-209)."""
    privkey, rr = 1, 10987
    X = VerificationKey.from_secret(privkey, rr)
    from quisquis_tpu.accounts.transcript import Transcript
    sig = Signature.sign(Transcript(b"example transcript"), X, privkey, rng=rng())
    sig.verify(Transcript(b"example transcript"), X)
    X_bad = VerificationKey.from_secret(2, rr)
    with pytest.raises(ValueError):
        sig.verify(Transcript(b"example transcript"), X_bad)
    with pytest.raises(ValueError):
        sig.verify(Transcript(b"invalid transcript"), X)


def test_commitment_roundtrip():
    r = rng()
    sk, pk = keypair(r)
    comm = ElGamalCommitment.generate_commitment(pk, r.random_scalar(), 16)
    comm.verify_commitment(sk, 16)
    with pytest.raises(ValueError):
        comm.verify_commitment(sk, 17)
    # serde
    b = comm.to_bytes()
    assert ElGamalCommitment.from_bytes(b) == comm


def test_commitment_homomorphism():
    r = rng()
    sk, pk = keypair(r)
    c1 = ElGamalCommitment.generate_commitment(pk, r.random_scalar(), 16)
    c2 = ElGamalCommitment.generate_commitment(pk, r.random_scalar(), 26)
    added = ElGamalCommitment.add_commitments(c1, c2)
    added.verify_commitment(sk, 42)
    diff = added - c2
    diff.verify_commitment(sk, 16)
    doubled = c1 * 2
    doubled.verify_commitment(sk, 32)


def test_decommit_value():
    r = rng()
    sk, pk = keypair(r)
    comm = ElGamalCommitment.generate_commitment(pk, r.random_scalar(), 160000)
    assert comm.decommit_value(sk) == 160000
    assert comm.decommit(sk) == ex.ristretto_encode(ex.pt_base_mul(160000))


def test_vector_pedersen_chain():
    """Mirrors extended_pedersen_gen_test (vectorpedersen.rs:130-144)."""
    pc = default_pedersen_gens()
    gens = VectorPedersenGens(6)
    # manual chain
    manual = [pc.B_blinding]
    for i in range(4):
        manual.append(ex.hash_to_point_sha3_512(ex.ristretto_encode(manual[i])))
    expect = [pc.B_blinding, pc.B] + manual[1:]
    got = [gens.H] + gens.G_vec
    assert [ex.ristretto_encode(p) for p in got] == \
        [ex.ristretto_encode(p) for p in expect]


def test_vector_pedersen_commit():
    """Mirrors extended_commit_test (vectorpedersen.rs:145-161)."""
    gens = VectorPedersenGens(6)
    values = [2, 5, 7, 10, 3]
    c = gens.commit(values, 15)
    manual = ex.pt_mul(15, gens.H)
    for v, g in zip(values, gens.G_vec):
        manual = ex.pt_add(manual, ex.pt_mul(v, g))
    assert ex.pt_eq(c, manual)


# ---------------------------------------------------------------------------
# accounts
# ---------------------------------------------------------------------------

def test_account_verify_and_update():
    r = rng()
    sk, pk = keypair(r)
    acc, _ = Account.generate_account(pk, r)
    acc.verify_account(sk, 0)
    updated = Account.update_account(acc, 16, r.random_scalar(), r.random_scalar())
    updated.verify_account(sk, 16)
    assert updated.decrypt_account_balance(sk, 16) == \
        ex.ristretto_encode(ex.pt_base_mul(16))


def test_account_decrypt_value():
    r = rng()
    sk, pk = keypair(r)
    comm = ElGamalCommitment.generate_commitment(pk, r.random_scalar(), 16734)
    acc = Account.set_account(pk, comm)
    assert acc.decrypt_account_balance_value(sk) == 16734


def test_verify_account_update_batch():
    r = rng()
    accounts, updated, uks, gcs = [], [], [], []
    for _ in range(9):
        _, pk = keypair(r)
        acc, _ = Account.generate_account(pk, r)
        accounts.append(acc)
        u, g = r.random_scalar(), r.random_scalar()
        uks.append(u)
        gcs.append(g)
        updated.append(Account.update_account(acc, 0, u, g))
    assert Account.verify_account_update(updated, accounts, uks, gcs)
    assert not Account.verify_account_update(updated[::-1], accounts, uks, gcs)


def test_delta_epsilon_accounts():
    r = rng()
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [-5 % ex.L, 5, 0, 0, 0, 0, 0, 0, 0]
    accounts = []
    sks = []
    for _ in range(9):
        sk, pk = keypair(r)
        acc, _ = Account.generate_account(pk, r)
        accounts.append(Account.update_account(acc, 0, r.random_scalar(),
                                               r.random_scalar()))
        sks.append(sk)
    delta, epsilon, rscalars = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)
    assert sum(rscalars) % ex.L == 0
    updated_delta = Account.update_delta_accounts(accounts, delta)
    assert Account.verify_delta_update(updated_delta, delta, accounts)
    # delta accounts verify under the holder's sk with the delta value
    delta[1].comm.verify_commitment(sks[1], 5)
    # sum of epsilon commitments is the identity (values + rscalars sum to 0)
    total_c = epsilon[0].comm.c_point
    total_d = epsilon[0].comm.d_point
    for e in epsilon[1:]:
        total_c = ex.pt_add(total_c, e.comm.c_point)
        total_d = ex.pt_add(total_d, e.comm.d_point)
    assert ex.ristretto_encode(total_c) == b"\x00" * 32
    assert ex.ristretto_encode(total_d) == b"\x00" * 32


def test_delta_epsilon_nonzero_sum_not_identity():
    r = rng()
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [1, 2, 3]
    accounts = []
    for _ in range(3):
        _, pk = keypair(r)
        acc, _ = Account.generate_account(pk, r)
        accounts.append(acc)
    _, epsilon, _ = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)
    total_d = epsilon[0].comm.d_point
    for e in epsilon[1:]:
        total_d = ex.pt_add(total_d, e.comm.d_point)
    assert ex.ristretto_encode(total_d) != b"\x00" * 32


def test_malformed_inputs_rejected():
    r = rng(b"malformed")
    _, pk = keypair(r)
    with pytest.raises(ValueError):
        RistrettoPublicKey.from_bytes(b"\x00" * 63)
    with pytest.raises(ValueError):
        ElGamalCommitment.from_bytes(b"\x01" * 64)  # invalid points
    # non-canonical / invalid compressed point in pk decompression
    bad_pk = RistrettoPublicKey(b"\x01" * 32, b"\x02" * 32)
    with pytest.raises(ValueError):
        _ = bad_pk.gr_point
