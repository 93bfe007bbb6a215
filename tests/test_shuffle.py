"""Shuffle argument tests: sub-arguments and the full shuffle proof.

Mirrors the reference's tests (src/shuffle/*.rs #[cfg(test)] modules),
including the deterministic b-vector golden test (shuffle.rs:949-976).
"""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.primitives.pedersen import vector_pedersen_gens
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.prover import Prover
from quisquis_tpu.accounts.verifier import Verifier
from quisquis_tpu.shuffle import vectorutil
from quisquis_tpu.shuffle.polynomial import (Polynomial, create_l_x_polynomial,
                                             create_l_i_x_polynomial)
from quisquis_tpu.shuffle.shuffle import (Shuffle, Permutation, ShuffleProof,
                                          create_b_b_dash)
from quisquis_tpu.shuffle.singlevalueproduct import SVPProof, SVPStatement
from quisquis_tpu.shuffle.product import ProductProof, columns

L = ex.L


def rng(tag=b"shuffle"):
    return SeededRng(seed=tag)


def make_accounts(r, n=9):
    out = []
    for _ in range(n):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# deterministic vector tests (bit-exactness anchors from the reference)
# ---------------------------------------------------------------------------

def test_exp_iter():
    assert vectorutil.exp_iter(2, 5) == [1, 2, 4, 8, 16]
    assert vectorutil.exp_iter(3, 3, skip=1) == [3, 9, 27]


def test_b_vector_golden():
    """shuffle.rs:949-976: x=3, perm [2,1,3,8,7,6,4,5,9] -> powers of 3."""
    r = rng()
    x = 3
    tau = [r.random_scalar() for _ in range(9)]
    perm = Permutation(r, 9)
    perm.set([2, 1, 3, 8, 7, 6, 4, 5, 9])
    exp_x = vectorutil.exp_iter(x, 9, skip=1)
    b, b_dash = create_b_b_dash(exp_x, tau, perm)
    assert b == [9, 3, 27, 6561, 2187, 729, 81, 243, 19683]
    # b' * tau == b  (shuffle.rs:929-948)
    assert [bd * t % L for bd, t in zip(b_dash, tau)] == b


def test_permutation_inverse():
    r = rng(b"perm")
    p = Permutation(r, 9)
    inv = p.invert_permutation()
    for i, v in enumerate(p.get_row_major()):
        assert inv[v - 1] == i + 1


def test_polynomial_engine():
    # (X-1)(X-2)(X-3) = X^3 - 6X^2 + 11X - 6
    p = create_l_x_polynomial([1, 2, 3])
    assert p.coefficients == [(-6) % L, 11, (-6) % L, 1]
    # division roundtrip
    q = Polynomial([5, 7, 1])  # X^2+7X+5
    prod = p.multiply(q)
    assert prod.divide(p) == q
    assert p.evaluate(5) == 4 * 3 * 2
    # Lagrange basis: l_i(w_j) = delta_ij
    w = [11, 22, 33]
    lvec = create_l_i_x_polynomial(w)
    for i in range(3):
        for j in range(3):
            assert lvec[i + 1].evaluate(w[j]) == (1 if i == j else 0)
        assert lvec[0].evaluate(w[i]) == 0


# ---------------------------------------------------------------------------
# sub-argument roundtrips
# ---------------------------------------------------------------------------

def test_svp_roundtrip():
    r = rng(b"svp")
    xpc = vector_pedersen_gens(4)
    a_vec = [r.random_scalar() for _ in range(3)]
    s = r.random_scalar()
    cb = xpc.commit(a_vec, s)
    b = 1
    for a in a_vec:
        b = b * a % L
    t = Transcript(b"SVP")
    prover = Prover(b"SVP", t, rng=r)
    proof = SVPProof.create_single_value_argument_proof(prover, xpc, s, a_vec)
    state = SVPStatement(ex.ristretto_encode(cb), b)
    t2 = Transcript(b"SVP")
    proof.verify(Verifier(b"SVP", t2), state, xpc)
    # negative: wrong product
    bad_state = SVPStatement(ex.ristretto_encode(cb), (b + 1) % L)
    t3 = Transcript(b"SVP")
    with pytest.raises(ValueError):
        proof.verify(Verifier(b"SVP", t3), bad_state, xpc)


def test_product_argument_roundtrip():
    r = rng(b"prod")
    xpc = vector_pedersen_gens(4)
    rows = [[r.random_scalar() for _ in range(3)] for _ in range(3)]
    witness_r = [r.random_scalar() for _ in range(3)]
    t = Transcript(b"Product")
    prover = Prover(b"Product", t, rng=r)
    proof, state = ProductProof.create_product_argument_proof(
        prover, rows, witness_r, xpc)
    cols = columns(rows)
    c_prod_A = [xpc.commit(cols[i], witness_r[i]) for i in range(3)]
    t2 = Transcript(b"Product")
    proof.verify(Verifier(b"Product", t2), state, c_prod_A, xpc)


# ---------------------------------------------------------------------------
# shuffle semantics + full proof
# ---------------------------------------------------------------------------

def test_input_shuffle_semantics():
    r = rng(b"insh")
    accounts = make_accounts(r)
    sh = Shuffle.input_shuffle(accounts, rng=r)
    # outputs = inputs updated with tau, rho (shuffle_input_update_test)
    updated = [Account.update_account(acc, 0, t, sh.rho)
               for acc, t in zip(accounts, sh.shuffled_tau)]
    assert sh.outputs == updated
    # permuting sh.inputs by pi returns the original vector
    perm = sh.pi.get_row_major()
    assert [sh.inputs[perm[i] - 1] for i in range(9)] == accounts


def test_output_shuffle_semantics():
    r = rng(b"outsh")
    accounts = make_accounts(r)
    sh = Shuffle.output_shuffle(accounts, rng=r)
    perm = sh.pi.get_row_major()
    shuffled = [accounts[perm[i] - 1] for i in range(9)]
    updated = [Account.update_account(acc, 0, t, sh.rho)
               for acc, t in zip(shuffled, sh.shuffled_tau)]
    assert sh.outputs == updated


def test_full_shuffle_proof_roundtrip():
    r = rng(b"fullshuffle")
    accounts = make_accounts(r)
    sh = Shuffle.input_shuffle(accounts, rng=r)

    tp = Transcript(b"ShuffleProof")
    prover = Prover(b"Shuffle", tp, rng=r)
    proof, statement = ShuffleProof.create_shuffle_proof(prover, sh, rng=r)

    tv = Transcript(b"ShuffleProof")
    verifier = Verifier(b"Shuffle", tv)
    proof.verify(verifier, statement, sh.get_inputs_vector(),
                 sh.get_outputs_vector())


def test_full_shuffle_proof_rejects_tampered_output():
    r = rng(b"tampershuffle")
    accounts = make_accounts(r)
    sh = Shuffle.input_shuffle(accounts, rng=r)
    tp = Transcript(b"ShuffleProof")
    prover = Prover(b"Shuffle", tp, rng=r)
    proof, statement = ShuffleProof.create_shuffle_proof(prover, sh, rng=r)
    # swap two outputs: proof must no longer verify
    outputs = sh.get_outputs_vector()
    outputs[0], outputs[1] = outputs[1], outputs[0]
    tv = Transcript(b"ShuffleProof")
    with pytest.raises(ValueError):
        proof.verify(Verifier(b"Shuffle", tv), statement,
                     sh.get_inputs_vector(), outputs)


def test_shuffle_proof_64_accounts():
    """Generalized 8x8 config (reference hard-codes 3x3; BASELINE config 5)."""
    r = rng(b"s64")
    accounts = make_accounts(r, 64)
    sh = Shuffle.input_shuffle(accounts, rng=r)
    tp = Transcript(b"ShuffleProof")
    prover = Prover(b"Shuffle", tp, rng=r)
    proof, statement = ShuffleProof.create_shuffle_proof(prover, sh, rng=r)
    tv = Transcript(b"ShuffleProof")
    proof.verify(Verifier(b"Shuffle", tv), statement,
                 sh.get_inputs_vector(), sh.get_outputs_vector())
