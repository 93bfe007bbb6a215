"""R1CS constraint system + range gadget tests.

Mirrors the reference's range_proof_test (rangeproof.rs:136-222).
"""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.rangeproof import (RangeProofProver,
                                              RangeProofVerifier)
from quisquis_tpu.bulletproofs.r1cs import (LinearCombination, R1CSProver,
                                            R1CSVerifier, R1CSProof)
from quisquis_tpu.primitives.pedersen import default_pedersen_gens

L = ex.L


def test_r1cs_simple_multiplication():
    """Prove knowledge of committed a, b with a*b = 391 (a=17, b=23)."""
    r = SeededRng(seed=b"r1cs-mul")
    tp = Transcript(b"MulProof")
    prover = R1CSProver(tp, rng=r)
    com_a, var_a = prover.commit(17, r.random_scalar())
    com_b, var_b = prover.commit(23, r.random_scalar())
    al, br, o = prover.allocate_multiplier((17, 23))
    prover.constrain(var_a - al)
    prover.constrain(var_b - br)
    prover.constrain(o - LinearCombination.constant_lc(391))
    proof = prover.prove()

    tv = Transcript(b"MulProof")
    verifier = R1CSVerifier(tv)
    va = verifier.commit(com_a)
    vb = verifier.commit(com_b)
    al, br, o = verifier.allocate_multiplier()
    verifier.constrain(va - al)
    verifier.constrain(vb - br)
    verifier.constrain(o - LinearCombination.constant_lc(391))
    verifier.verify(proof)

    # wrong public statement fails
    tv2 = Transcript(b"MulProof")
    verifier2 = R1CSVerifier(tv2)
    va = verifier2.commit(com_a)
    vb = verifier2.commit(com_b)
    al, br, o = verifier2.allocate_multiplier()
    verifier2.constrain(va - al)
    verifier2.constrain(vb - br)
    verifier2.constrain(o - LinearCombination.constant_lc(392))
    with pytest.raises(ValueError):
        verifier2.verify(proof)


def test_r1cs_range_proof_multi():
    """Four 64-bit range gadgets in one shared CS (rangeproof.rs:136-194)."""
    r = SeededRng(seed=b"r1cs-range")
    values = [156774839, 3564435674839, 674839, 67442545356456839]
    tp = Transcript(b"RangeProofTest")
    rp = RangeProofProver(tp, rng=r)
    coms = [rp.range_proof_prover(v, r.random_scalar()) for v in values]
    proof = rp.build_proof()
    assert proof.serialized_size() > 0

    tv = Transcript(b"RangeProofTest")
    rv = RangeProofVerifier(tv)
    for com in coms:
        rv.range_proof_verifier(com)
    rv.verify_proof(proof)

    # serde roundtrip
    tv2 = Transcript(b"RangeProofTest")
    rv2 = RangeProofVerifier(tv2)
    for com in coms:
        rv2.range_proof_verifier(com)
    rv2.verify_proof(R1CSProof.from_bytes(proof.to_bytes()))


def test_r1cs_range_proof_rejects_wrong_commitment():
    r = SeededRng(seed=b"r1cs-bad")
    tp = Transcript(b"RangeBad")
    rp = RangeProofProver(tp, rng=r)
    com = rp.range_proof_prover(12345, r.random_scalar())
    proof = rp.build_proof()
    pc = default_pedersen_gens()
    wrong = ex.ristretto_encode(pc.commit(12346, 777))
    tv = Transcript(b"RangeBad")
    rv = RangeProofVerifier(tv)
    rv.range_proof_verifier(wrong)
    with pytest.raises(ValueError):
        rv.verify_proof(proof)


def test_r1cs_range_proof_out_of_range_small_n():
    """300 needs 9 bits: honest prover can't build a valid 8-bit proof."""
    r = SeededRng(seed=b"r1cs-oob")
    tp = Transcript(b"Range8")
    rp = RangeProofProver(tp, rng=r)
    with pytest.raises(ValueError):
        rp.range_proof_prover(300, r.random_scalar(), n=8)
