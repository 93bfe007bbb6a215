"""Bulletproofs range proof + inner-product argument tests."""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs.inner_product import InnerProductProof
from quisquis_tpu.bulletproofs.range_proof import RangeProof
from quisquis_tpu.bulletproofs.generators import bulletproof_gens
from quisquis_tpu.primitives.pedersen import default_pedersen_gens

L = ex.L


def test_ipp_roundtrip():
    r = SeededRng(seed=b"ipp")
    n = 8
    bp = bulletproof_gens(n, 1)
    G, H = bp.G(n, 1), bp.H(n, 1)
    pc = default_pedersen_gens()
    Q = ex.pt_mul(7, pc.B)
    a = [r.random_scalar() for _ in range(n)]
    b = [r.random_scalar() for _ in range(n)]
    y_inv = ex.sc_invert(r.random_scalar())
    H_factors = [pow(y_inv, i, L) for i in range(n)]
    G_factors = [1] * n
    c = sum(x * y for x, y in zip(a, b)) % L
    # P = <a, G> + <b, H'> + c Q
    P = ex.pt_msm(
        a + [b[i] * H_factors[i] % L for i in range(n)] + [c],
        G + H + [Q])
    t = Transcript(b"ipptest")
    proof = InnerProductProof.create(t, Q, G_factors, H_factors, G, H, a, b)
    t2 = Transcript(b"ipptest")
    proof.verify(n, t2, G_factors, H_factors, P, Q, G, H)
    # serde
    rp = InnerProductProof.from_bytes(proof.to_bytes())
    t3 = Transcript(b"ipptest")
    rp.verify(n, t3, G_factors, H_factors, P, Q, G, H)
    # negative
    bad = InnerProductProof(proof.L_vec, proof.R_vec, (proof.a + 1) % L, proof.b)
    t4 = Transcript(b"ipptest")
    with pytest.raises(ValueError):
        bad.verify(n, t4, G_factors, H_factors, P, Q, G, H)


def test_range_proof_single():
    r = SeededRng(seed=b"rp1")
    t = Transcript(b"doctest example")
    proof, V = RangeProof.prove_single(t, 2**32 - 7, r.random_scalar(), 64, rng=r)
    t2 = Transcript(b"doctest example")
    proof.verify_single(t2, V, 64)


def test_range_proof_aggregated():
    r = SeededRng(seed=b"rp4")
    values = [5, 3, 0, 2**64 - 1]
    blindings = [r.random_scalar() for _ in values]
    t = Transcript(b"AggregatedRangeProofTest")
    proof, V = RangeProof.prove_multiple(t, values, blindings, 64, rng=r)
    t2 = Transcript(b"AggregatedRangeProofTest")
    proof.verify_multiple(t2, V, 64)
    # serde roundtrip
    restored = RangeProof.from_bytes(proof.to_bytes())
    t3 = Transcript(b"AggregatedRangeProofTest")
    restored.verify_multiple(t3, V, 64)


def test_range_proof_out_of_range_fails():
    r = SeededRng(seed=b"rp8")
    # a value >= 2^8 cannot be proven in 8 bits: the prover refuses at
    # proving time (the bit decomposition would silently truncate while V
    # commits the full value, emitting an unverifiable proof)
    t = Transcript(b"small range")
    with pytest.raises(ValueError, match="out of range"):
        RangeProof.prove_single(t, 300, r.random_scalar(), 8, rng=r)


def test_range_proof_wrong_commitment_fails():
    r = SeededRng(seed=b"rpw")
    t = Transcript(b"wrongV")
    proof, V = RangeProof.prove_single(t, 17, r.random_scalar(), 64, rng=r)
    pc = default_pedersen_gens()
    wrong_V = ex.ristretto_encode(pc.commit(18, 12345))
    t2 = Transcript(b"wrongV")
    with pytest.raises(ValueError):
        proof.verify_single(t2, wrong_V, 64)


def test_range_proof_transcript_chaining():
    """Proof bound to transcript state: different prefix must fail."""
    r = SeededRng(seed=b"chain")
    t = Transcript(b"chained")
    t.append_message(b"prefix", b"state1")
    proof, V = RangeProof.prove_single(t, 99, r.random_scalar(), 64, rng=r)
    t2 = Transcript(b"chained")
    t2.append_message(b"prefix", b"state2")
    with pytest.raises(ValueError):
        proof.verify_single(t2, V, 64)


def test_batch_verify_many_proofs():
    """Cross-proof batch verification (yoloproofs behavior): one MSM."""
    r = SeededRng(seed=b"bv")
    instances = []
    for i in range(4):
        m = 2 if i % 2 else 1
        vals = [r.random_scalar() % 2**64 for _ in range(m)]
        blinds = [r.random_scalar() for _ in range(m)]
        t = Transcript(b"rp%d" % i)
        proof, V = RangeProof.prove_multiple(t, vals, blinds, 64, rng=r)
        instances.append((proof, V))
    RangeProof.batch_verify(
        [(p, V, Transcript(b"rp%d" % i))
         for i, (p, V) in enumerate(instances)], 64, rng=r)
    # serde roundtrip through the batch path
    instances2 = [(RangeProof.from_bytes(p.to_bytes()), V)
                  for p, V in instances]
    RangeProof.batch_verify(
        [(p, V, Transcript(b"rp%d" % i))
         for i, (p, V) in enumerate(instances2)], 64, rng=r)
    # one bad proof poisons the whole batch
    import dataclasses
    bad3 = dataclasses.replace(instances[3][0],
                               t_x=(instances[3][0].t_x + 1) % L)
    poisoned = [(bad3 if i == 3 else p, V) for i, (p, V) in enumerate(instances)]
    with pytest.raises(ValueError):
        RangeProof.batch_verify(
            [(p, V, Transcript(b"rp%d" % i))
             for i, (p, V) in enumerate(poisoned)], 64, rng=r)
