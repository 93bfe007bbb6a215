"""On-device batched range-proof PROVING vs the host prover, byte-for-byte.

Byte-identity under a pinned RNG stream is the strongest possible parity
statement: every compressed point (V, A, S, T1, T2, all IPP L/R), every
response scalar, and therefore every Fiat-Shamir challenge of the device
prover must match the host prover exactly.
"""

import pytest

from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs.range_proof import RangeProof
from quisquis_tpu.bulletproofs.device_prove import DeviceRangeProver

N_BITS = 8
M = 2
B = 3


def _lane_inputs(tag: bytes):
    rng = SeededRng(seed=tag)
    values, blindings, seeds = [], [], []
    for i in range(B):
        values.append([i + 1, 200 + i])
        blindings.append([rng.random_scalar() for _ in range(M)])
        seeds.append(tag + b"-lane-%d" % i)
    return values, blindings, seeds


def test_device_prove_matches_host_bytes():
    values, blindings, seeds = _lane_inputs(b"dprove")
    drp = DeviceRangeProver(N_BITS, M, B)
    proofs, vlists = drp.prove(values, blindings,
                               rngs=[SeededRng(seed=s) for s in seeds])
    for i in range(B):
        host_proof, host_V = RangeProof.prove_multiple(
            Transcript(b"RangeProof"), values[i], blindings[i], N_BITS,
            rng=SeededRng(seed=seeds[i]))
        assert vlists[i] == host_V, f"lane {i}: V commitments differ"
        assert proofs[i].to_bytes() == host_proof.to_bytes(), \
            f"lane {i}: proof bytes differ"
        # and the proof verifies standalone
        proofs[i].verify_multiple(Transcript(b"RangeProof"), vlists[i],
                                  N_BITS)


def test_device_prove_prefixed_transcripts():
    """Proofs embedded in a larger protocol: per-lane host prefixes."""
    values, blindings, seeds = _lane_inputs(b"dprove-pfx")
    prefixes = []
    for i in range(B):
        t = Transcript(b"QuisQuisProof")
        t.append_message(b"ctx", bytes([i]) * 8)
        prefixes.append(t)
    drp = DeviceRangeProver(N_BITS, M, B)
    proofs, vlists = drp.prove(values, blindings,
                               rngs=[SeededRng(seed=s) for s in seeds],
                               transcripts=[t.clone() for t in prefixes])
    for i in range(B):
        th = prefixes[i].clone()
        host_proof, host_V = RangeProof.prove_multiple(
            th, values[i], blindings[i], N_BITS,
            rng=SeededRng(seed=seeds[i]))
        assert proofs[i].to_bytes() == host_proof.to_bytes()
        assert vlists[i] == host_V
        # verification with the same prefix accepts
        tv = prefixes[i].clone()
        proofs[i].verify_multiple(tv, vlists[i], N_BITS)


def test_device_prove_rejects_out_of_range():
    drp = DeviceRangeProver(N_BITS, M, B)
    values, blindings, seeds = _lane_inputs(b"dprove-oor")
    values[1][0] = 1 << N_BITS
    with pytest.raises(ValueError, match="out of range"):
        drp.prove(values, blindings,
                  rngs=[SeededRng(seed=s) for s in seeds])
