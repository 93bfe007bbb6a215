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


def test_prove_batch_device_matches_host():
    """RangeProof.prove_batch(backend='device-batched') returns the same
    bytes as the host loop AND leaves the host transcripts in the same
    state (so embedded protocols can continue past the proof)."""
    values, blindings, seeds = _lane_inputs(b"pbatch")
    lanes_h, lanes_d = [], []
    for i in range(B):
        th = Transcript(b"RangeProof")
        td = Transcript(b"RangeProof")
        lanes_h.append((th, values[i], blindings[i],
                        SeededRng(seed=seeds[i])))
        lanes_d.append((td, values[i], blindings[i],
                        SeededRng(seed=seeds[i])))
    host = RangeProof.prove_batch(lanes_h, N_BITS, backend="host")
    dev = RangeProof.prove_batch(lanes_d, N_BITS, backend="device-batched")
    for i in range(B):
        assert dev[i][1] == host[i][1], f"lane {i}: V differ"
        assert dev[i][0].to_bytes() == host[i][0].to_bytes(), \
            f"lane {i}: proof bytes differ"
        # transcripts advanced identically -> identical next challenge
        ch = lanes_h[i][0].get_challenge(b"post")
        cd = lanes_d[i][0].get_challenge(b"post")
        assert ch == cd, f"lane {i}: transcript state diverged"


def test_prove_batch_mixed_shapes():
    """Lanes of different aggregation sizes bucket into separate device
    programs and still come back in lane order."""
    rng = SeededRng(seed=b"pbatch-mix")
    lanes = []
    expect = []
    for i in range(3):
        m = 1 if i % 2 == 0 else 2
        vals = [10 + i] if m == 1 else [10 + i, 20 + i]
        blinds = [rng.random_scalar() for _ in range(m)]
        seed = b"mix-%d" % i
        lanes.append((Transcript(b"RangeProof"), vals, blinds,
                      SeededRng(seed=seed)))
        hp, hv = RangeProof.prove_multiple(
            Transcript(b"RangeProof"), vals, blinds, N_BITS,
            rng=SeededRng(seed=seed))
        expect.append((hp.to_bytes(), hv))
    out = RangeProof.prove_batch(lanes, N_BITS, backend="device-batched")
    for i in range(3):
        assert out[i][0].to_bytes() == expect[i][0]
        assert out[i][1] == expect[i][1]
