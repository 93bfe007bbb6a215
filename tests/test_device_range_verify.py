"""On-device batched range-proof verification vs the host verifier."""

import numpy as np
import pytest

from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.bulletproofs.range_proof import RangeProof
from quisquis_tpu.bulletproofs.device_verify import DeviceRangeVerifier

N_BITS = 8
M = 2
B = 3


def make_batch(tag: bytes):
    rng = SeededRng(seed=tag)
    proofs, vlists = [], []
    for i in range(B):
        values = [i + 1, 200 + i]
        blind = [rng.random_scalar() for _ in range(M)]
        proof, V = RangeProof.prove_multiple(
            Transcript(b"RangeProof"), values, blind, N_BITS, rng=rng)
        proofs.append(proof)
        vlists.append(V)
    return proofs, vlists


def test_device_accepts_valid_batch():
    proofs, vlists = make_batch(b"drv-ok")
    drv = DeviceRangeVerifier(N_BITS, M, B)
    drv.verify(proofs, vlists, rng=SeededRng(seed=b"w"))
    # host agrees
    for proof, V in zip(proofs, vlists):
        proof.verify_multiple(Transcript(b"RangeProof"), V, N_BITS)


def test_device_rejects_tampered_proof():
    drv = DeviceRangeVerifier(N_BITS, M, B)
    rng = SeededRng(seed=b"w2")

    # tamper each component class in turn: a compressed point, a scalar,
    # an IPP element, and a value commitment
    def tamper(mutate):
        proofs, vlists = make_batch(b"drv-bad")
        blob = bytearray(proofs[1].to_bytes())
        vl = [list(v) for v in vlists]
        mutate(blob, vl)
        proofs[1] = RangeProof.from_bytes(bytes(blob))
        with pytest.raises(ValueError):
            drv.verify(proofs, [tuple(v) for v in vl], rng=rng)

    tamper(lambda b, v: b.__setitem__(3, b[3] ^ 1))          # A point
    tamper(lambda b, v: b.__setitem__(130, b[130] ^ 1))      # t_x scalar
    tamper(lambda b, v: b.__setitem__(226, b[226] ^ 1))      # ipp L point
    tamper(lambda b, v: v[1].__setitem__(
        0, bytes([v[1][0][0] ^ 1]) + v[1][0][1:]))           # V commitment


def test_device_rejects_wrong_value_binding():
    # swap two proofs' value commitments: transcripts diverge -> reject
    proofs, vlists = make_batch(b"drv-swap")
    drv = DeviceRangeVerifier(N_BITS, M, B)
    swapped = [vlists[1], vlists[0], vlists[2]]
    with pytest.raises(ValueError):
        drv.verify(proofs, swapped, rng=SeededRng(seed=b"w3"))


def test_device_with_prefixed_transcripts():
    """Proofs living inside a larger protocol: the host replays the prefix,
    the device continues from the shipped STROBE states."""
    rng = SeededRng(seed=b"drv-prefix")
    proofs, vlists, prefixes = [], [], []
    for i in range(B):
        t = Transcript(b"QuisQuisProof")
        t.append_message(b"ctx", bytes([i]) * 16)
        tv = t.clone()
        blind = [rng.random_scalar() for _ in range(M)]
        proof, V = RangeProof.prove_multiple(t, [i, i + 7],
                                             blind, N_BITS, rng=rng)
        proofs.append(proof)
        vlists.append(V)
        prefixes.append(tv)
    drv = DeviceRangeVerifier(N_BITS, M, B)
    drv.verify(proofs, vlists, transcripts=prefixes,
               rng=SeededRng(seed=b"w4"))
    # wrong prefix -> reject
    bad = [Transcript(b"QuisQuisProof") for _ in range(B)]
    for i, t in enumerate(bad):
        t.append_message(b"ctx", bytes([i + 1]) * 16)
    with pytest.raises(ValueError):
        drv.verify(proofs, vlists, transcripts=bad,
                   rng=SeededRng(seed=b"w5"))


def test_batch_verify_device_batched_dispatch():
    """RangeProof.batch_verify(backend="device-batched") groups by
    aggregation width, pads to lane buckets, and matches the host verdict."""
    rng = SeededRng(seed=b"disp")
    instances = []
    # three m=2 proofs (pads to 4 lanes) and one m=1 proof (own group)
    proofs, vlists = make_batch(b"disp-m2")
    for p, V in zip(proofs, vlists):
        instances.append((p, V, Transcript(b"RangeProof")))
    p1, V1 = RangeProof.prove_multiple(
        Transcript(b"RangeProof"), [42], [rng.random_scalar()], N_BITS,
        rng=rng)
    instances.append((p1, V1, Transcript(b"RangeProof")))
    RangeProof.batch_verify(instances, N_BITS, rng=rng,
                            backend="device-batched")

    # a tampered scalar in the m=1 group rejects through the dispatch path
    blob = bytearray(p1.to_bytes())
    blob[130] ^= 1
    bad = RangeProof.from_bytes(bytes(blob))
    instances[-1] = (bad, V1, Transcript(b"RangeProof"))
    with pytest.raises(ValueError):
        RangeProof.batch_verify(instances, N_BITS, rng=rng,
                                backend="device-batched")
