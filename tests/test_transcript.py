"""Keccak / STROBE / Merlin transcript bit-exactness tests.

- Keccak permutation validated by rebuilding SHA3-256/512 and comparing with
  hashlib (independent implementation of the same function).
- Merlin pinned by the merlin crate's own equivalence test vector
  (merlin/src/transcript.rs `test_transcript_equivalence_simple`):
  protocol "test protocol", message ("some label", "some data"),
  32 challenge bytes == d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615.
"""

import hashlib
import os

from quisquis_tpu.ops import keccak as kk
from quisquis_tpu.accounts.transcript import Transcript


def test_sha3_matches_hashlib():
    for n in [0, 1, 71, 72, 73, 135, 136, 137, 200, 1000]:
        data = bytes(range(256))[:n] if n <= 256 else os.urandom(n)
        assert kk.sha3_256(data) == hashlib.sha3_256(data).digest()
        assert kk.sha3_512(data) == hashlib.sha3_512(data).digest()
        assert kk.shake256(data, 64) == hashlib.shake_256(data).digest(64)


def test_keccak256_legacy_padding():
    # Known Keccak-256 (legacy) vector: empty string
    assert kk.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_merlin_equivalence_vector():
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_complex_transcript():
    # structure of merlin's test_transcript_equivalence_complex: interleaved
    # appends and challenges must stay self-consistent and deterministic
    t1 = Transcript(b"test protocol")
    t2 = Transcript(b"test protocol")
    data = bytes([99] * 1024)
    for t in (t1, t2):
        t.append_message(b"step1", b"some data")
        for _ in range(4):
            t.challenge_bytes(b"challenge", 32)
            t.append_message(b"bigdata", data)
            t.append_message(b"challengedata", b"x" * 32)
    assert t1.challenge_bytes(b"final", 32) == t2.challenge_bytes(b"final", 32)


def test_transcript_rng_deterministic():
    def make():
        t = Transcript(b"witness rng")
        t.append_message(b"public", b"stuff")
        return (
            t.build_rng()
            .rekey_with_witness_bytes(b"witness", b"secret witness bytes")
            .finalize(entropy=b"\x01" * 32)
        )

    r1, r2 = make(), make()
    assert r1.fill_bytes(64) == r2.fill_bytes(64)
    assert r1.random_scalar() == r2.random_scalar()
    # different witness -> different stream
    t = Transcript(b"witness rng")
    t.append_message(b"public", b"stuff")
    r3 = t.build_rng().rekey_with_witness_bytes(b"witness", b"other").finalize(
        entropy=b"\x01" * 32
    )
    assert r3.fill_bytes(64) != make().fill_bytes(64)


def test_get_challenge_scalar():
    from quisquis_tpu.ops import exact as ex

    t = Transcript(b"test protocol")
    t.append_scalar_var(b"x", 42)
    c = t.get_challenge(b"c")
    assert 0 <= c < ex.L
    t2 = Transcript(b"test protocol")
    t2.append_scalar_var(b"x", 42)
    assert t2.get_challenge(b"c") == c


def test_native_strobe_matches_python():
    """C++ STROBE (native/qq_native.cpp) must be bit-identical to Python."""
    from quisquis_tpu.utils import native
    if not native.available():
        import pytest
        pytest.skip("native library not built")
    from quisquis_tpu.ops.strobe import Strobe128 as Py

    a, b = Py(b"equivalence"), native.NativeStrobe128(b"equivalence")
    for i in range(10):
        data = bytes([i]) * (i * 37 + 1)
        a.meta_ad(b"label", False)
        b.meta_ad(b"label", False)
        a.ad(data, False)
        b.ad(data, False)
        if i % 3 == 0:
            a.key(data[:32].ljust(32, b"\0"), False)
            b.key(data[:32].ljust(32, b"\0"), False)
        assert a.prf(48, False) == b.prf(48, False)
