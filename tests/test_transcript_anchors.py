"""First-principles transcript anchors (VERDICT r2 item 6).

The Fiat–Shamir layer is pinned at three depths so that a framing bug is
diagnosable to the layer that drifted, not just "a pin moved":

1. An in-test Keccak-f[1600] written directly from FIPS-202 (round
   constants from the spec LFSR, rotation offsets from the triangular-
   number schedule, pi from (x,y) -> (y, 2x+3y)) — independent of
   ops/keccak.py and the C++ backend.
2. An in-test STROBE-128 lite duplex written from the STROBE v1.0.2 spec
   (init block [1, R+2, 1, 0, 1, 96] ++ "STROBEv1.0.2", framing byte pair
   (pos_begin, flags), C-flagged runs force a permutation) — independent
   of ops/strobe.py.
3. The merlin v2 framing (meta_ad(label), meta_ad(LE32(len), more),
   ad(msg)) and the library's own label schedules: the IPP round-0
   challenge and a sigma-protocol account append are recomputed from raw
   frames and must equal what accounts.transcript.Transcript produces.

Plus pinned golden challenges for each of the 9 sigma protocols
(prover.rs:120-951 equivalents) under seeded randomness: any change in a
protocol's label/append order fails exactly that protocol's pin.
"""

import hashlib

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.accounts.transcript import Transcript

L = ex.L
M64 = (1 << 64) - 1


# --- layer 1: Keccak-f[1600] from FIPS-202 ---------------------------------

def _rotl(v, n):
    n %= 64
    return ((v << n) | (v >> (64 - n))) & M64 if n else v


def _keccak_f1600(state: bytearray) -> None:
    lanes = [[int.from_bytes(state[8 * (x + 5 * y):8 * (x + 5 * y) + 8],
                             "little") for y in range(5)] for x in range(5)]
    R = 1
    for _ in range(24):
        # theta
        C = [lanes[x][0] ^ lanes[x][1] ^ lanes[x][2] ^ lanes[x][3]
             ^ lanes[x][4] for x in range(5)]
        D = [C[(x + 4) % 5] ^ _rotl(C[(x + 1) % 5], 1) for x in range(5)]
        lanes = [[lanes[x][y] ^ D[x] for y in range(5)] for x in range(5)]
        # rho and pi
        (x, y) = (1, 0)
        current = lanes[x][y]
        for t in range(24):
            (x, y) = (y, (2 * x + 3 * y) % 5)
            (current, lanes[x][y]) = (lanes[x][y],
                                      _rotl(current, (t + 1) * (t + 2) // 2))
        # chi
        for y in range(5):
            T = [lanes[x][y] for x in range(5)]
            for x in range(5):
                lanes[x][y] = T[x] ^ ((~T[(x + 1) % 5]) & T[(x + 2) % 5])
        # iota: round constant bits from the spec LFSR x^8+x^6+x^5+x^4+1
        for j in range(7):
            R = ((R << 1) ^ ((R >> 7) * 0x71)) % 256
            if R & 2:
                lanes[0][0] ^= 1 << ((1 << j) - 1)
    for x in range(5):
        for y in range(5):
            state[8 * (x + 5 * y):8 * (x + 5 * y) + 8] = \
                lanes[x][y].to_bytes(8, "little")


def test_keccak_f1600_against_sha3():
    """Validate the in-test permutation against hashlib's SHA3-256 (an
    external anchor: SHA3-256(m) for |m| < rate is one padded permutation)."""
    msg = b"independent keccak anchor"
    rate = 136  # SHA3-256
    st = bytearray(200)
    block = bytearray(rate)
    block[:len(msg)] = msg
    block[len(msg)] ^= 0x06
    block[rate - 1] ^= 0x80
    for i in range(rate):
        st[i] ^= block[i]
    _keccak_f1600(st)
    assert bytes(st[:32]) == hashlib.sha3_256(msg).digest()


# --- layer 2: STROBE-128 lite from the spec ---------------------------------

_R = 166  # STROBE-128 rate over keccak-f[1600] minus the 2 framing bytes
_FLAG_I, _FLAG_A, _FLAG_C, _FLAG_M = 1, 1 << 1, 1 << 2, 1 << 4


class _RefStrobe:
    def __init__(self, protocol: bytes):
        st = bytearray(200)
        st[0:6] = bytes([1, _R + 2, 1, 0, 1, 96])
        st[6:18] = b"STROBEv1.0.2"
        _keccak_f1600(st)
        self.st, self.pos, self.begin, self.flags = st, 0, 0, 0
        self.meta_ad(protocol, False)

    def _f(self):
        self.st[self.pos] ^= self.begin
        self.st[self.pos + 1] ^= 0x04
        self.st[_R + 1] ^= 0x80
        _keccak_f1600(self.st)
        self.pos = self.begin = 0

    def _absorb(self, data: bytes):
        for b in data:
            self.st[self.pos] ^= b
            self.pos += 1
            if self.pos == _R:
                self._f()

    def _begin(self, flags: int, more: bool):
        if more:
            assert flags == self.flags
            return
        old = self.begin
        self.begin = self.pos + 1
        self.flags = flags
        self._absorb(bytes([old, flags]))
        if flags & _FLAG_C and self.pos != 0:
            self._f()

    def meta_ad(self, d: bytes, more: bool):
        self._begin(_FLAG_M | _FLAG_A, more)
        self._absorb(d)

    def ad(self, d: bytes, more: bool):
        self._begin(_FLAG_A, more)
        self._absorb(d)

    def prf(self, n: int) -> bytes:
        self._begin(_FLAG_I | _FLAG_A | _FLAG_C, False)
        out = bytearray()
        for _ in range(n):
            out.append(self.st[self.pos])
            self.st[self.pos] = 0
            self.pos += 1
            if self.pos == _R:
                self._f()
        return bytes(out)


class _RefMerlin:
    """merlin v2 framing over the in-test STROBE."""

    def __init__(self, label: bytes):
        self.s = _RefStrobe(b"Merlin v1.0")
        self.append(b"dom-sep", label)

    def append(self, label: bytes, msg: bytes):
        self.s.meta_ad(label, False)
        self.s.meta_ad(len(msg).to_bytes(4, "little"), True)
        self.s.ad(msg, False)

    def challenge(self, label: bytes) -> int:
        self.s.meta_ad(label, False)
        self.s.meta_ad((64).to_bytes(4, "little"), True)
        return int.from_bytes(self.s.prf(64), "little") % L


# --- layer 3: library schedules from raw frames -----------------------------

def test_ipp_round0_challenge_from_first_principles():
    """The IPP round-0 challenge recomputed from raw Keccak/STROBE frames
    equals the library transcript's (framing schedule of
    bulletproofs/inner_product.py verification_scalars)."""
    Lb = bytes(range(32))
    Rb = bytes(range(32, 64))
    ref = _RefMerlin(b"ipp-anchor")
    ref.append(b"dom-sep", b"ipp v1")
    ref.append(b"n", (64).to_bytes(8, "little"))
    ref.append(b"L", Lb)
    ref.append(b"R", Rb)
    want = ref.challenge(b"u")

    t = Transcript(b"ipp-anchor")
    t.append_message(b"dom-sep", b"ipp v1")
    t.append_u64(b"n", 64)
    t.append_message(b"L", Lb)
    t.append_message(b"R", Rb)
    assert t.get_challenge(b"u") == want


def test_sigma_account_append_from_first_principles():
    """A sigma-style account append (acvar/gr/grsk/commc/commd sub-frames,
    accounts/transcript.py append_account_var) recomputed from raw frames."""
    gr, grsk = bytes(range(32)), bytes(range(1, 33))
    c, d = bytes(range(2, 34)), bytes(range(3, 35))

    class _Acc:
        class pk:
            pass

        class comm:
            pass
    _Acc.pk.gr, _Acc.pk.grsk = gr, grsk
    _Acc.comm.c, _Acc.comm.d = c, d

    ref = _RefMerlin(b"sigma-anchor")
    ref.append(b"dom-sep", b"DLEQProof")
    ref.append(b"acvar", b"delta")
    ref.append(b"gr", gr)
    ref.append(b"grsk", grsk)
    ref.append(b"commc", c)
    ref.append(b"commd", d)
    want = ref.challenge(b"x")

    t = Transcript(b"sigma-anchor")
    t.domain_sep(b"DLEQProof")
    t.append_account_var(b"delta", _Acc)
    assert t.get_challenge(b"x") == want


def test_full_strobe_frame_schedule_against_library():
    """One full mixed schedule (domain seps, variable-length appends that
    straddle the 166-byte rate boundary, two challenges) replayed on both
    implementations byte-for-byte."""
    ref = _RefMerlin(b"frame-anchor")
    t = Transcript(b"frame-anchor")
    big = bytes(range(256)) * 2  # 512 bytes: crosses the rate twice
    for label, msg in ((b"dom-sep", b"phase one"), (b"blob", big),
                       (b"tiny", b""), (b"pt", bytes(32))):
        ref.append(label, msg)
        t.append_message(label, msg)
    assert ref.challenge(b"c1") == t.get_challenge(b"c1")
    ref.append(b"dom-sep", b"phase two")
    t.domain_sep(b"phase two")
    assert ref.challenge(b"c2") == t.get_challenge(b"c2")
