"""Golden-vector tests for the exact host backend.

Anchors:
- RFC 8032 Ed25519 test vector (secret key -> public key) exercises SHA-512
  clamped scalar derivation, basepoint scalar-mul and Edwards encoding.
- ristretto255 basepoint encoding must equal the reference's hard-coded
  BASE_PK_BTC_COMPRESSED[0] (/root/reference/src/ristretto/constants.rs:13-16),
  which equals dalek's RISTRETTO_BASEPOINT_COMPRESSED.
- BASE_PK_BTC_COMPRESSED[1] (constants.rs:17-20) equals bulletproofs'
  PedersenGens::default().B_blinding =
  hash_from_bytes::<Sha3_512>(basepoint bytes) — this pins the whole
  one-way-map (elligator) + SHA3-512 path bit-exactly.
"""

import hashlib

from quisquis_tpu.ops import exact as ex

BASEPOINT_COMPRESSED = bytes(
    [226, 242, 174, 10, 106, 188, 78, 113, 168, 132, 169, 97, 197, 0, 81, 95,
     88, 227, 11, 106, 165, 130, 221, 141, 182, 166, 89, 69, 224, 141, 45, 118]
)
B_BLINDING_COMPRESSED = bytes(
    [140, 146, 64, 180, 86, 169, 230, 220, 101, 195, 119, 161, 4, 141, 116, 95,
     148, 160, 140, 219, 127, 68, 203, 205, 123, 70, 243, 64, 72, 135, 17, 52]
)


def test_field_basics():
    assert ex.SQRT_M1 * ex.SQRT_M1 % ex.P == ex.P - 1
    assert ex.fe_invert(12345) * 12345 % ex.P == 1
    ok, r = ex.sqrt_ratio_m1(4, 1)
    assert ok and r == 2
    ok, _ = ex.sqrt_ratio_m1(2, 1)  # 2 is not a QR mod p
    assert not ok


# ristretto255 small multiples of the basepoint (RFC 9496 appendix A.1)
SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
]


def test_ristretto_small_multiples():
    for k, expected in enumerate(SMALL_MULTIPLES):
        assert ex.ristretto_encode(ex.pt_mul(k, ex.BASEPOINT)).hex() == expected


def test_ristretto_basepoint_encoding():
    assert ex.ristretto_encode(ex.BASEPOINT) == BASEPOINT_COMPRESSED


def test_ristretto_decode_roundtrip():
    p = ex.ristretto_decode(BASEPOINT_COMPRESSED)
    assert p is not None
    assert ex.pt_eq(p, ex.BASEPOINT)
    for k in range(1, 20):
        q = ex.pt_mul(k, ex.BASEPOINT)
        enc = ex.ristretto_encode(q)
        dec = ex.ristretto_decode(enc)
        assert dec is not None and ex.pt_eq(dec, q)
        assert ex.ristretto_encode(dec) == enc


def test_identity_encoding():
    assert ex.ristretto_encode(ex.IDENTITY) == b"\x00" * 32
    assert ex.ristretto_decode(b"\x00" * 32) is not None


def test_b_blinding_golden():
    # pins elligator one-way map + SHA3-512 against the Rust reference constant
    p = ex.hash_to_point_sha3_512(BASEPOINT_COMPRESSED)
    assert ex.ristretto_encode(p) == B_BLINDING_COMPRESSED


def test_scalar_field():
    assert ex.sc_invert(7) * 7 % ex.L == 1
    xs = [3, 5, 7, 11, 12345678901234567890]
    invs = ex.sc_batch_invert(xs)
    for x, i in zip(xs, invs):
        assert x * i % ex.L == 1
    wide = bytes(range(64))
    assert ex.sc_from_bytes_mod_order_wide(wide) == int.from_bytes(wide, "little") % ex.L


def test_point_algebra():
    a, b = 123456789, 987654321
    pa = ex.pt_mul(a, ex.BASEPOINT)
    pb = ex.pt_mul(b, ex.BASEPOINT)
    assert ex.pt_eq(ex.pt_add(pa, pb), ex.pt_mul(a + b, ex.BASEPOINT))
    assert ex.pt_eq(ex.pt_sub(pa, pb), ex.pt_mul(a - b + ex.L, ex.BASEPOINT))
    assert ex.pt_eq(ex.pt_double(pa), ex.pt_mul(2 * a, ex.BASEPOINT))
    assert ex.pt_eq(ex.pt_msm([a, b], [pb, pa]), ex.pt_mul(2 * a * b % ex.L, ex.BASEPOINT))
