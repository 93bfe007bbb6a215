"""Batched scalar-field (mod l) arithmetic in int32 limbs for TPU.

l = 2^252 + 27742317777372353535851937790883648493 is the ristretto255
group order. The reference gets this from curve25519-dalek's `Scalar`
(52-bit limbs, u128 products — not expressible on TPU VPUs); this module is
a TPU-first design, NOT a port:

* **Radix 2^11, 24 limbs** (264-bit capacity), int32 everywhere — the same
  layout as the GF(2^255-19) engine (:mod:`quisquis_tpu.ops.field`), so
  scalar and field tensors share conversion helpers and SoA batch shapes.
* **Plain (non-Montgomery) representation with matrix folding**: a product
  is one gathered schoolbook contraction (47 columns, each < 2^31 by
  construction) followed by carry passes and *fold* steps that contract
  limbs >= 24 through a constant matrix CMAT[h, j] = digit_j(2^(11*(24+h))
  mod l) — a single int32 einsum. Everything is data-parallel: no
  sequential CIOS chain, no 64-bit emulation, no floats. The pass schedule
  is chosen greedily at trace time from exact integer interval arithmetic;
  every intermediate is proven < 2^31, so int32 overflow is impossible by
  construction (the same certification style as ops/field.py).
* **Loose contract**: every public op returns limbs in [0, 2^12) whose
  value is congruent mod l to the intended result; public inputs may
  assume the same. Exact canonical digits (value in [0, l), limbs < 2^11)
  are produced only at boundaries (`canonicalize`, `eq`, `to_bytes_array`,
  `to_nibbles`), which run short `lax.scan` carry chains.

Why it exists: the on-device verifier (device transcript replay + deferred
MSM, see bulletproofs/device_verify.py) needs challenge arithmetic —
powers, inner products, Fermat inversion — *inside* one jitted program, so
a batch verification is a single host->device upload and a single boolean
fetch. Host-side equivalents live in ops/exact.py (sc_*).

The vectorized forms matter twice: at run time (the fold is one fused
multiply-reduce instead of 24 dependent steps) and at compile time (a
Montgomery CIOS mul traced to ~1.8k HLO ops per call site; a whole device
shuffle verifier has hundreds of sites, which made XLA compiles take tens
of minutes — the gather/einsum form traces to ~40).

Bit-exact vs :mod:`quisquis_tpu.ops.exact` sc_* (tests/test_scalar_field.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import exact as ex

BITS = 11
NLIMBS = 24
MASK = (1 << BITS) - 1
#: per-limb inclusive bound of the public "loose" contract
LOOSE = (1 << 12) - 1
L = ex.L
INT32_MAX = 2**31 - 1

_i32 = jnp.int32


def from_int(x: int) -> np.ndarray:
    x %= L
    return np.array([(x >> (BITS * i)) & MASK for i in range(NLIMBS)],
                    dtype=np.int32)


def to_int(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.int64)
    return sum(int(v) << (BITS * i) for i, v in enumerate(limbs)) % L


def from_int_batch(xs) -> np.ndarray:
    nbytes = (NLIMBS * BITS + 7) // 8 + 2
    buf = b"".join((x % L).to_bytes(nbytes, "little") for x in xs)
    b = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), nbytes).astype(np.int32)
    off = BITS * np.arange(NLIMBS, dtype=np.int32)
    q, r = off // 8, off % 8
    window = b[:, q] | (b[:, q + 1] << 8) | (b[:, q + 2] << 16)
    return ((window >> r) & MASK).astype(np.int32)


def to_int_batch(limbs) -> list:
    limbs = np.asarray(limbs, dtype=np.int64)
    flat = limbs.reshape(-1, NLIMBS)
    return [sum(int(v) << (BITS * i) for i, v in enumerate(row)) % L
            for row in flat]


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(shape + (NLIMBS,), dtype=_i32)


def const(x: int, shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(from_int(x)), shape + (NLIMBS,))


def one(shape=()) -> jnp.ndarray:
    return const(1, shape)


# ---------------------------------------------------------------------------
# certified carry/fold reduction
# ---------------------------------------------------------------------------

#: l < 2^253, so canonical values occupy 23 limbs; folding starts at limb 24
#: (bit 264). CMAT[h] = canonical digits of 2^(11*(24+h)) mod l.
_FOLD_POS = NLIMBS
_CMAT_WIDTH = 23


def _fold_row(pos: int) -> list:
    v = pow(2, BITS * pos, L)
    return [(v >> (BITS * i)) & MASK for i in range(_CMAT_WIDTH)]


_CMAT_ROWS = NLIMBS + 8  # covers widths up to 56 limbs
_CMAT_INT = [_fold_row(_FOLD_POS + h) for h in range(_CMAT_ROWS)]
_CMAT = np.array(_CMAT_INT, dtype=np.int32)          # [32, 23]


def _carry_step(x: jnp.ndarray, bounds: list) -> tuple:
    """One parallel carry pass with exact bound propagation (width + 1)."""
    nd = x.ndim
    lo = jnp.bitwise_and(x, MASK)
    hi = jnp.right_shift(x, BITS)
    lo = jnp.pad(lo, [(0, 0)] * (nd - 1) + [(0, 1)])
    hi = jnp.pad(hi, [(0, 0)] * (nd - 1) + [(1, 0)])
    w = len(bounds)
    nb = [0] * (w + 1)
    for k in range(w + 1):
        b_lo = min(bounds[k], MASK) if k < w else 0
        b_hi = (bounds[k - 1] >> BITS) if k > 0 else 0
        nb[k] = b_lo + b_hi
    return lo + hi, nb


def _fold_step(x: jnp.ndarray, bounds: list) -> tuple:
    """Contract limbs >= 24 through CMAT: one int32 einsum, width -> 24."""
    w = len(bounds)
    rows = w - _FOLD_POS
    assert 0 < rows <= _CMAT_ROWS
    lo = x[..., :_FOLD_POS]
    hi = x[..., _FOLD_POS:]
    fold = jnp.einsum("...h,hj->...j", hi, jnp.asarray(_CMAT[:rows]))
    nd = x.ndim
    fold = jnp.pad(fold, [(0, 0)] * (nd - 1) + [(0, NLIMBS - _CMAT_WIDTH)])
    nb = [0] * NLIMBS
    for j in range(NLIMBS):
        add = sum(bounds[_FOLD_POS + h] * _CMAT_INT[h][j]
                  for h in range(rows)) if j < _CMAT_WIDTH else 0
        nb[j] = bounds[j] + add
        assert nb[j] <= INT32_MAX, (j, nb[j])
    return lo + fold, nb


def _fold_cols_fit(bounds: list) -> bool:
    w = len(bounds)
    rows = w - _FOLD_POS
    if rows <= 0 or rows > _CMAT_ROWS:
        return False
    for j in range(_CMAT_WIDTH):
        add = sum(bounds[_FOLD_POS + h] * _CMAT_INT[h][j] for h in range(rows))
        if bounds[j] + add > INT32_MAX:
            return False
    return True


def _reduce_sf(x: jnp.ndarray, bounds: list) -> jnp.ndarray:
    """Compose carry/fold passes until width == 24 and LOOSE holds.

    Schedule chosen greedily at trace time from exact integer bounds;
    every intermediate is asserted < 2^31 (overflow-free by construction).
    """
    bounds = list(bounds)
    for _ in range(64):
        while len(bounds) > NLIMBS and bounds[-1] == 0:
            bounds.pop()
            x = x[..., :len(bounds)]
        w = len(bounds)
        if w < NLIMBS:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, NLIMBS - w)])
            bounds = bounds + [0] * (NLIMBS - w)
            w = NLIMBS
        if w == NLIMBS and all(b <= LOOSE for b in bounds):
            return x
        if w > NLIMBS and _fold_cols_fit(bounds):
            x, bounds = _fold_step(x, bounds)
        else:
            x, bounds = _carry_step(x, bounds)
    raise AssertionError(f"sf reduction did not converge: bounds={bounds}")


# ---------------------------------------------------------------------------
# multiplication: gathered schoolbook columns
# ---------------------------------------------------------------------------

_W = 2 * NLIMBS - 1  # 47 product columns



def _school_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., 47] schoolbook columns: shifted copies of b via static rolls
    (slice+concat — TPU lowers minor-axis gathers poorly), then one
    multiply-reduce. Built on the unbroadcast operand so constant
    operands fold to a single [24, 47] table."""
    bp = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, _W - NLIMBS)])
    shifted = jnp.stack([jnp.roll(bp, i, axis=-1) for i in range(NLIMBS)],
                        axis=-2)                              # [..., 24, 47]
    return jnp.sum(a[..., :, None] * shifted, axis=-2)


_SCHOOL_BOUNDS = [
    min(k + 1, NLIMBS, _W - k) * LOOSE * LOOSE for k in range(_W)
]
assert max(_SCHOOL_BOUNDS) <= INT32_MAX


def _mul_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _reduce_sf(_school_cols(a, b), _SCHOOL_BOUNDS)


#: (a * b) mod l on loose limbs; jitted so call sites share one computation
mul = jax.jit(_mul_impl)


def _add_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _reduce_sf(a + b, [2 * LOOSE] * NLIMBS)


add = jax.jit(_add_impl)


def _neg_bias() -> np.ndarray:
    """Digits of 2^16 * l (25 limbs), rebalanced so limbs 0..23 >= LOOSE."""
    v = (1 << 16) * L
    nl = NLIMBS + 1
    digits = [(v >> (BITS * i)) & MASK for i in range(nl)]
    for i in range(NLIMBS):
        if digits[i] < LOOSE:
            k = -(-(LOOSE - digits[i]) // (1 << BITS))
            digits[i] += k << BITS
            digits[i + 1] -= k
    assert all(d >= LOOSE for d in digits[:NLIMBS]), digits
    assert digits[NLIMBS] >= 0
    assert all(0 <= d < 2**26 for d in digits)
    assert sum(d << (BITS * i) for i, d in enumerate(digits)) == v
    return np.array(digits, dtype=np.int32)


_NEG_BIAS = _neg_bias()
_NEG_BOUNDS = [int(d) + LOOSE for d in _NEG_BIAS[:NLIMBS]] + [int(_NEG_BIAS[-1])]


def _pad25(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])


def _sub_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    return _reduce_sf(_pad25(a) + jnp.asarray(_NEG_BIAS) - _pad25(b),
                      _NEG_BOUNDS)


sub = jax.jit(_sub_impl)


def _neg_impl(b: jnp.ndarray) -> jnp.ndarray:
    return _reduce_sf(jnp.asarray(_NEG_BIAS) - _pad25(b), _NEG_BOUNDS)


neg = jax.jit(_neg_impl)


# ---------------------------------------------------------------------------
# canonicalization (exact digits, value in [0, l))
# ---------------------------------------------------------------------------

def _carry_scan_body(carry, limb):
    v = limb + carry
    return v >> BITS, jnp.bitwise_and(v, MASK)


def _scan_carry(x: jnp.ndarray):
    """Exact sequential carry; (digits [..., w] in [0, 2^11), carry out)."""
    carry, digits = jax.lax.scan(
        _carry_scan_body, x[..., 0] * 0, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(digits, 0, -1), carry


# 2*delta where l = 2^252 + delta; 2^253 === -2*delta (mod l)
_TWO_DELTA = 2 * (L - (1 << 252))
_TD_NLIMBS = (_TWO_DELTA.bit_length() + BITS - 1) // BITS  # 12 limbs
_TD_LIMBS = np.array([(_TWO_DELTA >> (BITS * i)) & MASK
                      for i in range(_TD_NLIMBS)], dtype=np.int32)


def _top_bias(max_top: int) -> np.ndarray:
    """Smallest-ish multiple of l whose digits dominate max_top * 2delta."""
    need = max_top * _TWO_DELTA
    k = -(-need // L) + 1
    v = k * L
    digits = [(v >> (BITS * i)) & MASK for i in range(NLIMBS)]
    # rebalance so limbs 0.._TD_NLIMBS dominate max_top * td_limb and no
    # limb goes negative (the borrow cascades up to the 2^253 top digit)
    for i in range(NLIMBS - 1):
        lim = max_top * int(_TD_LIMBS[i]) if i < _TD_NLIMBS else 0
        if digits[i] < lim:
            kk = -(-(lim - digits[i]) // (1 << BITS))
            digits[i] += kk << BITS
            digits[i + 1] -= kk
    assert all(d >= 0 for d in digits), digits
    assert all(max_top * int(_TD_LIMBS[i]) <= digits[i]
               for i in range(_TD_NLIMBS))
    assert sum(d << (BITS * i) for i, d in enumerate(digits)) == v
    return np.array(digits, dtype=np.int32)


_TOP_BIAS_BIG = _top_bias(MASK)   # folds a top limb <= 2^11-1
_TOP_BIAS_SMALL = _top_bias(8)    # folds a top limb <= 8

# canonical digits of 2^264 mod l (for the carry-out fold)
_F264 = from_int(pow(2, BITS * NLIMBS, L))


def from_int_like(v: int) -> np.ndarray:
    """Digits of an arbitrary v < 2^264 (no mod reduction)."""
    return np.array([(v >> (BITS * i)) & MASK for i in range(NLIMBS)],
                    dtype=np.int32)


_L_DIGITS = from_int_like(L)
_2L_DIGITS = from_int_like(2 * L)
_3L_DIGITS = from_int_like(3 * L)


def _lex_ge(x: jnp.ndarray, c: np.ndarray) -> jnp.ndarray:
    """x (exact digits [..., 24]) >= constant c (digits), lexicographic."""
    diff = x - jnp.asarray(c)
    nz = diff != 0
    # index of most significant nonzero limb (0 if none)
    last = (NLIMBS - 1) - jnp.argmax(nz[..., ::-1], axis=-1)
    top = jnp.take_along_axis(diff, last[..., None], axis=-1)[..., 0]
    return jnp.where(jnp.any(nz, axis=-1), top > 0, True)


def _canonicalize_impl(x: jnp.ndarray) -> jnp.ndarray:
    """Loose limbs [..., 24] -> exact canonical digits of (value mod l)."""
    # 1. exact carry; fold the carry-out (value >> 264 <= 2 for loose
    #    inputs) via 2^264 mod l; exact carry again (value now < 2^264,
    #    so the second carry-out is 0)
    digits, carry = _scan_carry(x)
    x = digits + carry[..., None] * jnp.asarray(_F264)
    digits, _ = _scan_carry(x)
    # 2. fold the top limb t = bits 253..263 (2^253 === -2delta mod l):
    #    add a bias multiple of l whose digits dominate t*2delta, keeping
    #    every limb nonnegative; then exact carry (value < 2^253 + 2^140)
    top = digits[..., NLIMBS - 1]
    x = digits.at[..., NLIMBS - 1].set(0) + jnp.asarray(_TOP_BIAS_BIG)
    x = x.at[..., :_TD_NLIMBS].add(-top[..., None] * jnp.asarray(_TD_LIMBS))
    digits, _ = _scan_carry(x)
    # 3. the top limb is now <= 2; one more (small-bias) fold makes the
    #    value < 2^253 + 2l < 4l
    top = digits[..., NLIMBS - 1]
    x = digits.at[..., NLIMBS - 1].set(0) + jnp.asarray(_TOP_BIAS_SMALL)
    x = x.at[..., :_TD_NLIMBS].add(-top[..., None] * jnp.asarray(_TD_LIMBS))
    digits, _ = _scan_carry(x)
    # 4. exact conditional subtract: k = sum [v >= j*l] in {0..3};
    #    the final carry scan's arithmetic shifts handle negative limbs
    k = (_lex_ge(digits, _3L_DIGITS).astype(_i32)
         + _lex_ge(digits, _2L_DIGITS).astype(_i32)
         + _lex_ge(digits, _L_DIGITS).astype(_i32))
    digits, _ = _scan_carry(digits - k[..., None] * jnp.asarray(_L_DIGITS))
    return digits


canonicalize = jax.jit(_canonicalize_impl)


def _eq_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(_canonicalize_impl(a) == _canonicalize_impl(b), axis=-1)


eq = jax.jit(_eq_impl)


def _is_zero_impl(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(_canonicalize_impl(a) == 0, axis=-1)


is_zero = jax.jit(_is_zero_impl)


# ---------------------------------------------------------------------------
# byte I/O (device-side, vectorized)
# ---------------------------------------------------------------------------

def _split_maps(nlimbs: int, nbytes: int):
    """Constant index/shift vectors for byte->limb extraction."""
    q = np.zeros(nlimbs, np.int32)
    r = np.zeros(nlimbs, np.int32)
    for i in range(nlimbs):
        q[i], r[i] = divmod(BITS * i, 8)
    q0 = np.minimum(q, nbytes - 1)
    q1 = np.minimum(q + 1, nbytes - 1)
    q2 = np.minimum(q + 2, nbytes - 1)
    m1 = (q + 1 < nbytes).astype(np.int32)
    m2 = (q + 2 < nbytes).astype(np.int32)
    return q0, q1, q2, r, m1, m2


def _limbs_from_bytes(b: jnp.ndarray, nlimbs: int) -> jnp.ndarray:
    """[..., k] int32 LE bytes -> [..., nlimbs] 11-bit limbs (raw split)."""
    k = b.shape[-1]
    q0, q1, q2, r, m1, m2 = _split_maps(nlimbs, k)
    v = (jnp.take(b, jnp.asarray(q0), axis=-1) >> jnp.asarray(r)) \
        | (jnp.take(b, jnp.asarray(q1), axis=-1) * jnp.asarray(m1)
           << jnp.asarray(8 - r)) \
        | (jnp.take(b, jnp.asarray(q2), axis=-1) * jnp.asarray(m2)
           << jnp.asarray(16 - r))
    return v & MASK


def _from_bytes_impl(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 32] int32 LE bytes -> loose limbs of (value mod l)."""
    return _reduce_sf(_limbs_from_bytes(b, NLIMBS), [MASK] * NLIMBS)


from_bytes = jax.jit(_from_bytes_impl)

_WIDE_LIMBS = (512 + BITS - 1) // BITS  # 47


def _from_bytes_wide_impl(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 64] int32 LE bytes -> loose limbs of (value mod l); the
    challenge-derivation shape (Scalar::from_bytes_mod_order_wide,
    /root/reference/src/accounts/transcript.rs:77-81)."""
    limbs = _limbs_from_bytes(b, _WIDE_LIMBS)
    return _reduce_sf(limbs, [MASK] * _WIDE_LIMBS)


from_bytes_wide = jax.jit(_from_bytes_wide_impl)


_PACK_L = np.zeros(32, np.int32)
_PACK_OFF = np.zeros(32, np.int32)
for _j in range(32):
    _PACK_L[_j], _PACK_OFF[_j] = divmod(8 * _j, BITS)
_PACK_L1 = np.minimum(_PACK_L + 1, NLIMBS - 1)
_PACK_M1 = ((_PACK_OFF > BITS - 8) & (_PACK_L + 1 < NLIMBS)).astype(np.int32)


def _pack_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Exact canonical digits [..., 24] -> [..., 32] int32 LE bytes."""
    v = (jnp.take(x, jnp.asarray(_PACK_L), axis=-1)
         >> jnp.asarray(_PACK_OFF)) \
        | (jnp.take(x, jnp.asarray(_PACK_L1), axis=-1) * jnp.asarray(_PACK_M1)
           << jnp.asarray(BITS - _PACK_OFF))
    return v & 0xFF


def _to_bytes_array_impl(x: jnp.ndarray) -> jnp.ndarray:
    """Loose limbs -> [..., 32] int32 LE bytes of the canonical value."""
    return _pack_bytes(_canonicalize_impl(x))


to_bytes_array = jax.jit(_to_bytes_array_impl)


_NIB_L = np.zeros(64, np.int32)
_NIB_OFF = np.zeros(64, np.int32)
for _j in range(64):
    _NIB_L[_j], _NIB_OFF[_j] = divmod(4 * _j, BITS)
_NIB_L1 = np.minimum(_NIB_L + 1, NLIMBS - 1)
_NIB_M1 = ((_NIB_OFF > BITS - 4) & (_NIB_L + 1 < NLIMBS)).astype(np.int32)


def _to_nibbles_impl(x: jnp.ndarray) -> jnp.ndarray:
    """Loose limbs [..., 24] -> [..., 64] little-endian 4-bit MSM digits."""
    c = _canonicalize_impl(x)
    v = (jnp.take(c, jnp.asarray(_NIB_L), axis=-1) >> jnp.asarray(_NIB_OFF)) \
        | (jnp.take(c, jnp.asarray(_NIB_L1), axis=-1) * jnp.asarray(_NIB_M1)
           << jnp.asarray(BITS - _NIB_OFF))
    return v & 0xF


to_nibbles = jax.jit(_to_nibbles_impl)


# ---------------------------------------------------------------------------
# higher ops
# ---------------------------------------------------------------------------

def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e mod l for a trace-time constant exponent e >= 0.

    Small exponents unroll; large ones run a `fori_loop` over the exponent
    bits (compile size stays bounded)."""
    if e == 0:
        return one(a.shape[:-1])
    bits = bin(e)[2:]
    if len(bits) <= 16:
        acc = a
        for bit in bits[1:]:
            acc = mul(acc, acc)
            if bit == "1":
                acc = mul(acc, a)
        return acc
    ebits = jnp.asarray([int(c) for c in bits], dtype=jnp.int32)

    def body(i, acc):
        sq = mul(acc, acc)
        withmul = mul(sq, a)
        return jnp.where(ebits[i] == 1, withmul, sq)

    return jax.lax.fori_loop(1, len(bits), body, a)


def _invert_impl(a: jnp.ndarray) -> jnp.ndarray:
    return pow_const(a, L - 2)


#: a^(l-2) mod l: Fermat inversion (square-and-multiply under fori_loop;
#: fixed operation order for bit-exactness); jitted
invert = jax.jit(_invert_impl)


def batch_invert_rows(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick inversion along the second-to-last axis.

    a: [..., n, NLIMBS] (all nonzero) -> elementwise inverses with ONE
    Fermat inversion + 3(n-1) multiplications.
    """
    n = a.shape[-2]
    prefix = [a[..., 0, :]]
    for i in range(1, n):
        prefix.append(mul(prefix[-1], a[..., i, :]))
    inv_all = invert(prefix[-1])
    out = [None] * n
    for i in range(n - 1, 0, -1):
        out[i] = mul(inv_all, prefix[i - 1])
        inv_all = mul(inv_all, a[..., i, :])
    out[0] = inv_all
    return jnp.stack(out, axis=-2)


def powers(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., NLIMBS] -> [..., n, NLIMBS]: 1, x, x^2, ..., x^(n-1).

    Log-depth doubling: powers[0:2^k] extend by powers * x^(2^k).
    """
    out = [one(x.shape[:-1]), x]
    if n == 1:
        return out[0][..., None, :]
    cur = jnp.stack(out, axis=-2)  # [..., 2, NLIMBS]
    step = mul(x, x)               # x^2
    while cur.shape[-2] < n:
        nxt = mul(cur, step[..., None, :])
        cur = jnp.concatenate([cur, nxt], axis=-2)
        step = mul(step, step)
    return cur[..., :n, :]


# host conversion helpers ------------------------------------------------

def scalars_to_dev(xs) -> jnp.ndarray:
    """Python ints -> device limbs [n, NLIMBS] (canonical)."""
    return jnp.asarray(from_int_batch(xs))


def dev_to_scalars(x: jnp.ndarray) -> list:
    """Device loose limbs -> python ints (host fetch)."""
    return to_int_batch(np.asarray(canonicalize(x)))
