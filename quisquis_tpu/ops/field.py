"""Batched GF(2^255-19) arithmetic in int32 limbs for TPU.

Design (TPU-first, not a port):

* **Radix 2^11, 24 limbs** (264 bits), int32 everywhere. TPU VPUs have no
  64-bit multiplier; with 11-bit limbs every schoolbook partial-product
  column (<= 24 terms of < 2^24) stays below 2^29, so multiplication is
  pure int32 multiply-accumulate on the VPU with **no 64-bit emulation and
  no float paths** (bit-exactness requires integer-only arithmetic with a
  fixed reduction order). One carry pass widens the 47-column product to
  exactly 2*24 limbs, which a single fold (2^264 === 19*2^9 mod p) consumes.
* **Certified reduction**: the carry/fold pipeline is generated at trace
  time by exact integer interval arithmetic (`_reduce_bounded`) — every
  intermediate is proven < 2^31 and the result proven "loose" (< 2^12 per
  limb), so overflow is impossible by construction, not by testing alone.
* **SoA layout** `[..., 24]`: batch axes map onto VPU lanes. All functions
  are jit/vmap/shard_map compatible: static shapes, no data-dependent
  control flow.

The Rust reference keeps values compressed and pays decompress/compress per
op (e.g. /root/reference/src/elgamal/elgamal.rs:47-52); this backend keeps
decompressed limb tensors and compresses only at serialization boundaries,
matching compressed bytes exactly there.

Bit-exact vs :mod:`quisquis_tpu.ops.exact` (tests/test_field_jax.py),
including adversarial all-max limb patterns.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import exact as ex

BITS = 11
NLIMBS = 24
MASK = (1 << BITS) - 1
# 2^(BITS*NLIMBS) = 2^264 = 2^255 * 2^9  =>  19 * 2^9 per wrapped limb
FOLD = 19 << (BITS * NLIMBS - 255)
INT32_MAX = 2**31 - 1

# "Loose contract": per-limb inclusive bounds every op's output satisfies and
# every op's input may assume. Limb 0 absorbs the folded top carry, limb 23 is
# kept tiny by a bit-255 trim (19*2^255 fold); interval analysis proves
# closure of the contract under every op.
LOOSE0 = (1 << 15) - 1
LOOSE = (1 << 12) - 1
CONTRACT = [LOOSE0] + [LOOSE] * (NLIMBS - 2) + [7]

P = ex.P

_P_LIMBS = [(P >> (BITS * i)) & MASK for i in range(NLIMBS)]


def _make_bias() -> np.ndarray:
    """Digits of 512*p (< 2^264) rebalanced so each digit dominates CONTRACT.

    Used as the additive bias in subtraction: out = a + bias - b is
    nonnegative limb-wise whenever b satisfies the contract.
    """
    v = 512 * P
    digits = [(v >> (BITS * i)) & MASK for i in range(NLIMBS)]
    # bottom-up: digit i borrows k units (worth 2^BITS each) from digit i+1
    for i in range(NLIMBS - 1):
        if digits[i] < CONTRACT[i]:
            k = -(-(CONTRACT[i] - digits[i]) // (1 << BITS))
            digits[i] += k << BITS
            digits[i + 1] -= k
    assert all(d >= c for d, c in zip(digits, CONTRACT)), digits
    assert all(0 <= d < 2**25 for d in digits), digits
    assert sum(d << (BITS * i) for i, d in enumerate(digits)) == 512 * P
    return np.array(digits, dtype=np.int32)


BIAS = _make_bias()
_BIAS_BOUNDS = [int(d) for d in BIAS]

_i32 = jnp.int32


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def from_int(x: int) -> np.ndarray:
    x %= P
    return np.array([(x >> (BITS * i)) & MASK for i in range(NLIMBS)], dtype=np.int32)


def to_int(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.int64)
    return sum(int(v) << (BITS * i) for i, v in enumerate(limbs)) % P


def from_int_batch(xs) -> np.ndarray:
    # vectorized: ints -> little-endian bytes, then limb i = the BITS-bit
    # field starting at bit BITS*i, extracted from its 3-byte window.
    nbytes = (NLIMBS * BITS + 7) // 8 + 2  # +2: 3-byte window at the top limb
    buf = b"".join((x % P).to_bytes(nbytes, "little") for x in xs)
    b = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), nbytes)
    b = b.astype(np.int32)
    off = BITS * np.arange(NLIMBS, dtype=np.int32)
    q, r = off // 8, off % 8
    window = b[:, q] | (b[:, q + 1] << 8) | (b[:, q + 2] << 16)
    return ((window >> r) & MASK).astype(np.int32)


def to_int_batch(limbs) -> list:
    limbs = np.asarray(limbs, dtype=np.int64)
    flat = limbs.reshape(-1, NLIMBS)
    return [sum(int(v) << (BITS * i) for i, v in enumerate(row)) % P for row in flat]


def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros(shape + (NLIMBS,), dtype=_i32)


def ones(shape=()) -> jnp.ndarray:
    o = jnp.zeros(shape + (NLIMBS,), dtype=_i32)
    return o.at[..., 0].set(1)


def const(x: int, shape=()) -> jnp.ndarray:
    c = jnp.asarray(from_int(x))
    return jnp.broadcast_to(c, shape + (NLIMBS,))


# ---------------------------------------------------------------------------
# certified carry/fold reduction
# ---------------------------------------------------------------------------

def _carry_step(x: jnp.ndarray, bounds: list) -> tuple:
    """One parallel carry pass, with exact bound propagation."""
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
    """Wrap limbs >= NLIMBS into [0, NLIMBS) using 2^264 === FOLD (mod p)."""
    w = len(bounds)
    assert w <= 2 * NLIMBS
    nd = x.ndim
    lo = x[..., :NLIMBS]
    hi = x[..., NLIMBS:]
    hi = jnp.pad(hi, [(0, 0)] * (nd - 1) + [(0, 2 * NLIMBS - w)])
    nb = [0] * NLIMBS
    for k in range(NLIMBS):
        b_lo = bounds[k] if k < w else 0
        b_hi = bounds[NLIMBS + k] if NLIMBS + k < w else 0
        assert b_lo + FOLD * b_hi <= INT32_MAX, (k, b_lo, b_hi)
        nb[k] = b_lo + FOLD * b_hi
    return lo + FOLD * hi, nb


def _trim_step(x: jnp.ndarray, bounds: list) -> tuple:
    """Fold bits >= 255 of the top limb (weight 2^255 === 19) into limb 0."""
    top = x[..., NLIMBS - 1]
    extra = top >> 2
    x = x.at[..., NLIMBS - 1].set(jnp.bitwise_and(top, 3))
    x = x.at[..., 0].add(extra * 19)
    nb = list(bounds)
    nb[0] = bounds[0] + 19 * (bounds[NLIMBS - 1] >> 2)
    nb[NLIMBS - 1] = min(bounds[NLIMBS - 1], 3)
    assert nb[0] <= INT32_MAX
    return x, nb


def _reduce_bounded(x: jnp.ndarray, bounds: list) -> jnp.ndarray:
    """Compose carry/fold/trim passes until width==NLIMBS and CONTRACT holds.

    The pass schedule is chosen greedily at trace time from exact integer
    bounds; every intermediate is asserted < 2^31, so overflow is impossible
    by construction.
    """
    for _ in range(64):
        w = len(bounds)
        if w == NLIMBS and all(b <= c for b, c in zip(bounds, CONTRACT)):
            return x
        if w == NLIMBS and all(b <= c for b, c in zip(bounds[1:-1], CONTRACT[1:-1])):
            # middle limbs fine: try trim (top) and re-check; if limb 0 is the
            # only offender a carry pass follows
            if bounds[-1] > CONTRACT[-1] and \
                    bounds[0] + 19 * (bounds[-1] >> 2) <= CONTRACT[0]:
                x, bounds = _trim_step(x, bounds)
                continue
        can_fold = (
            w > NLIMBS
            and w <= 2 * NLIMBS
            and all(bounds[k] + FOLD * (bounds[NLIMBS + k] if NLIMBS + k < w else 0)
                    <= INT32_MAX for k in range(NLIMBS))
        )
        if can_fold:
            x, bounds = _fold_step(x, bounds)
        else:
            x, bounds = _carry_step(x, bounds)
    raise AssertionError(f"reduction did not converge: width={len(bounds)} bounds={bounds}")


def normalize(x: jnp.ndarray, bound: int) -> jnp.ndarray:
    """Reduce an array whose limbs are bounded by `bound` to loose form."""
    return _reduce_bounded(x, [bound] * x.shape[-1])


# ---------------------------------------------------------------------------
# arithmetic (all jit-compiled, batch = leading dims)
# ---------------------------------------------------------------------------

def _add_raw(a, b):
    return _reduce_bounded(a + b, [2 * c for c in CONTRACT])


def _sub_raw(a, b):
    bias = jnp.asarray(BIAS)
    return _reduce_bounded(a + bias - b, [c + int(v) for c, v in zip(CONTRACT, BIAS)])


def _neg_raw(a):
    bias = jnp.asarray(BIAS)
    return _reduce_bounded(bias - a, [int(v) for v in BIAS])


add = jax.jit(_add_raw)
sub = jax.jit(_sub_raw)
neg = jax.jit(_neg_raw)


def _mul_small_raw(a: jnp.ndarray, c: int) -> jnp.ndarray:
    if c * LOOSE0 > INT32_MAX:  # too big for a scalar multiply: full mul
        return _mul_raw(a, jnp.asarray(from_int(c)))
    return _reduce_bounded(a * jnp.int32(c), [b * c for b in CONTRACT])


mul_small = partial(jax.jit, static_argnums=1)(_mul_small_raw)


_MUL_W = 2 * NLIMBS - 1  # 47 schoolbook product columns

_MUL_COL_BOUNDS = [
    sum(CONTRACT[i] * CONTRACT[k - i]
        for i in range(max(0, k - NLIMBS + 1), min(k, NLIMBS - 1) + 1))
    for k in range(_MUL_W)
]
assert max(_MUL_COL_BOUNDS) <= INT32_MAX


def _mul_raw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook columns as one gather + multiply-reduce.

    The vectorized form traces to ~10 HLO ops per call site (the unrolled
    24-pass pad/add form traced to hundreds, which made whole-verifier
    programs explode at XLA compile time) and hands XLA a single fused
    contraction at run time.
    """
    # shifted copies via static rolls (slice+concat), NOT a gather: TPU
    # lowers minor-axis gathers poorly, and building the table on the
    # unbroadcast operand lets constant operands (e.g. the curve d2
    # limbs) fold to one [24, 47] table
    bp = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, _MUL_W - NLIMBS)])
    shifted = jnp.stack([jnp.roll(bp, i, axis=-1) for i in range(NLIMBS)],
                        axis=-2)                              # [..., 24, 47]
    cols = jnp.sum(a[..., :, None] * shifted, axis=-2)
    return _reduce_bounded(cols, list(_MUL_COL_BOUNDS))


mul = jax.jit(_mul_raw)


def _square_raw(a: jnp.ndarray) -> jnp.ndarray:
    return _mul_raw(a, a)


square = jax.jit(_square_raw)


def _pow2k_raw(a: jnp.ndarray, k: int) -> jnp.ndarray:
    def body(_, x):
        return _square_raw(x)
    if k <= 4:
        for _ in range(k):
            a = _square_raw(a)
        return a
    return jax.lax.fori_loop(0, k, body, a)


def _pow_const_raw(z: jnp.ndarray, e: int) -> jnp.ndarray:
    """z^e for a trace-time constant exponent, as ONE rolled fori_loop of
    square-and-(conditional-)multiply over the exponent bits.

    ~30% more multiplies at run time than a tuned addition chain, but the
    traced graph holds a single square+multiply body instead of ~25
    unrolled multiplications — the inversion chain sits inside every
    compress/decompress call site of the one-program verifiers, where
    generated-code size is the binding constraint.
    """
    bits = bin(e)[2:]
    ebits = jnp.asarray([int(c) for c in bits], dtype=jnp.int32)

    def body(i, acc):
        sq = _square_raw(acc)
        withmul = _mul_raw(sq, z)
        return jnp.where((ebits[i] == 1)[..., None], withmul, sq)

    return jax.lax.fori_loop(1, len(bits), body, z)


def _invert_raw(z: jnp.ndarray) -> jnp.ndarray:
    return _pow_const_raw(z, P - 2)


def _pow_p58_raw(z: jnp.ndarray) -> jnp.ndarray:
    return _pow_const_raw(z, (P - 5) // 8)


#: z^(p-2) (maps 0 to 0)
invert = jax.jit(_invert_raw)
#: z^((p-5)/8) = z^(2^252-3)
pow_p58 = jax.jit(_pow_p58_raw)


# ---------------------------------------------------------------------------
# canonicalization, comparison, serialization
# ---------------------------------------------------------------------------

def _carry_scan_body(carry, limb):
    # module-level so jax's tracing cache keys on a stable function identity
    # (a nested def is "re-defined repeatedly", forcing re-traces)
    v = limb + carry
    return v >> BITS, jnp.bitwise_and(v, MASK)


def _scan_carry(x: jnp.ndarray):
    """Exact sequential carry; returns (digits [...,24] in [0,2^11), carry)."""
    # init carry derived from x so sharding/varying axes match the body output
    carry, digits = jax.lax.scan(
        _carry_scan_body, x[..., 0] * 0, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(digits, 0, -1), carry


def _sub_scan_body(borrow, ab):
    a, b = ab
    v = a - b - borrow
    return (v >> 31) & 1, jnp.bitwise_and(v, MASK)


def _canonicalize_raw(x: jnp.ndarray) -> jnp.ndarray:
    # 3 rounds of exact scan + tiny wrap: certified to land in [0, 2^255+delta)
    for _ in range(3):
        x, carry = _scan_carry(x)
        x = x.at[..., 0].add(carry * FOLD)
    # clear bits >= 255 (limb 23 holds bits 253.., i.e. weight 2^253, 11 bits):
    # bits 255.. are limb23 >> 2
    for _ in range(2):
        top = x[..., NLIMBS - 1]
        x = x.at[..., NLIMBS - 1].set(jnp.bitwise_and(top, 3))
        x = x.at[..., 0].add((top >> 2) * 19)
        x, carry = _scan_carry(x)  # carry == 0 here (value < 2^255 + eps)
    # conditional subtract p (value < 2^255 => at most once)
    p_limbs = jnp.asarray(np.array(_P_LIMBS, dtype=np.int32))

    pb = jnp.broadcast_to(
        p_limbs.reshape((NLIMBS,) + (1,) * (x.ndim - 1)), (NLIMBS,) + x.shape[:-1])
    borrow, diff = jax.lax.scan(_sub_scan_body, x[..., 0] * 0,
                                (jnp.moveaxis(x, -1, 0), pb))
    diff = jnp.moveaxis(diff, 0, -1)
    return jnp.where((borrow == 0)[..., None], diff, x)


canonicalize = jax.jit(_canonicalize_raw)


@jax.jit
def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(_canonicalize_raw(a) == _canonicalize_raw(b), axis=-1)


@jax.jit
def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(_canonicalize_raw(a) == 0, axis=-1)


def _is_negative_raw(a: jnp.ndarray) -> jnp.ndarray:
    """'Negative' = canonical encoding is odd (RFC 9496 convention)."""
    return jnp.bitwise_and(_canonicalize_raw(a)[..., 0], 1) == 1


is_negative = jax.jit(_is_negative_raw)


def select(cond: jnp.ndarray, t: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """cond: bool[...]; t/f: [..., NLIMBS]."""
    return jnp.where(cond[..., None], t, f)


def _cabs_raw(a: jnp.ndarray) -> jnp.ndarray:
    bias = jnp.asarray(BIAS)
    negated = _reduce_bounded(bias - a, [int(v) for v in BIAS])
    return select(_is_negative_raw(a), negated, a)


cabs = jax.jit(_cabs_raw)


def to_bytes(x: jnp.ndarray) -> np.ndarray:
    """Canonical little-endian 32-byte encodings, shape [..., 32] uint8."""
    c = np.asarray(canonicalize(x), dtype=np.int64)
    out = np.zeros(c.shape[:-1] + (32,), dtype=np.uint8)
    for j in range(32):
        bitpos = 8 * j
        l, off = divmod(bitpos, BITS)
        v = c[..., l] >> off
        if off > BITS - 8 and l + 1 < NLIMBS:
            v = v | (c[..., l + 1] << (BITS - off))
        out[..., j] = v & 0xFF
    return out


def from_bytes(b) -> np.ndarray:
    """Load [..., 32] uint8 LE (top bit ignored) -> loose limbs [..., 24]."""
    b = np.asarray(b, dtype=np.int64).copy()
    b[..., 31] &= 0x7F
    out = np.zeros(b.shape[:-1] + (NLIMBS,), dtype=np.int32)
    for i in range(NLIMBS):
        bitpos = BITS * i
        j, off = divmod(bitpos, 8)
        v = b[..., j] >> off
        if j + 1 < 32:
            v = v | (b[..., j + 1] << (8 - off))
        if j + 2 < 32:
            v = v | (b[..., j + 2] << (16 - off))
        out[..., i] = v & MASK
    return out


# ---------------------------------------------------------------------------
# sqrt_ratio (RFC 9496 §4.2), batched
# ---------------------------------------------------------------------------

SQRT_M1_LIMBS = from_int(ex.SQRT_M1)


def _sqrt_ratio_raw(u: jnp.ndarray, v: jnp.ndarray):
    sqrt_m1 = jnp.asarray(SQRT_M1_LIMBS)
    m = _mul_raw
    v2 = _square_raw(v)
    v3 = m(v2, v)
    v7 = m(_square_raw(v3), v)
    r = m(m(u, v3), _pow_p58_raw(m(u, v7)))
    check = m(v, _square_raw(r))
    bias = jnp.asarray(BIAS)
    neg_u = _reduce_bounded(bias - u, [int(x) for x in BIAS])
    correct_sign = eq(check, u)
    flipped_sign = eq(check, neg_u)
    flipped_sign_i = eq(check, m(neg_u, sqrt_m1))
    r = select(flipped_sign | flipped_sign_i, m(r, sqrt_m1), r)
    r = cabs(r)
    return correct_sign | flipped_sign, r


sqrt_ratio_m1 = jax.jit(_sqrt_ratio_raw)


@jax.jit
def invsqrt(x: jnp.ndarray):
    return _sqrt_ratio_raw(ones(x.shape[:-1]), x)
