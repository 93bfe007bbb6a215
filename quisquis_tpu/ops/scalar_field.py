"""Batched scalar-field (mod l) arithmetic in int32 limbs for TPU.

l = 2^252 + 27742317777372353535851937790883648493 is the ristretto255
group order. The reference gets this from curve25519-dalek's `Scalar`
(52-bit limbs, u128 products — not expressible on TPU VPUs); this module is
a TPU-first design, NOT a port:

* **Radix 2^11, 24 limbs** (264-bit capacity), int32 everywhere — the same
  layout as the GF(2^255-19) engine (:mod:`quisquis_tpu.ops.field`), so
  scalar and field tensors share conversion helpers and SoA batch shapes.
* **Montgomery representation** (R = 2^264): multiplication is schoolbook
  partial products + 24 CIOS reduction steps, all int32 multiply-accumulate
  with trace-time-verified bounds (no 64-bit emulation, no floats, fixed
  reduction order — bit-exactness requires integer determinism).
* **Canonical contract**: every public op returns limbs of a value in
  [0, l), each limb <= 2^11-1. Public inputs assume the same.

Why it exists: the on-device verifier (device transcript replay + deferred
MSM, see bulletproofs/device_verify.py) needs challenge arithmetic —
powers, inner products, Fermat inversion — *inside* one jitted program, so
a batch verification is a single host->device upload and a single boolean
fetch. Host-side equivalents live in ops/exact.py (sc_*).

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
L = ex.L

_i32 = jnp.int32

#: R = 2^(BITS*NLIMBS) = 2^264, the Montgomery radix
R = 1 << (BITS * NLIMBS)
R_MOD_L = R % L
R2_MOD_L = (R * R) % L
#: -l^-1 mod 2^BITS (the CIOS per-limb quotient constant)
N0 = (-pow(L, -1, 1 << BITS)) % (1 << BITS)

_L_LIMBS = np.array([(L >> (BITS * i)) & MASK for i in range(NLIMBS)],
                    dtype=np.int32)


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


# ---------------------------------------------------------------------------
# carry handling
# ---------------------------------------------------------------------------

def _carry_full(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Exact little-endian carry propagation over `width` limbs.

    Input limbs may be up to ~2^30; output limbs are < 2^11 except the last,
    which absorbs the top carry. Sequential by construction (bit-exactness
    forbids reassociation), unrolled at trace time.
    """
    out = []
    carry = jnp.zeros_like(x[..., 0])
    for i in range(width):
        v = x[..., i] + carry
        out.append(v & MASK)
        carry = v >> BITS
    out[-1] = out[-1] | (carry << BITS)  # carry out of the top must be 0 for valid inputs
    return jnp.stack(out, axis=-1)


def _sub_l_if_ge(x: jnp.ndarray) -> jnp.ndarray:
    """x in [0, 2l) with canonical limbs -> x mod l (one conditional subtract)."""
    l_limbs = jnp.asarray(_L_LIMBS)
    # y = x - l with borrow chain
    ys = []
    borrow = jnp.zeros_like(x[..., 0])
    for i in range(NLIMBS):
        v = x[..., i] - l_limbs[i] - borrow
        ys.append(v & MASK)
        borrow = (v >> BITS) & 1  # v in (-2^12, 2^11): borrow is 0 or 1
    y = jnp.stack(ys, axis=-1)
    ge = (borrow == 0)[..., None]
    return jnp.where(ge, y, x)


# ---------------------------------------------------------------------------
# Montgomery core
# ---------------------------------------------------------------------------

def _redc(t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of product columns -> t/R mod l, canonical.

    t: [..., 2*NLIMBS] column sums (int32, each < ~2^27). 24 CIOS steps:
    make limb i divisible by 2^11 by adding m_i * l (one broadcasted
    multiply-add over a static 24-wide slice), push the carry up, drop the
    limb. Bounds are certified at trace time by exact interval arithmetic:
    every intermediate is proven < 2^31 (no int32 overflow by construction).

    Output value < T/R + l; for canonical inputs that's < 2l (one
    conditional subtract), and for full-width 24-limb inputs (< 2^264, as
    from byte loads) it's < 3l — two subtracts cover both.
    """
    l_vec = jnp.asarray(_L_LIMBS)
    hi = [24 * MASK * MASK] * (2 * NLIMBS)
    for i in range(NLIMBS):
        m = (t[..., i] * N0) & MASK
        t = t.at[..., i:i + NLIMBS].add(m[..., None] * l_vec)
        for j in range(NLIMBS):
            hi[i + j] += MASK * int(_L_LIMBS[j])
            assert hi[i + j] < 2**31, (i, j, hi[i + j])
        # limb i is now divisible by 2^11; fold it into limb i+1
        t = t.at[..., i + 1].add(t[..., i] >> BITS)
        hi[i + 1] += hi[i] >> BITS
        assert hi[i + 1] < 2**31
    # result columns t[24..47]; total value < 3l << 2^264, so the exact
    # carry pass cannot overflow the top limb
    out = []
    carry = jnp.zeros_like(t[..., 0])
    carry_hi = 0
    for i in range(NLIMBS):
        v = t[..., NLIMBS + i] + carry
        assert hi[NLIMBS + i] + carry_hi < 2**31
        out.append(v & MASK)
        carry = v >> BITS
        carry_hi = (hi[NLIMBS + i] + carry_hi) >> BITS
    x = jnp.stack(out, axis=-1)
    return _sub_l_if_ge(_sub_l_if_ge(x))


def _school_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., 2*NLIMBS] schoolbook partial-product columns (canonical inputs).

    Vectorized over the limb axis (24 broadcasted multiply + shifted adds),
    not 576 scalar multiplies — keeps the traced graph small enough that a
    whole on-device verifier (dozens of muls) compiles quickly.
    """
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (NLIMBS,))
    b = jnp.broadcast_to(b, batch + (NLIMBS,))
    w = 2 * NLIMBS
    pad_cfg = [(0, 0)] * len(batch)
    cols = jnp.zeros(batch + (w,), dtype=_i32)
    for i in range(NLIMBS):
        term = a[..., i:i + 1] * b
        cols = cols + jnp.pad(term, pad_cfg + [(i, w - NLIMBS - i)])
    return cols


def _mul_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _redc(_school_cols(a, b))


#: Montgomery product (a * b / R) mod l; jitted so the dozens of call sites
#: inside a device verifier share one lowered computation per shape
mul = jax.jit(_mul_impl)


def to_mont(x: jnp.ndarray) -> jnp.ndarray:
    return mul(x, const(R2_MOD_L, x.shape[:-1]))


def _from_mont_impl(x: jnp.ndarray) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(0, NLIMBS)]
    return _redc(jnp.pad(x, pad))


from_mont = jax.jit(_from_mont_impl)


def _add_impl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _sub_l_if_ge(_carry_full(a + b, NLIMBS))


#: (a + b) mod l for canonical-limb inputs (any representation); jitted
add = jax.jit(_add_impl)


def _neg_bias() -> np.ndarray:
    digits = [(2 * L >> (BITS * i)) & MASK for i in range(NLIMBS)]
    tl = np.array(digits, dtype=np.int64)
    # rebalance so each digit >= MASK (a's max), keeping the value 2l
    for i in range(NLIMBS - 1):
        if tl[i] < MASK:
            k = -(-(MASK - tl[i]) // (1 << BITS))
            tl[i] += k << BITS
            tl[i + 1] -= k
    assert all(0 <= d < 2**26 for d in tl)
    assert sum(int(d) << (BITS * i) for i, d in enumerate(tl)) == 2 * L
    return tl.astype(np.int32)


_NEG_BIAS = _neg_bias()


def _neg_impl(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod l: 2l - a, limb-wise nonnegative (bias digits rebalanced so
    each dominates a canonical limb), then two conditional subtracts."""
    out = _carry_full(jnp.asarray(_NEG_BIAS) - a, NLIMBS)
    return _sub_l_if_ge(_sub_l_if_ge(out))


neg = jax.jit(_neg_impl)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return add(a, neg(b))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# byte I/O (device-side)
# ---------------------------------------------------------------------------

def _from_bytes_wide_impl(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 64] int32 LE bytes -> canonical limbs of (value mod l), in
    MONTGOMERY form (ready for `mul`). The challenge-derivation shape
    (Scalar::from_bytes_mod_order_wide, transcript.rs:77-81).
    """
    lo = _limbs_from_bytes(b[..., :33], NLIMBS)          # bits 0..263
    hi = _limbs_from_bytes(b[..., 33:], 2 * NLIMBS - 24)  # bits 264..511
    # value = lo + hi * 2^264 ; in Montgomery form: v*R = lo*R + hi*(2^264 R)
    lo_m = to_mont(lo)
    hi_m = to_mont(_pad_limbs(hi))
    f = const(R_MOD_L, b.shape[:-1])  # 2^264 mod l, NON-Montgomery
    # hi_m * f (f non-mont) = hi * 2^264 * R / R ... careful: mul is Montgomery.
    # mont_mul(hi_m, to_mont(f)) = hi * 2^264 * R mod l  == to_mont(hi * 2^264)
    hi_term = mul(hi_m, to_mont(f))
    return add(lo_m, hi_term)


from_bytes_wide = jax.jit(_from_bytes_wide_impl)


def _from_bytes_impl(b: jnp.ndarray) -> jnp.ndarray:
    # 32 bytes = 256 bits fit the 24-limb (264-bit) load; to_mont reduces
    return to_mont(_limbs_from_bytes(b, NLIMBS))


#: [..., 32] int32 LE bytes -> canonical limbs mod l, Montgomery form
from_bytes = jax.jit(_from_bytes_impl)


def _limbs_from_bytes(b: jnp.ndarray, nlimbs: int) -> jnp.ndarray:
    """[..., k] int32 bytes (LE) -> [..., nlimbs] 11-bit limbs (raw split).

    Caller guarantees 11*nlimbs >= 8*k (all bits land in limbs).
    """
    k = b.shape[-1]
    out = []
    for i in range(nlimbs):
        bitpos = BITS * i
        j, off = divmod(bitpos, 8)
        v = jnp.zeros_like(b[..., 0]) if j >= k else b[..., j] >> off
        if j + 1 < k:
            v = v | (b[..., j + 1] << (8 - off))
        if j + 2 < k and 16 - off < BITS + 8:
            v = v | (b[..., j + 2] << (16 - off))
        out.append(v & MASK)
    return jnp.stack(out, axis=-1)


def _pad_limbs(x: jnp.ndarray) -> jnp.ndarray:
    w = x.shape[-1]
    if w >= NLIMBS:
        return x[..., :NLIMBS]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, NLIMBS - w)]
    return jnp.pad(x, pad)


def _to_bytes_array_impl(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical NON-Montgomery limbs -> [..., 32] int32 LE bytes (device)."""
    out = []
    for j in range(32):
        bitpos = 8 * j
        l_, off = divmod(bitpos, BITS)
        v = x[..., l_] >> off
        if off > BITS - 8 and l_ + 1 < NLIMBS:
            v = v | (x[..., l_ + 1] << (BITS - off))
        out.append(v & 0xFF)
    return jnp.stack(out, axis=-1)


#: canonical NON-Montgomery limbs -> [..., 32] int32 LE bytes (device)
to_bytes_array = jax.jit(_to_bytes_array_impl)


# ---------------------------------------------------------------------------
# higher ops
# ---------------------------------------------------------------------------

ONE_MONT_LIMBS = from_int(R_MOD_L)       # 1 in Montgomery form


def one_mont(shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(ONE_MONT_LIMBS), shape + (NLIMBS,))


def pow_const(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e (Montgomery form) for a trace-time constant exponent e >= 0.

    Small exponents unroll; large ones run a `fori_loop` over the exponent
    bits (compile-time stays bounded; 530 Montgomery muls would otherwise
    trace to ~700k HLO ops).
    """
    if e == 0:
        return one_mont(a.shape[:-1])
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


#: a^(l-2) (Montgomery form): Fermat inversion (square-and-multiply under
#: fori_loop; fixed operation order for bit-exactness); jitted
invert = jax.jit(_invert_impl)


def batch_invert_rows(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-trick inversion along the second-to-last axis.

    a: [..., n, NLIMBS] (Montgomery form, all nonzero) -> elementwise
    inverses with ONE Fermat inversion + 3(n-1) multiplications.
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
    """[..., NLIMBS] -> [..., n, NLIMBS]: 1, x, x^2, ..., x^(n-1) (Montgomery).

    Log-depth doubling: powers[0:2^k] extend by powers * x^(2^k).
    """
    out = [one_mont(x.shape[:-1]), x]
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

def scalars_to_mont(xs) -> jnp.ndarray:
    """Python ints -> device Montgomery limbs [n, NLIMBS]."""
    return jnp.asarray(from_int_batch([x * R % L for x in xs]))


def mont_to_scalars(x: jnp.ndarray) -> list:
    """Device Montgomery limbs -> python ints (host fetch)."""
    vals = to_int_batch(np.asarray(x))
    rinv = pow(R, -1, L)
    return [v * rinv % L for v in vals]
