"""Batched Edwards/ristretto255 point operations on TPU.

Extended twisted-Edwards coordinates (X, Y, Z, T) over the int32-limb field
(:mod:`quisquis_tpu.ops.field`), SoA layout: four `[..., 24]` tensors.
Complete (unified) a=-1 addition formulas — no branches, no special cases —
so everything vmaps/shards cleanly with static shapes.

The reference pays compress/decompress on nearly every op
(/root/reference/src/elgamal/elgamal.rs:47-52,
/root/reference/src/ristretto/keys.rs:166-168); here points stay in extended
limb form end-to-end and `compress` (RFC 9496 encode) runs only at
serialization boundaries, bit-exact with dalek's encodings.

Scalar multiplication is a fixed-shape 4-bit windowed ladder (64 windows,
every lane does identical work — no data-dependent control flow), and the
shared fixed-base table turns basepoint multiplication into 64 batched
table-lookup additions with zero doublings.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import exact as ex
from . import field as fe


class ExtPoint(NamedTuple):
    """Batched extended Edwards point; each field is int32 [..., NLIMBS]."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def shape(self):
        return self.x.shape[:-1]


D2_LIMBS = fe.from_int(ex.D2)
D_LIMBS = fe.from_int(ex.D)


def identity(shape=()) -> ExtPoint:
    return ExtPoint(fe.zeros(shape), fe.ones(shape), fe.ones(shape), fe.zeros(shape))


def _identity_like(ref: jnp.ndarray) -> ExtPoint:
    """Identity point whose batch axes derive from `ref` [batch..., k].

    Deriving from an input keeps shard_map varying-axis tracking consistent
    when the identity seeds a scan/fori_loop carry.
    """
    z = ref[..., :1] * 0  # [batch..., 1], inherits sharding/varying axes
    zeros = jnp.broadcast_to(z, ref.shape[:-1] + (fe.NLIMBS,)) 
    one = jnp.zeros((fe.NLIMBS,), dtype=jnp.int32).at[0].set(1)
    return ExtPoint(zeros, zeros + one, zeros + one, zeros)


def basepoint(shape=()) -> ExtPoint:
    bx, by, bz, bt = ex.BASEPOINT
    return ExtPoint(fe.const(bx, shape), fe.const(by, shape),
                    fe.const(bz, shape), fe.const(bt, shape))


# ---------------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------------

def from_exact(p: ex.Point, shape=()) -> ExtPoint:
    x, y, z, t = p
    return ExtPoint(fe.const(x, shape), fe.const(y, shape),
                    fe.const(z, shape), fe.const(t, shape))


def from_exact_batch(points) -> ExtPoint:
    xs = fe.from_int_batch([p[0] for p in points])
    ys = fe.from_int_batch([p[1] for p in points])
    zs = fe.from_int_batch([p[2] for p in points])
    ts = fe.from_int_batch([p[3] for p in points])
    return ExtPoint(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), jnp.asarray(ts))


def to_exact_batch(p: ExtPoint):
    xs = fe.to_int_batch(p.x)
    ys = fe.to_int_batch(p.y)
    zs = fe.to_int_batch(p.z)
    ts = fe.to_int_batch(p.t)
    return list(zip(xs, ys, zs, ts))


# ---------------------------------------------------------------------------
# group law (raw, composable under jit)
# ---------------------------------------------------------------------------

def add_raw(p: ExtPoint, q: ExtPoint, need_t: bool = True) -> ExtPoint:
    m, a, s = fe._mul_raw, fe._add_raw, fe._sub_raw
    d2 = jnp.asarray(D2_LIMBS)
    A = m(s(p.y, p.x), s(q.y, q.x))
    B = m(a(p.y, p.x), a(q.y, q.x))
    C = m(m(p.t, d2), q.t)
    Dv = fe._mul_small_raw(m(p.z, q.z), 2)
    E = s(B, A)
    F = s(Dv, C)
    G = a(Dv, C)
    H = a(B, A)
    t = m(E, H) if need_t else p.t
    return ExtPoint(m(E, F), m(G, H), m(F, G), t)


def double_raw(p: ExtPoint, need_t: bool = True) -> ExtPoint:
    m, a, s = fe._mul_raw, fe._add_raw, fe._sub_raw
    sq = fe._square_raw
    A = sq(p.x)
    B = sq(p.y)
    C = fe._mul_small_raw(sq(p.z), 2)
    H = a(A, B)
    E = s(H, sq(a(p.x, p.y)))
    G = s(A, B)
    F = a(C, G)
    t = m(E, H) if need_t else p.t  # T only needed when an addition follows
    return ExtPoint(m(E, F), m(G, H), m(F, G), t)


def neg_raw(p: ExtPoint) -> ExtPoint:
    return ExtPoint(fe._neg_raw(p.x), p.y, p.z, fe._neg_raw(p.t))


def sub_raw(p: ExtPoint, q: ExtPoint) -> ExtPoint:
    return add_raw(p, neg_raw(q))


def select(cond: jnp.ndarray, p: ExtPoint, q: ExtPoint) -> ExtPoint:
    """cond: bool[...] broadcastable against the batch shape."""
    return ExtPoint(fe.select(cond, p.x, q.x), fe.select(cond, p.y, q.y),
                    fe.select(cond, p.z, q.z), fe.select(cond, p.t, q.t))


def eq_raw(p: ExtPoint, q: ExtPoint) -> jnp.ndarray:
    """Ristretto (coset-aware) equality: X1Y2==Y1X2 or X1X2==Y1Y2."""
    m = fe._mul_raw
    return fe.eq(m(p.x, q.y), m(p.y, q.x)) | fe.eq(m(p.x, q.x), m(p.y, q.y))


def is_identity_raw(p: ExtPoint) -> jnp.ndarray:
    """Identity coset: X == 0 or Y == 0 (covers all 4-torsion reps)."""
    return fe.is_zero(p.x) | fe.is_zero(p.y)


add = jax.jit(add_raw)
double = jax.jit(double_raw)
neg = jax.jit(neg_raw)
point_sub = jax.jit(sub_raw)
eq = jax.jit(eq_raw)
is_identity = jax.jit(is_identity_raw)


# ---------------------------------------------------------------------------
# scalar multiplication
# ---------------------------------------------------------------------------

WINDOW_BITS = 4
NWINDOWS = 256 // WINDOW_BITS  # 64 nibbles cover 256 bits (top always < 2^253)


def scalar_to_nibbles(s_bytes: np.ndarray) -> np.ndarray:
    """[..., 32] uint8 LE scalar bytes -> [..., 64] int32 nibble digits."""
    b = np.asarray(s_bytes, dtype=np.uint8)
    lo = (b & 0x0F).astype(np.int32)
    hi = (b >> 4).astype(np.int32)
    out = np.stack([lo, hi], axis=-1).reshape(b.shape[:-1] + (64,))
    return out


def scalars_to_nibbles(scalars) -> np.ndarray:
    """List of python ints mod l -> [n, 64] nibble digits."""
    arr = np.zeros((len(scalars), 32), dtype=np.uint8)
    for i, s in enumerate(scalars):
        arr[i] = np.frombuffer(ex.sc_to_bytes(s), dtype=np.uint8)
    return scalar_to_nibbles(arr)


def _lookup_16(table: ExtPoint, digit: jnp.ndarray) -> ExtPoint:
    """table: [..., 16, NLIMBS] coords; digit: int32[...] in [0,16)."""
    oh = jax.nn.one_hot(digit, 16, dtype=jnp.int32)  # [..., 16]

    def pick(coord):
        return jnp.sum(coord * oh[..., None], axis=-2)

    return ExtPoint(pick(table.x), pick(table.y), pick(table.z), pick(table.t))


def _build_window_table(p: ExtPoint) -> ExtPoint:
    """[..., 16, NLIMBS] per-coordinate multiples 0..15 of p.

    Rolled as a `lax.scan` of 14 sequential additions so the traced graph
    holds ONE point-add regardless of call-site count (the unrolled
    double-and-add chain used to inline ~10k HLO ops per scalar-mul site,
    the single largest contributor to verifier compile times).
    """

    def body(acc, _):
        nxt = add_raw(acc, p)
        return nxt, nxt

    # scan carries must have uniform varying-axis types under shard_map:
    # a concatenated point can mix sharded data coords with replicated
    # constant coords (e.g. z == 1 for decompressed inputs), while the
    # body's outputs are all-varying. Mixing a zero combination of every
    # coordinate into each coordinate (value unchanged) unifies the types.
    zmix = (p.x[..., :1] * 0 + p.y[..., :1] * 0
            + p.z[..., :1] * 0 + p.t[..., :1] * 0)
    init = ExtPoint(p.x + zmix, p.y + zmix, p.z + zmix, p.t + zmix)
    _, mult = jax.lax.scan(body, init, None, length=14)  # 2p .. 15p
    first = ExtPoint(*(jnp.stack([i_, p_], axis=0)
                       for i_, p_ in zip(identity(p.shape), p)))
    table = ExtPoint(*(jnp.concatenate([f, m], axis=0)
                       for f, m in zip(first, mult)))
    return ExtPoint(*(jnp.moveaxis(c, 0, -2) for c in table))


def scalar_mul_raw(nibbles: jnp.ndarray, p: ExtPoint) -> ExtPoint:
    """Variable-base scalar-mul: digits [..., 64] (little-endian nibbles).

    Fixed-shape windowed ladder under lax.fori_loop: every lane does
    identical work, no data-dependent control flow (TPU/XLA requirement).
    """
    table = _build_window_table(p)

    def body(i, acc):
        w = NWINDOWS - 1 - i
        for k in range(WINDOW_BITS):
            # T is only consumed by the trailing addition: elide it in the
            # first WINDOW_BITS-1 doublings (saves one field mul each)
            acc = double_raw(acc, need_t=(k == WINDOW_BITS - 1))
        digit = jnp.take(nibbles, w, axis=-1)
        return add_raw(acc, _lookup_16(table, digit))

    # first window without the leading doublings (acc is identity)
    acc = _lookup_16(table, nibbles[..., NWINDOWS - 1])
    return jax.lax.fori_loop(1, NWINDOWS, body, acc)


scalar_mul = jax.jit(scalar_mul_raw)


# fixed-base table: 64 windows x 16 entries of (16^w * k) * B, host-precomputed
_BASE_TABLE_NP = None


def _base_table() -> ExtPoint:
    global _BASE_TABLE_NP
    if _BASE_TABLE_NP is None:
        pts = []
        for w in range(NWINDOWS):
            base = ex.pt_mul(pow(16, w, ex.L), ex.BASEPOINT)
            row = [ex.IDENTITY]
            for k in range(1, 16):
                row.append(ex.pt_add(row[-1], base))
            pts.append(row)
        flat = [p for row in pts for p in row]
        _BASE_TABLE_NP = ExtPoint(
            *(fe.from_int_batch([p[i] for p in flat]).reshape(NWINDOWS, 16, fe.NLIMBS)
              for i in range(4)))
    return ExtPoint(*(jnp.asarray(c) for c in _BASE_TABLE_NP))


def base_mul_raw(nibbles: jnp.ndarray) -> ExtPoint:
    """Fixed-base scalar-mul: 64 table-lookup additions, zero doublings.

    The table rows hold (16^w * k) * B so window results add directly.
    """
    table = _base_table()
    batch = nibbles.shape[:-1]

    def body(w, acc):
        row = ExtPoint(*(jnp.broadcast_to(jnp.take(c, w, axis=0),
                                          batch + (16, fe.NLIMBS))
                         for c in table))
        return add_raw(acc, _lookup_16(row, jnp.take(nibbles, w, axis=-1)))

    return jax.lax.fori_loop(0, NWINDOWS, body, _identity_like(nibbles))


base_mul = jax.jit(base_mul_raw)


# ---------------------------------------------------------------------------
# ristretto encode / decode (batched, RFC 9496 §4.3)
# ---------------------------------------------------------------------------

INVSQRT_A_MINUS_D_LIMBS = fe.from_int(ex.INVSQRT_A_MINUS_D)
SQRT_AD_MINUS_ONE_LIMBS = fe.from_int(ex.SQRT_AD_MINUS_ONE)
SQRT_M1_LIMBS = fe.SQRT_M1_LIMBS
ONE_MINUS_D_SQ_LIMBS = fe.from_int(ex.ONE_MINUS_D_SQ)
D_MINUS_ONE_SQ_LIMBS = fe.from_int(ex.D_MINUS_ONE_SQ)


def compress_raw(p: ExtPoint) -> jnp.ndarray:
    """Ristretto encode -> canonical field element s as limbs [..., 24].

    Use :func:`field.to_bytes` on the result for the 32-byte wire form.
    """
    m, a, s_ = fe._mul_raw, fe._add_raw, fe._sub_raw
    x0, y0, z0, t0 = p
    u1 = m(a(z0, y0), s_(z0, y0))
    u2 = m(x0, y0)
    _, invsqrt = fe._sqrt_ratio_raw(fe.ones(u1.shape[:-1]), m(u1, m(u2, u2)))
    den1 = m(invsqrt, u1)
    den2 = m(invsqrt, u2)
    z_inv = m(m(den1, den2), t0)
    ix0 = m(x0, jnp.asarray(SQRT_M1_LIMBS))
    iy0 = m(y0, jnp.asarray(SQRT_M1_LIMBS))
    ench = m(den1, jnp.asarray(INVSQRT_A_MINUS_D_LIMBS))
    rotate = fe._is_negative_raw(m(t0, z_inv))
    x = fe.select(rotate, iy0, x0)
    y = fe.select(rotate, ix0, y0)
    den_inv = fe.select(rotate, ench, den2)
    y = fe.select(fe._is_negative_raw(m(x, z_inv)), fe._neg_raw(y), y)
    s = fe._cabs_raw(m(den_inv, s_(z0, y)))
    return fe._canonicalize_raw(s)


compress = jax.jit(compress_raw)


def compress_to_bytes(p: ExtPoint) -> np.ndarray:
    return fe.to_bytes(compress(p))


def decompress_raw(s: jnp.ndarray):
    """Ristretto decode from canonical limbs [..., 24].

    Returns (ok bool[...], point). Caller must have validated canonicity of
    the byte input (fe.from_bytes of canonical bytes is canonical).
    """
    m, a, s_ = fe._mul_raw, fe._add_raw, fe._sub_raw
    one = fe.ones(s.shape[:-1])
    ss = m(s, s)
    u1 = s_(one, ss)
    u2 = a(one, ss)
    u2_sqr = m(u2, u2)
    d = jnp.asarray(D_LIMBS)
    v = s_(fe._neg_raw(m(d, m(u1, u1))), u2_sqr)
    was_square, invsqrt = fe._sqrt_ratio_raw(one, m(v, u2_sqr))
    den_x = m(invsqrt, u2)
    den_y = m(m(invsqrt, den_x), v)
    x = fe._cabs_raw(m(fe._mul_small_raw(s, 2), den_x))
    y = m(u1, den_y)
    t = m(x, y)
    ok = was_square & ~fe._is_negative_raw(t) & ~fe.is_zero(y)
    ok = ok & ~fe._is_negative_raw(s)
    return ok, ExtPoint(x, y, one, t)


decompress = jax.jit(decompress_raw)


def decompress_from_bytes(b: np.ndarray):
    """[..., 32] uint8 -> (ok, ExtPoint); rejects non-canonical encodings."""
    b = np.asarray(b, dtype=np.uint8)
    # canonicity: value < p and high bit clear
    as_int = b.astype(np.int64)
    noncanon = (as_int[..., 31] & 0x80) != 0
    # value >= p check: only possible if bytes 1..30 are 0xff-ish; exact check
    vals = [int.from_bytes(bytes(row), "little") for row in b.reshape(-1, 32)]
    ge_p = np.array([v >= ex.P for v in vals], dtype=bool).reshape(b.shape[:-1])
    ok_enc = ~(noncanon | ge_p)
    limbs = jnp.asarray(fe.from_bytes(b))
    ok, p = decompress(limbs)
    return jnp.logical_and(ok, jnp.asarray(ok_enc)), p


# ---------------------------------------------------------------------------
# elligator one-way map (batched)
# ---------------------------------------------------------------------------

def map_to_point_raw(t: jnp.ndarray) -> ExtPoint:
    """ristretto255 one-way MAP on field limbs [..., 24]."""
    m, a, s_ = fe._mul_raw, fe._add_raw, fe._sub_raw
    one = fe.ones(t.shape[:-1])
    sqrt_m1 = jnp.asarray(SQRT_M1_LIMBS)
    d = jnp.asarray(D_LIMBS)
    r = m(sqrt_m1, m(t, t))
    u = m(a(r, one), jnp.asarray(ONE_MINUS_D_SQ_LIMBS))
    v = m(s_(fe._neg_raw(one), m(r, d)), a(r, d))
    was_square, s = fe._sqrt_ratio_raw(u, v)
    s_prime = fe._neg_raw(fe._cabs_raw(m(s, t)))
    s = fe.select(was_square, s, s_prime)
    c = fe.select(was_square, fe._neg_raw(one), r)
    n = s_(m(m(c, s_(r, one)), jnp.asarray(D_MINUS_ONE_SQ_LIMBS)), v)
    w0 = fe._mul_small_raw(m(s, v), 2)
    w1 = m(n, jnp.asarray(SQRT_AD_MINUS_ONE_LIMBS))
    w2 = s_(one, m(s, s))
    w3 = a(one, m(s, s))
    return ExtPoint(m(w0, w3), m(w2, w1), m(w1, w3), m(w0, w2))


map_to_point = jax.jit(map_to_point_raw)


def from_uniform_bytes(b: np.ndarray) -> ExtPoint:
    """[..., 64] uint8 -> point (sum of two elligator maps), batched."""
    b = np.asarray(b, dtype=np.uint8)
    t1 = jnp.asarray(fe.from_bytes(b[..., :32]))
    t2 = jnp.asarray(fe.from_bytes(b[..., 32:]))
    return add(map_to_point(t1), map_to_point(t2))


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def sum_points_raw(p: ExtPoint, axis: int = 0) -> ExtPoint:
    """Tree-reduce point addition along a batch axis (log2 depth)."""
    if axis < 0:
        axis = p.x.ndim - 1 + axis  # relative to batch dims

    def take(pt, sl):
        idx = (slice(None),) * axis + (sl,)
        return ExtPoint(pt.x[idx], pt.y[idx], pt.z[idx], pt.t[idx])

    def cat(a_, b_):
        return ExtPoint(*(jnp.concatenate([ca, cb], axis=axis)
                          for ca, cb in zip(a_, b_)))

    n = p.x.shape[axis]
    while n > 1:
        if n % 2:
            idx = (slice(None),) * axis + (slice(0, 1),)
            zx = p.x[idx] * 0
            one = jnp.zeros((fe.NLIMBS,), dtype=jnp.int32).at[0].set(1)
            p = cat(p, ExtPoint(zx, zx + one, zx + one, zx))
            n += 1
        half = n // 2
        p = add_raw(take(p, slice(0, half)), take(p, slice(half, n)))
        n = half
    return take(p, 0)


sum_points = jax.jit(sum_points_raw, static_argnums=1)
