"""In-kernel field arithmetic helpers for Pallas TPU kernels (limb-major).

These are plain jnp functions designed to run *inside* Pallas kernel bodies
on limb-major values (shape [NLIMBS, TILE]: limbs on sublanes, batch on
lanes — full 128-lane utilization). They mirror :mod:`quisquis_tpu.ops.field`
exactly, including the trace-time interval-certified carry/fold reduction,
and are tested bit-exact against it.

Why a second implementation: Mosaic compiles the limb convolution ~1.7x
faster than XLA's fusion of the same ops, and keeping a whole scalar-mul
ladder in one kernel keeps the window table and accumulator in VMEM for the
entire 64-window loop (see :mod:`quisquis_tpu.ops.pallas_point`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from . import field as fe

NLIMBS = fe.NLIMBS
BITS = fe.BITS
MASK = fe.MASK
FOLD = fe.FOLD
INT32_MAX = fe.INT32_MAX
CONTRACT = fe.CONTRACT

_i32 = jnp.int32


def _zrows(n: int, tile: int):
    return jnp.zeros((n, tile), dtype=_i32)


def _carry_step(x, bounds):
    tile = x.shape[1]
    lo = jnp.bitwise_and(x, MASK)
    hi = jnp.right_shift(x, BITS)
    lo = jnp.concatenate([lo, _zrows(1, tile)], axis=0)
    hi = jnp.concatenate([_zrows(1, tile), hi], axis=0)
    w = len(bounds)
    nb = [0] * (w + 1)
    for k in range(w + 1):
        b_lo = min(bounds[k], MASK) if k < w else 0
        b_hi = (bounds[k - 1] >> BITS) if k > 0 else 0
        nb[k] = b_lo + b_hi
    return lo + hi, nb


def _fold_step(x, bounds):
    tile = x.shape[1]
    w = len(bounds)
    assert w <= 2 * NLIMBS
    lo = x[:NLIMBS]
    hi = x[NLIMBS:]
    if w < 2 * NLIMBS:  # zero-row concat is rejected by Mosaic
        hi = jnp.concatenate([hi, _zrows(2 * NLIMBS - w, tile)], axis=0)
    nb = [0] * NLIMBS
    for k in range(NLIMBS):
        b_lo = bounds[k] if k < w else 0
        b_hi = bounds[NLIMBS + k] if NLIMBS + k < w else 0
        assert b_lo + FOLD * b_hi <= INT32_MAX, (k, b_lo, b_hi)
        nb[k] = b_lo + FOLD * b_hi
    return lo + FOLD * hi, nb


def _trim_step(x, bounds):
    top = x[NLIMBS - 1:NLIMBS]
    extra = jnp.right_shift(top, 2)
    new_top = jnp.bitwise_and(top, 3)
    new_first = x[0:1] + extra * 19
    x = jnp.concatenate([new_first, x[1:NLIMBS - 1], new_top], axis=0)
    nb = list(bounds)
    nb[0] = bounds[0] + 19 * (bounds[NLIMBS - 1] >> 2)
    nb[NLIMBS - 1] = min(bounds[NLIMBS - 1], 3)
    assert nb[0] <= INT32_MAX
    return x, nb


def reduce_bounded(x, bounds):
    """Limb-major mirror of field._reduce_bounded (same certified schedule)."""
    for _ in range(64):
        w = len(bounds)
        if w == NLIMBS and all(b <= c for b, c in zip(bounds, CONTRACT)):
            return x
        if w == NLIMBS and all(b <= c for b, c in zip(bounds[1:-1], CONTRACT[1:-1])):
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
    raise AssertionError("reduction did not converge")


_W = 2 * NLIMBS - 1


def k_mul(a, b):
    """[24,T] x [24,T] field mul via rolled convolution + certified reduce."""
    tile = a.shape[1]
    zpad = _zrows(_W - NLIMBS, tile)
    acc = None
    for i in range(NLIMBS):
        term = jnp.concatenate([a[i:i + 1] * b, zpad], axis=0)
        shifted = pltpu.roll(term, i, 0) if i else term
        acc = shifted if acc is None else acc + shifted
    col_bounds = [
        sum(CONTRACT[i] * CONTRACT[k - i]
            for i in range(max(0, k - NLIMBS + 1), min(k, NLIMBS - 1) + 1))
        for k in range(_W)
    ]
    assert max(col_bounds) <= INT32_MAX
    return reduce_bounded(acc, col_bounds)


def k_square(a):
    """Symmetric-convolution squaring, limb-major."""
    tile = a.shape[1]
    zpad = _zrows(_W - NLIMBS, tile)
    a2 = a * 2
    acc = None
    for i in range(NLIMBS):
        # cross terms a_i * 2*a_j (j > i) at offset i (rows j+i), self a_i^2
        # build the row-block: [0]*i? -> construct term vector of width W:
        # rows j for j >= i: at position i+j
        self_sq = a[i:i + 1] * a[i:i + 1]
        if i + 1 < NLIMBS:
            cross = a[i:i + 1] * a2[i + 1:]
            block = jnp.concatenate(
                [self_sq, cross, _zrows(_W - (NLIMBS - i), tile)], axis=0)
        else:
            block = jnp.concatenate([self_sq, _zrows(_W - 1, tile)], axis=0)
        acc_i = pltpu.roll(block, 2 * i, 0) if i else block
        acc = acc_i if acc is None else acc + acc_i
    col_bounds = []
    for k in range(_W):
        bnd = 0
        for i in range(max(0, k - NLIMBS + 1), min(k, NLIMBS - 1) + 1):
            j = k - i
            if i < j:
                bnd += 2 * CONTRACT[i] * CONTRACT[j]
            elif i == j:
                bnd += CONTRACT[i] * CONTRACT[i]
        col_bounds.append(bnd)
    assert max(col_bounds) <= INT32_MAX
    return reduce_bounded(acc, col_bounds)


def k_add(a, b):
    return reduce_bounded(a + b, [2 * c for c in CONTRACT])


def k_sub(a, b, bias):
    """bias: [24, 1] limb-major subtraction bias (pass fe.BIAS as an input —
    Pallas kernels cannot capture array constants)."""
    return reduce_bounded(a + bias - b,
                          [c + int(v) for c, v in zip(CONTRACT, fe.BIAS)])


def k_mul_small(a, c: int):
    assert c * fe.LOOSE0 <= INT32_MAX
    return reduce_bounded(a * c, [b * c for b in CONTRACT])
