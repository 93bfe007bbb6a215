"""Pallas TPU mega-kernel: batched variable-base scalar multiplication.

The entire 4-bit windowed ladder — per-point 16-entry table build, 64
windows of (4 doublings + table-lookup addition) — runs inside ONE Pallas
kernel per batch tile: the table (16 x 4 coords x 24 limbs per lane) and the
accumulator live in VMEM for the whole ladder, eliminating HBM round-trips
between the ~2500 field multiplications of a scalar-mul. Limb-major layout
([24, TILE]: batch on the 128-wide lane axis) gives full VPU lane
utilization; Mosaic compiles the rolled limb convolution ~1.7x faster than
the XLA fusion of the same computation.

Bit-exact vs :func:`quisquis_tpu.ops.point.scalar_mul` (tests).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import exact as ex
from . import field as fe
from . import point as pt
from . import pallas_field as kf

NL = fe.NLIMBS
def _cfg_tile() -> int:
    from ..config import DEFAULT
    return DEFAULT.pallas_tile


def _cfg_msm_tile() -> int:
    from ..config import DEFAULT
    return DEFAULT.msm_tile


TILE = 512

#: kernel constants input: rows [0:24] = subtraction bias, [24:48] = 2d limbs
_CONSTS = np.concatenate([
    np.asarray(fe.BIAS, dtype=np.int32).reshape(NL, 1),
    np.asarray(fe.from_int(ex.D2)).reshape(NL, 1),
], axis=0)


def _k_double(x, y, z, t, bias, need_t: bool):
    m, sq = kf.k_mul, kf.k_square
    A = sq(x)
    B = sq(y)
    C = kf.k_mul_small(sq(z), 2)
    H = kf.k_add(A, B)
    E = kf.k_sub(H, sq(kf.k_add(x, y)), bias)
    G = kf.k_sub(A, B, bias)
    F = kf.k_add(C, G)
    nt = m(E, H) if need_t else t
    return m(E, F), m(G, H), m(F, G), nt


def _k_add_pt(p, q, bias, d2, need_t: bool):
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    m = kf.k_mul
    A = m(kf.k_sub(y1, x1, bias), kf.k_sub(y2, x2, bias))
    B = m(kf.k_add(y1, x1), kf.k_add(y2, x2))
    C = m(m(t1, d2), t2)
    Dv = kf.k_mul_small(m(z1, z2), 2)
    E = kf.k_sub(B, A, bias)
    F = kf.k_sub(Dv, C, bias)
    G = kf.k_add(Dv, C)
    H = kf.k_add(B, A)
    nt = m(E, H) if need_t else t1
    return m(E, F), m(G, H), m(F, G), nt


def _scalar_mul_kernel(consts_ref, nib_ref, x_ref, y_ref, z_ref, t_ref,
                       ox_ref, oy_ref, oz_ref, ot_ref):
    tile = x_ref.shape[1]
    bias = consts_ref[0:NL]
    d2 = consts_ref[NL:2 * NL]
    p = (x_ref[:], y_ref[:], z_ref[:], t_ref[:])

    # 16-entry window table, each entry 4 coords of [24, TILE]
    zeros = jnp.zeros((NL, tile), jnp.int32)
    # field element 1 without scatter (unsupported in Mosaic): row-0 indicator
    one = (jax.lax.broadcasted_iota(jnp.int32, (NL, tile), 0) == 0).astype(jnp.int32)
    table = [(zeros, one, one, zeros), p]
    for k in range(2, 16):
        if k % 2 == 0:
            table.append(_k_double(*table[k // 2], bias, True))
        else:
            table.append(_k_add_pt(table[k - 1], p, bias, d2, True))

    # stack per-coordinate: [16*24, TILE] for one-hot summation
    tx = jnp.concatenate([e[0] for e in table], axis=0)
    ty = jnp.concatenate([e[1] for e in table], axis=0)
    tz = jnp.concatenate([e[2] for e in table], axis=0)
    tt = jnp.concatenate([e[3] for e in table], axis=0)

    def lookup(digit):
        # digit: [1, TILE] int32; one-hot over 16 entries expanded to rows
        ids = jax.lax.broadcasted_iota(jnp.int32, (16 * NL, tile), 0) // NL
        oh = (ids == digit).astype(jnp.int32)  # broadcasts [1,TILE]
        px = (tx * oh).reshape(16, NL, tile).sum(axis=0)
        py = (ty * oh).reshape(16, NL, tile).sum(axis=0)
        pz = (tz * oh).reshape(16, NL, tile).sum(axis=0)
        ptt = (tt * oh).reshape(16, NL, tile).sum(axis=0)
        return px, py, pz, ptt

    acc = lookup(nib_ref[pl.ds(63, 1), :])

    def body(i, acc):
        w = 62 - i
        for k in range(4):
            acc = _k_double(*acc, bias, need_t=(k == 3))
        digit = nib_ref[pl.ds(w, 1), :]
        return _k_add_pt(acc, lookup(digit), bias, d2, need_t=True)

    acc = jax.lax.fori_loop(0, 63, body, acc)
    ox_ref[:], oy_ref[:], oz_ref[:], ot_ref[:] = acc


@partial(jax.jit, static_argnames=("tile", "interpret"))
def scalar_mul_lm(nibbles_lm: jnp.ndarray, x, y, z, t, tile: int = TILE,
                  interpret: bool = False):
    """Limb-major batched scalar-mul: nibbles [64, B], coords [24, B]."""
    B = x.shape[1]
    assert B % tile == 0, (B, tile)
    spec_n = pl.BlockSpec((64, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((NL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((2 * NL, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scalar_mul_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((NL, B), jnp.int32) for _ in range(4)),
        grid=(B // tile,),
        in_specs=[spec_k, spec_n, spec_c, spec_c, spec_c, spec_c],
        out_specs=(spec_c, spec_c, spec_c, spec_c),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), nibbles_lm, x, y, z, t)
    return out


def scalar_mul_pallas(nibbles: jnp.ndarray, p: pt.ExtPoint,
                      tile: int = TILE, interpret: bool = False) -> pt.ExtPoint:
    """Drop-in for point.scalar_mul: nibbles [B, 64], ExtPoint [B, 24] coords.

    Transposes at the boundary (2 transposes amortized over ~2500 field muls).
    Pass interpret=True to run on CPU (tests).
    """
    nib_lm = nibbles.T
    ox, oy, oz, ot = scalar_mul_lm(nib_lm, p.x.T, p.y.T, p.z.T, p.t.T,
                                   tile=tile, interpret=interpret)
    return pt.ExtPoint(ox.T, oy.T, oz.T, ot.T)


# ---------------------------------------------------------------------------
# fixed-base (basepoint) mega-kernel
# ---------------------------------------------------------------------------
#
# Global table: 64 windows x 16 entries of (16^w * k) * B precomputed on the
# host in affine *niels* form (y+x, y-x, 2d*t) with z=1, so each window is a
# 7-multiply mixed addition. The whole table is ~1.1 MB and lives in VMEM.
# Entry 0 (identity) has (1, 1, 0): the complete formulas handle it.

_NIELS_TABLE_NP = None


def _niels_base_table() -> np.ndarray:
    """[3*16*24, 64]: rows = (coord, entry, limb), cols = window."""
    global _NIELS_TABLE_NP
    if _NIELS_TABLE_NP is None:
        d2 = ex.D2
        out = np.zeros((3 * 16 * NL, 64), dtype=np.int32)
        for w in range(64):
            base = ex.pt_mul(pow(16, w, ex.L), ex.BASEPOINT)
            entry = ex.IDENTITY
            for k in range(16):
                X, Y, Z, T = entry
                zi = ex.fe_invert(Z)
                x, y = X * zi % ex.P, Y * zi % ex.P
                t = x * y % ex.P
                yx = (y + x) % ex.P
                ymx = (y - x) % ex.P
                td2 = t * d2 % ex.P
                for ci, v in enumerate((yx, ymx, td2)):
                    limbs = fe.from_int(v)
                    out[ci * 16 * NL + k * NL:(ci * 16 * NL + (k + 1) * NL), w] = limbs
                entry = ex.pt_add(entry, base)
        _NIELS_TABLE_NP = out
    return _NIELS_TABLE_NP


def _k_add_niels(p, yx2, ymx2, td2_2, bias, need_t: bool):
    """Mixed addition with an affine niels point (z2=1): 7 muls."""
    x1, y1, z1, t1 = p
    m = kf.k_mul
    A = m(kf.k_sub(y1, x1, bias), ymx2)
    B = m(kf.k_add(y1, x1), yx2)
    C = m(t1, td2_2)
    Dv = kf.k_mul_small(z1, 2)
    E = kf.k_sub(B, A, bias)
    F = kf.k_sub(Dv, C, bias)
    G = kf.k_add(Dv, C)
    H = kf.k_add(B, A)
    nt = m(E, H) if need_t else t1
    return m(E, F), m(G, H), m(F, G), nt


def _base_mul_kernel(consts_ref, table_ref, nib_ref,
                     ox_ref, oy_ref, oz_ref, ot_ref):
    tile = ox_ref.shape[1]
    bias = consts_ref[0:NL]

    zeros = jnp.zeros((NL, tile), jnp.int32)
    one = (jax.lax.broadcasted_iota(jnp.int32, (NL, tile), 0) == 0).astype(jnp.int32)
    acc = (zeros, one, one, zeros)

    ids = jax.lax.broadcasted_iota(jnp.int32, (16 * NL, tile), 0) // NL
    wids = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    table = table_ref[:]  # [3*16*24, 64]

    def body(w, acc):
        digit = nib_ref[pl.ds(w, 1), :]          # [1, tile]
        # select window column w without dynamic lane slicing (needs 128
        # alignment): one-hot over the 64 window columns + lane reduction
        wsel = (wids == w).astype(jnp.int32)     # [1, 64]
        col = (table * wsel).sum(axis=1, keepdims=True)  # [3*16*24, 1]
        oh = (ids == digit).astype(jnp.int32)    # [16*24, tile]
        yx = (col[0:16 * NL] * oh).reshape(16, NL, tile).sum(axis=0)
        ymx = (col[16 * NL:2 * 16 * NL] * oh).reshape(16, NL, tile).sum(axis=0)
        td2 = (col[2 * 16 * NL:] * oh).reshape(16, NL, tile).sum(axis=0)
        return _k_add_niels(acc, yx, ymx, td2, bias, need_t=True)

    acc = jax.lax.fori_loop(0, 64, body, acc)
    ox_ref[:], oy_ref[:], oz_ref[:], ot_ref[:] = acc


@partial(jax.jit, static_argnames=("tile", "interpret"))
def base_mul_lm(nibbles_lm: jnp.ndarray, tile: int = TILE,
                interpret: bool = False):
    B = nibbles_lm.shape[1]
    assert B % tile == 0
    spec_n = pl.BlockSpec((64, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((NL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((2 * NL, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((3 * 16 * NL, 64), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _base_mul_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((NL, B), jnp.int32) for _ in range(4)),
        grid=(B // tile,),
        in_specs=[spec_k, spec_t, spec_n],
        out_specs=(spec_c, spec_c, spec_c, spec_c),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), jnp.asarray(_niels_base_table()), nibbles_lm)
    return out


def base_mul_pallas(nibbles: jnp.ndarray, tile: int = 0,
                    interpret: bool = False) -> pt.ExtPoint:
    """Fixed-base scalar-mul: 64 niels mixed additions, zero doublings."""
    tile = tile or _cfg_tile()
    ox, oy, oz, ot = base_mul_lm(nibbles.T, tile=tile, interpret=interpret)
    return pt.ExtPoint(ox.T, oy.T, oz.T, ot.T)


# ---------------------------------------------------------------------------
# MSM mega-kernel: shared-doubling Pippenger window accumulation
# ---------------------------------------------------------------------------
#
# sum_i s_i*P_i = sum_w 16^w * T_w with T_w = sum_i digit_{i,w} * P_i.
# The sequential grid walks point tiles; 64 per-window lane accumulators
# (one point per window per lane) live in the revisited output block in
# VMEM for the whole run. Each tile costs 14 table ops + 64 lookup-adds
# per lane (~78 point-ops/point vs ~331 for the per-point ladder); the
# tiny [64, tile] -> 1 tail (lane tree-reduce + Horner doubling chain)
# runs in XLA afterwards.

MSM_TILE = 128  # autotuned on v5e: 128 beats 256/512 at 2^16 (~12% faster)
WGROUP = 8  # windows handled per accumulation grid step (64 / WGROUP groups)


def _msm_table_kernel(consts_ref, x_ref, y_ref, z_ref, t_ref,
                      tx_ref, ty_ref, tz_ref, tt_ref):
    """Per-point 16-entry small-multiple tables: [NL, tile] -> [16*NL, tile]."""
    tile = x_ref.shape[1]
    bias = consts_ref[0:NL]
    d2 = consts_ref[NL:2 * NL]
    p = (x_ref[:], y_ref[:], z_ref[:], t_ref[:])
    zeros = jnp.zeros((NL, tile), jnp.int32)
    one = (jax.lax.broadcasted_iota(jnp.int32, (NL, tile), 0) == 0).astype(jnp.int32)
    table = [(zeros, one, one, zeros), p]
    for k in range(2, 16):
        if k % 2 == 0:
            table.append(_k_double(*table[k // 2], bias, True))
        else:
            table.append(_k_add_pt(table[k - 1], p, bias, d2, True))
    tx_ref[:] = jnp.concatenate([e[0] for e in table], axis=0)
    ty_ref[:] = jnp.concatenate([e[1] for e in table], axis=0)
    tz_ref[:] = jnp.concatenate([e[2] for e in table], axis=0)
    tt_ref[:] = jnp.concatenate([e[3] for e in table], axis=0)


def _msm_acc_kernel(consts_ref, nib_ref, tx_ref, ty_ref, tz_ref, tt_ref,
                    ox_ref, oy_ref, oz_ref, ot_ref, *, wgroup: int,
                    tpr: int = 0):
    """Accumulate WGROUP window sums over point tiles.

    Grid (wgroups, tiles), tiles innermost: each output block (one point
    per window in the group, per lane) stays in VMEM across its whole
    run of tile steps (classic revisited-accumulator pattern); all slicing
    is static. With `tpr` (tiles-per-row, rows-MSM mode) the accumulator
    resets every `tpr` tiles so each row of points folds into its own
    block."""
    tile = tx_ref.shape[1]
    bias = consts_ref[0:NL]
    d2 = consts_ref[NL:2 * NL]
    i_tile = pl.program_id(1)

    @pl.when(i_tile % tpr == 0 if tpr else i_tile == 0)
    def _init():
        zeros = jnp.zeros((wgroup * NL, tile), jnp.int32)
        one = (jax.lax.broadcasted_iota(jnp.int32, (wgroup * NL, tile), 0) % NL
               == 0).astype(jnp.int32)
        ox_ref[:] = zeros
        oy_ref[:] = one
        oz_ref[:] = one
        ot_ref[:] = zeros

    tx, ty, tz, tt = tx_ref[:], ty_ref[:], tz_ref[:], tt_ref[:]
    ids = jax.lax.broadcasted_iota(jnp.int32, (16 * NL, tile), 0) // NL
    for j in range(wgroup):
        digit = nib_ref[j:j + 1, :]
        oh = (ids == digit).astype(jnp.int32)
        q = ((tx * oh).reshape(16, NL, tile).sum(axis=0),
             (ty * oh).reshape(16, NL, tile).sum(axis=0),
             (tz * oh).reshape(16, NL, tile).sum(axis=0),
             (tt * oh).reshape(16, NL, tile).sum(axis=0))
        sl = slice(j * NL, (j + 1) * NL)
        acc = (ox_ref[sl], oy_ref[sl], oz_ref[sl], ot_ref[sl])
        nx, ny, nz, nt = _k_add_pt(acc, q, bias, d2, True)
        ox_ref[sl] = nx
        oy_ref[sl] = ny
        oz_ref[sl] = nz
        ot_ref[sl] = nt


@partial(jax.jit, static_argnames=("tile", "wgroup", "interpret"))
def msm_window_sums_lm(nibbles_lm: jnp.ndarray, x, y, z, t,
                       tile: int = MSM_TILE, wgroup: int = WGROUP,
                       interpret: bool = False):
    """Per-window lane accumulators: nibbles [64, B], coords [24, B] ->
    4 x [64*NL, tile] (window-major rows)."""
    B = x.shape[1]
    assert B % tile == 0, (B, tile)
    spec_c = pl.BlockSpec((NL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_k1 = pl.BlockSpec((2 * NL, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_t1 = pl.BlockSpec((16 * NL, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tabs = pl.pallas_call(
        _msm_table_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((16 * NL, B), jnp.int32)
                        for _ in range(4)),
        grid=(B // tile,),
        in_specs=[spec_k1, spec_c, spec_c, spec_c, spec_c],
        out_specs=(spec_t1, spec_t1, spec_t1, spec_t1),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), x, y, z, t)

    spec_k2 = pl.BlockSpec((2 * NL, 1), lambda g, i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_n2 = pl.BlockSpec((wgroup, tile), lambda g, i: (g, i),
                           memory_space=pltpu.VMEM)
    spec_t2 = pl.BlockSpec((16 * NL, tile), lambda g, i: (0, i),
                           memory_space=pltpu.VMEM)
    spec_o2 = pl.BlockSpec((wgroup * NL, tile), lambda g, i: (g, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_msm_acc_kernel, wgroup=wgroup),
        out_shape=tuple(jax.ShapeDtypeStruct((64 * NL, tile), jnp.int32)
                        for _ in range(4)),
        grid=(64 // wgroup, B // tile),
        in_specs=[spec_k2, spec_n2, spec_t2, spec_t2, spec_t2, spec_t2],
        out_specs=(spec_o2, spec_o2, spec_o2, spec_o2),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), nibbles_lm, *tabs)


def _msm_tail_kernel(consts_ref, wx_ref, wy_ref, wz_ref, wt_ref,
                     ox_ref, oy_ref, oz_ref, ot_ref):
    """Horner fold of the 64 window accumulators + lane reduction, in VMEM.

    Inputs are the window-major lane accumulators [64*NL, tile]. The Horner
    recurrence acc = 16*acc + W_w runs PER LANE (every lane folds its own
    window partials — sum_lane sum_w 16^w P[w,lane] == sum_w 16^w T_w), so
    all 63 iterations operate on full [NL, tile] blocks; a single log-step
    lane tree-reduce (circular roll + add) at the end produces the total in
    every lane. One kernel launch replaces ~320 tiny sequential XLA point
    ops — the fixed tail that dominated MSM wall-clock at 2^16 points.
    """
    tile = wx_ref.shape[1]
    bias = consts_ref[0:NL]
    d2 = consts_ref[NL:2 * NL]

    def win(w):
        idx = pl.multiple_of(w * NL, 8)
        return (wx_ref[pl.ds(idx, NL)], wy_ref[pl.ds(idx, NL)],
                wz_ref[pl.ds(idx, NL)], wt_ref[pl.ds(idx, NL)])

    def body(i, acc):
        w = 62 - i
        for k in range(4):
            acc = _k_double(*acc, bias, need_t=(k == 3))
        return _k_add_pt(acc, win(w), bias, d2, need_t=True)

    acc = jax.lax.fori_loop(0, 63, body, win(63))

    step = tile // 2
    while step:
        rolled = tuple(pltpu.roll(c, step, 1) for c in acc)
        acc = _k_add_pt(acc, rolled, bias, d2, need_t=True)
        step //= 2

    ox_ref[:], oy_ref[:], oz_ref[:], ot_ref[:] = acc


@partial(jax.jit, static_argnames=("tile", "wgroup", "interpret"))
def msm_pallas(nibbles: jnp.ndarray, p: pt.ExtPoint,
               tile: int = 0, wgroup: int = WGROUP,
               interpret: bool = False) -> pt.ExtPoint:
    """Full MSM: batch [B, 64] digits + ExtPoint batch [B] -> single point.

    Pads the batch to a tile multiple with zero digits + identity points
    (contributing nothing); three Pallas kernels run back to back (per-point
    tables -> window accumulation -> Horner/lane-reduce tail), keeping the
    whole pipeline on device with no per-point-op dispatch overhead.
    """
    tile = tile or _cfg_msm_tile()
    B = nibbles.shape[0]
    pad = (-B) % tile
    if pad:
        nibbles = jnp.concatenate(
            [nibbles, jnp.zeros((pad, 64), nibbles.dtype)], axis=0)
        idp = pt.identity((pad,))
        p = pt.ExtPoint(*(jnp.concatenate([a, b], axis=0)
                          for a, b in zip(p, idp)))
    ox, oy, oz, ot = msm_window_sums_lm(nibbles.T, p.x.T, p.y.T, p.z.T, p.t.T,
                                        tile=tile, wgroup=wgroup,
                                        interpret=interpret)
    spec_w = pl.BlockSpec((64 * NL, tile), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((NL, tile), memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((2 * NL, 1), memory_space=pltpu.VMEM)
    rx, ry, rz, rt = pl.pallas_call(
        _msm_tail_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((NL, tile), jnp.int32)
                        for _ in range(4)),
        in_specs=[spec_k, spec_w, spec_w, spec_w, spec_w],
        out_specs=(spec_o, spec_o, spec_o, spec_o),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), ox, oy, oz, ot)
    return pt.ExtPoint(rx[:, 0], ry[:, 0], rz[:, 0], rt[:, 0])


@partial(jax.jit, static_argnames=("tile", "wgroup", "interpret"))
def msm_rows_pallas(nibbles: jnp.ndarray, p: pt.ExtPoint,
                    tile: int = 0, wgroup: int = WGROUP,
                    interpret: bool = False) -> pt.ExtPoint:
    """Per-row MSM on the 3-kernel pipeline: nibbles [R, k, 64] over
    ExtPoint [R, k] -> ExtPoint [R].

    Every row combines its OWN point set (the Pallas twin of
    msm.msm_rows_raw): rows are padded to a whole number of lane tiles
    (zero digits on identity points contribute nothing), the window
    accumulator resets at each row boundary (`tpr` mode of
    _msm_acc_kernel), and the Horner/lane-reduce tail runs once per row.
    Replaces ~7,000 dispatch-bound tiny XLA point ops with 3 kernel
    launches for workloads like the shuffle verifier's per-lane statement
    aggregations ((G, H) = sum_i x^i pk_i + DDH/reencryption responses).
    """
    tile = tile or _cfg_msm_tile()
    R, k = nibbles.shape[0], nibbles.shape[1]
    pad = (-k) % tile
    if pad:
        nibbles = jnp.concatenate(
            [nibbles, jnp.zeros((R, pad, 64), nibbles.dtype)], axis=1)
        idp = pt.identity((R, pad))
        p = pt.ExtPoint(*(jnp.concatenate([a, b], axis=1)
                          for a, b in zip(p, idp)))
    kp = k + pad
    tpr = kp // tile
    B = R * kp
    nib_lm = nibbles.reshape(B, 64).T                 # [64, R*kp]
    cx, cy, cz, ct = (c.reshape(B, NL).T for c in p)  # [24, R*kp]

    spec_c = pl.BlockSpec((NL, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_k1 = pl.BlockSpec((2 * NL, 1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_t1 = pl.BlockSpec((16 * NL, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tabs = pl.pallas_call(
        _msm_table_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((16 * NL, B), jnp.int32)
                        for _ in range(4)),
        grid=(B // tile,),
        in_specs=[spec_k1, spec_c, spec_c, spec_c, spec_c],
        out_specs=(spec_t1, spec_t1, spec_t1, spec_t1),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), cx, cy, cz, ct)

    spec_k2 = pl.BlockSpec((2 * NL, 1), lambda g, i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_n2 = pl.BlockSpec((wgroup, tile), lambda g, i: (g, i),
                           memory_space=pltpu.VMEM)
    spec_t2 = pl.BlockSpec((16 * NL, tile), lambda g, i: (0, i),
                           memory_space=pltpu.VMEM)
    # one accumulator block per (window group, ROW): i // tpr
    spec_o2 = pl.BlockSpec((wgroup * NL, tile),
                           lambda g, i, _tpr=tpr: (g, i // _tpr),
                           memory_space=pltpu.VMEM)
    wx, wy, wz, wt = pl.pallas_call(
        partial(_msm_acc_kernel, wgroup=wgroup, tpr=tpr),
        out_shape=tuple(jax.ShapeDtypeStruct((64 * NL, R * tile), jnp.int32)
                        for _ in range(4)),
        grid=(64 // wgroup, B // tile),
        in_specs=[spec_k2, spec_n2, spec_t2, spec_t2, spec_t2, spec_t2],
        out_specs=(spec_o2, spec_o2, spec_o2, spec_o2),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), nib_lm, *tabs)

    spec_w3 = pl.BlockSpec((64 * NL, tile), lambda r: (0, r),
                           memory_space=pltpu.VMEM)
    spec_o3 = pl.BlockSpec((NL, tile), lambda r: (0, r),
                           memory_space=pltpu.VMEM)
    spec_k3 = pl.BlockSpec((2 * NL, 1), lambda r: (0, 0),
                           memory_space=pltpu.VMEM)
    rx, ry, rz, rt = pl.pallas_call(
        _msm_tail_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((NL, R * tile), jnp.int32)
                        for _ in range(4)),
        grid=(R,),
        in_specs=[spec_k3, spec_w3, spec_w3, spec_w3, spec_w3],
        out_specs=(spec_o3, spec_o3, spec_o3, spec_o3),
        interpret=interpret,
    )(jnp.asarray(_CONSTS), wx, wy, wz, wt)
    # lane 0 of each row block carries the row total (lane-replicated)
    return pt.ExtPoint(rx[:, ::tile].T, ry[:, ::tile].T,
                       rz[:, ::tile].T, rt[:, ::tile].T)
