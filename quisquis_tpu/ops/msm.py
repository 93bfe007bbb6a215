"""Multi-scalar multiplication on TPU.

The verifier hot path (SURVEY §2.2: vector-Pedersen commits, verifier
recombinations, E_k diagonals, bulletproof batch verification) is MSM.

TPU design: data-dependent bucket scatter (classic Pippenger) maps poorly to
SIMD lanes, so the per-chip kernel runs a **fully vectorized windowed
double-and-add**: every point does its own 4-bit-windowed scalar-mul in
lockstep across the batch (identical work per lane, no data-dependent
control flow), followed by a log2(n) tree reduction of point adds. Total
point-ops: n*(252 doublings + 79 adds) + (n-1) adds, all across perfectly
coalesced SoA limb tensors.

Multi-host: shard the point axis across the mesh; each device reduces its
shard to one point; the tiny [ndev, 4, 24] partials are combined by an
all-gather + tree add (see quisquis_tpu.parallel.sharded_msm).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import exact as ex
from . import field as fe
from . import point as pt


def msm_ladder_raw(nibbles: jnp.ndarray, points: pt.ExtPoint) -> pt.ExtPoint:
    """Lockstep-ladder MSM: every point runs its own windowed scalar-mul
    (~331 point-ops per point), then a tree reduction."""
    prods = pt.scalar_mul_raw(nibbles, points)
    return pt.sum_points_raw(prods, 0)


def msm_pippenger_raw(nibbles: jnp.ndarray, points: pt.ExtPoint,
                      window_chunk: int = 8) -> pt.ExtPoint:
    """Shared-doubling Pippenger-style MSM (~78 point-ops per point).

    sum_i s_i*P_i = sum_w 16^w * T_w with T_w = sum_i digit_{i,w} * P_i.
    Each point builds its 16-entry small-multiple table ONCE (14 adds,
    shared by all 64 windows); each window then costs one table lookup +
    one n-wide tree reduction (n-1 adds); the 64 window sums are combined
    by a single Horner chain of 252 doublings on one point. Total work
    ~(14 + 64)*n adds versus the ladder's ~331*n — the doubling chain is
    amortized across the whole batch instead of paid per point.

    Window sums are processed `window_chunk` at a time under lax.map to
    bound the gathered intermediate to [window_chunk, n] points.
    """
    n = nibbles.shape[0]
    table = pt._build_window_table(points)  # [n, 16, limbs] per coord

    nw = pt.NWINDOWS
    assert nw % window_chunk == 0
    wchunks = jnp.arange(nw, dtype=jnp.int32).reshape(nw // window_chunk,
                                                      window_chunk)

    def chunk_sums(ws):
        # ws: [window_chunk] window indices
        digits = nibbles[:, ws].astype(jnp.int32)  # [n, wc]
        digits = jnp.moveaxis(digits, -1, 0)       # [wc, n]
        sel = pt._lookup_16(
            pt.ExtPoint(table.x[None], table.y[None],
                        table.z[None], table.t[None]), digits)
        return pt.sum_points_raw(sel, 1)           # [wc] points

    T = jax.lax.map(chunk_sums, wchunks)           # [nw//wc, wc] points
    Tx = T.x.reshape(nw, -1)
    Ty = T.y.reshape(nw, -1)
    Tz = T.z.reshape(nw, -1)
    Tt = T.t.reshape(nw, -1)

    def take_w(w):
        return pt.ExtPoint(Tx[w], Ty[w], Tz[w], Tt[w])

    def body(i, acc):
        w = nw - 1 - i
        for k in range(4):
            acc = pt.double_raw(acc, need_t=(k == 3))
        return pt.add_raw(acc, take_w(w))

    acc = take_w(nw - 1)
    return jax.lax.fori_loop(1, nw, body, acc)


def msm_shared_base_raw(nibbles: jnp.ndarray,
                        points: pt.ExtPoint) -> pt.ExtPoint:
    """Batched MSM against ONE shared point set: nibbles [..., N, 64] over
    points [N] -> per-batch-element totals [...].

    The window table ([N, 16] small multiples) is built ONCE and shared by
    every batch lane and window — the shape for proving workloads where B
    lanes (or B sequential rounds) take different linear combinations of
    the same fixed generator vector (bulletproofs A/S commitments, IPP
    L/R rounds re-expressed over the original basis). Cost: 14 adds per
    shared point + 64 * (lookup + N-tree reduction) per lane, with the
    64-window Horner doubling chain amortized across all lanes.
    """
    batch = nibbles.shape[:-2]
    n = nibbles.shape[-2]
    table = pt._build_window_table(points)            # [N, 16, limbs]

    def window_sum(w):
        digits = nibbles[..., w]                      # [..., N]
        sel = pt._lookup_16(table, digits)            # [..., N] points
        return pt.sum_points_raw(sel, -1)             # [...]

    def body(i, acc):
        w = pt.NWINDOWS - 1 - i
        for k in range(pt.WINDOW_BITS):
            acc = pt.double_raw(acc, need_t=(k == pt.WINDOW_BITS - 1))
        return pt.add_raw(acc, window_sum(w))

    acc = window_sum(pt.NWINDOWS - 1)
    return jax.lax.fori_loop(1, pt.NWINDOWS, body, acc)


def msm_rows_raw(nibbles: jnp.ndarray, points: pt.ExtPoint) -> pt.ExtPoint:
    """Per-row MSM: nibbles [..., k, 64] over points [..., k] -> [...].

    The batch generalization of msm_pippenger_raw for workloads where
    every row combines its OWN point set (e.g. each verifier lane
    aggregating its statement's points by challenge powers:
    (G, H) = sum_i x^i pk_i, /root/reference/src/shuffle/shuffle.rs:461-477).
    Unlike msm_shared_base_raw the table is built per row. Cost per row:
    14k table adds + 64 window lookups/tree-sums (~64k adds) + one
    252-doubling Horner chain — ~80 point-ops per point vs the lockstep
    ladder's ~331.
    """
    table = pt._build_window_table(points)        # [..., k, 16, limbs]

    def window_sum(w):
        digits = jnp.take(nibbles, w, axis=-1)    # [..., k]
        sel = pt._lookup_16(table, digits)
        return pt.sum_points_raw(sel, -1)         # [...]

    def body(i, acc):
        w = pt.NWINDOWS - 1 - i
        for k in range(pt.WINDOW_BITS):
            acc = pt.double_raw(acc, need_t=(k == pt.WINDOW_BITS - 1))
        return pt.add_raw(acc, window_sum(w))

    acc = window_sum(pt.NWINDOWS - 1)
    return jax.lax.fori_loop(1, pt.NWINDOWS, body, acc)


def msm_raw(nibbles: jnp.ndarray, points: pt.ExtPoint) -> pt.ExtPoint:
    """MSM over a batch axis: sum_i s_i * P_i -> single point (shape ()).

    Dispatches on (static) batch size: the shared-doubling Pippenger form
    wins once the per-window tree reductions amortize the Horner chain."""
    n = nibbles.shape[0]
    if n >= 16:
        return msm_pippenger_raw(nibbles, points)
    return msm_ladder_raw(nibbles, points)


def _msm_dispatch(nibbles: jnp.ndarray, points: pt.ExtPoint) -> pt.ExtPoint:
    """Top-level MSM: Pallas two-kernel pipeline on TPU for larger batches
    (1.15M pts/s marginal at 2^16 vs ~170k for the XLA Pippenger form),
    XLA elsewhere (CPU tests, tiny batches, inner use under shard_map)."""
    n = nibbles.shape[0]
    if n >= 1024 and jax.default_backend() == "tpu":
        from . import pallas_point as kp

        return kp.msm_pallas(nibbles, points)
    return jax.jit(msm_raw)(nibbles, points)


msm = _msm_dispatch


def msm_host(scalars, host_points) -> ex.Point:
    """Convenience wrapper: host scalars/points -> device MSM -> host point."""
    nibbles = jnp.asarray(pt.scalars_to_nibbles(scalars))
    dev_pts = pt.from_exact_batch(host_points)
    out = msm(nibbles, dev_pts)
    single = pt.ExtPoint(out.x[None], out.y[None], out.z[None], out.t[None])
    return pt.to_exact_batch(single)[0]
