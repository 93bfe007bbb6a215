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


def msm_raw(nibbles: jnp.ndarray, points: pt.ExtPoint) -> pt.ExtPoint:
    """MSM over a batch axis: sum_i s_i * P_i -> single point (shape ())."""
    prods = pt.scalar_mul_raw(nibbles, points)
    return pt.sum_points_raw(prods, 0)


msm = jax.jit(msm_raw)


def msm_host(scalars, host_points) -> ex.Point:
    """Convenience wrapper: host scalars/points -> device MSM -> host point."""
    nibbles = jnp.asarray(pt.scalars_to_nibbles(scalars))
    dev_pts = pt.from_exact_batch(host_points)
    out = msm(nibbles, dev_pts)
    single = pt.ExtPoint(out.x[None], out.y[None], out.z[None], out.t[None])
    return pt.to_exact_batch(single)[0]
