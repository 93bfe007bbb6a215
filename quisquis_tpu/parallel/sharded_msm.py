"""Multi-host / multi-chip sharded MSM and batched verification.

Point axis is sharded over the mesh; each device computes its partial MSM
(windowed scalar-muls + local tree reduce), then partials are all-gathered
(4x24 int32 each — bytes, not megabytes, over ICI) and tree-added.

The same pattern serves batched shuffle-proof verification: each device
verifies its slice of the batch and a logical AND rides the mesh.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import field as fe
from ..ops import point as pt
from ..ops import batch as qbatch
from ..ops import msm as qmsm

AXIS = "shard"


def _local_msm(nibbles, points: pt.ExtPoint) -> pt.ExtPoint:
    """Per-device partial MSM (shared-doubling Pippenger form for larger
    shards, lockstep ladder for tiny ones — see ops.msm.msm_raw)."""
    local = qmsm.msm_raw(nibbles, points)
    return pt.ExtPoint(local.x[None], local.y[None], local.z[None], local.t[None])


def sharded_msm(mesh: Mesh, nibbles, points: pt.ExtPoint) -> pt.ExtPoint:
    """MSM with the point axis sharded over `mesh`; returns a single point."""

    def kernel(nib, px, py, pz, ptt):
        local = _local_msm(nib, pt.ExtPoint(px, py, pz, ptt))
        # all-gather the tiny per-device partials and tree-add
        gx = jax.lax.all_gather(local.x[0], AXIS)
        gy = jax.lax.all_gather(local.y[0], AXIS)
        gz = jax.lax.all_gather(local.z[0], AXIS)
        gt = jax.lax.all_gather(local.t[0], AXIS)
        total = pt.sum_points_raw(pt.ExtPoint(gx, gy, gz, gt), 0)
        return total.x[None], total.y[None], total.z[None], total.t[None]

    mapped = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS, None)),
    )
    ox, oy, oz, ot = jax.jit(mapped)(nibbles, points.x, points.y, points.z,
                                     points.t)
    return pt.ExtPoint(ox[0], oy[0], oz[0], ot[0])


def sharded_commitment_verify(mesh: Mesh, comm: qbatch.BatchCommitment,
                              sk_nibbles, v_nibbles) -> bool:
    """Batched commitment verification sharded over the mesh -> all-true."""

    def kernel(cc_x, cc_y, cc_z, cc_t, cd_x, cd_y, cd_z, cd_t, sk, v):
        c = pt.ExtPoint(cc_x, cc_y, cc_z, cc_t)
        d = pt.ExtPoint(cd_x, cd_y, cd_z, cd_t)
        ok = qbatch.verify_commitments_raw(qbatch.BatchCommitment(c, d), sk, v)
        return ok

    specs_pt = tuple(P(AXIS, None) for _ in range(8))
    mapped = shard_map(
        kernel, mesh=mesh,
        in_specs=specs_pt + (P(AXIS, None), P(AXIS, None)),
        out_specs=P(AXIS),
    )
    ok = jax.jit(mapped)(comm.c.x, comm.c.y, comm.c.z, comm.c.t,
                         comm.d.x, comm.d.y, comm.d.z, comm.d.t,
                         sk_nibbles, v_nibbles)
    return bool(jnp.all(ok))
