"""Device mesh utilities for multi-chip sharding.

The reference is single-process Rust with no distributed backend
(SURVEY §2.3); here jax collectives over a `jax.sharding.Mesh` are the
backend: the point/batch axis is sharded across devices, partial reductions
ride ICI, and the tiny per-device partial points are combined with an
all-gather + tree add (point addition is the reduction operator, so `psum`
cannot be used directly — the combine cost is O(ndev) point adds on 384-byte
operands, negligible vs the sharded compute).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import field as fe
from ..ops import point as pt


def make_mesh(n_devices: Optional[int] = None,
              axis: Optional[str] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if axis is None:
        from ..config import DEFAULT
        axis = DEFAULT.mesh_axis
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, arr, axis: str = "shard"):
    """Place a batched array (leading axis) sharded across the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.device_put(arr, sharding)


def shard_points(mesh: Mesh, p: pt.ExtPoint, axis: str = "shard") -> pt.ExtPoint:
    sharding = jax.sharding.NamedSharding(mesh, P(axis, None))
    return pt.ExtPoint(*(jax.device_put(c, sharding) for c in p))


def replicate(mesh: Mesh, arr):
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(arr, sharding)
