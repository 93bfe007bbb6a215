"""Multi-chip sharding: mesh utils, sharded MSM and batch verification."""

from .mesh import make_mesh, shard_batch, shard_points, replicate  # noqa: F401
from .sharded_msm import sharded_msm, sharded_commitment_verify  # noqa: F401
