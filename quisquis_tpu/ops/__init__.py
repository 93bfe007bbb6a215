"""Compute kernels: field/point/MSM ops, hashing, exact host backend."""

from . import exact, field, point, msm, batch, keccak, strobe  # noqa: F401
