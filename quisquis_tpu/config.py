"""Framework configuration.

The reference has no config system — N=9/3x3, 64-bit ranges, generator
capacities and the base pk are compile-time constants (SURVEY §5). Here the
same knobs are real configuration with the reference's values as defaults.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class QuisQuisConfig:
    #: anonymity-set size (must be a perfect square); reference: 9 (3x3)
    anonymity_set_size: int = 9
    #: range-proof bit width; reference: 64
    range_bits: int = 64
    #: bulletproof generator capacity for aggregated proofs; reference: (64, 16)
    bp_gens_capacity: int = 64
    bp_party_capacity: int = 16
    #: r1cs generator capacity; reference: 512
    r1cs_gens_capacity: int = 512
    #: Pallas kernel batch tile (lanes per grid step) for the fixed/variable
    #: base scalar-mul mega-kernels (autotuned on v5e)
    pallas_tile: int = 512
    #: Pallas MSM pipeline tile (autotuned on v5e: 128 beats 256/512 at 2^16)
    msm_tile: int = 128
    #: device mesh axis name for sharding
    mesh_axis: str = "shard"

    @property
    def rows(self) -> int:
        m = math.isqrt(self.anonymity_set_size)
        assert m * m == self.anonymity_set_size
        return m

    @property
    def columns(self) -> int:
        return self.rows


#: process-wide default configuration
DEFAULT = QuisQuisConfig()


def set_default(**kwargs) -> QuisQuisConfig:
    """Update fields of the process-wide default config."""
    global DEFAULT
    DEFAULT = dataclasses.replace(DEFAULT, **kwargs)
    return DEFAULT
