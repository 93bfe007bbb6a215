"""Pallas Keccak-f[1600]: all 24 rounds in ONE kernel launch.

The XLA form (device_keccak._f1600_impl) runs a `fori_loop` of 24 rounds
of tiny [B, 25]-lane ops — several hundred microseconds of dispatch per
permutation. A device transcript replay performs dozens of permutations
and the device *prover* (witness-rekeyed RNG streams: every rekey KEY op
forces one) several hundred — sequential by construction, so the fixed
cost per permutation is the entire cost. This kernel unrolls the 24
rounds over a [200-byte-row, lane] block held in VMEM: every rho/pi
rotation amount, chi neighbor, theta parity index and iota constant is a
Python-level constant, so each 64-bit rotate compiles to two constant
shifts + or on uint32 rows.

Bit-exact with ops/keccak.py (the host scalar reference) via
device_keccak's tests; dispatched by device_keccak.f1600 on TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .keccak import _ROUND_CONSTANTS, _ROTATIONS

_U32 = jnp.uint32

# flat lane convention (matches device_keccak): lane(x, y) = x + 5y
_PERM_SRC = np.zeros(25, dtype=np.int32)
_ROT_D = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _d = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PERM_SRC[_d] = _x + 5 * _y
        _ROT_D[_d] = _ROTATIONS[_x][_y]
_CHI_1 = [((i % 5) + 1) % 5 + 5 * (i // 5) for i in range(25)]
_CHI_2 = [((i % 5) + 2) % 5 + 5 * (i // 5) for i in range(25)]


def _kernel(s_ref, o_ref):
    """s_ref/o_ref: [200, Bp] int32 byte rows (Bp = padded batch)."""

    def row(i):
        return s_ref[pl.ds(i, 1), :].astype(_U32)

    lo, hi = [], []
    for l in range(25):
        b = [row(8 * l + j) for j in range(8)]
        lo.append(b[0] | (b[1] << _U32(8)) | (b[2] << _U32(16))
                  | (b[3] << _U32(24)))
        hi.append(b[4] | (b[5] << _U32(8)) | (b[6] << _U32(16))
                  | (b[7] << _U32(24)))

    def rotl(pair, r):
        l_, h_ = pair
        r = int(r)
        if r >= 32:
            l_, h_ = h_, l_
            r -= 32
        if r == 0:
            return l_, h_
        return ((l_ << _U32(r)) | (h_ >> _U32(32 - r)),
                (h_ << _U32(r)) | (l_ >> _U32(32 - r)))

    for rnd in range(24):
        # theta
        c = [(lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20],
              hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20])
             for x in range(5)]
        d = [None] * 5
        for x in range(5):
            r1 = rotl(c[(x + 1) % 5], 1)
            d[x] = (c[(x + 4) % 5][0] ^ r1[0], c[(x + 4) % 5][1] ^ r1[1])
        for i in range(25):
            lo[i] = lo[i] ^ d[i % 5][0]
            hi[i] = hi[i] ^ d[i % 5][1]
        # rho + pi
        b2 = [rotl((lo[_PERM_SRC[i]], hi[_PERM_SRC[i]]), _ROT_D[i])
              for i in range(25)]
        # chi
        lo = [b2[i][0] ^ (~b2[_CHI_1[i]][0] & b2[_CHI_2[i]][0])
              for i in range(25)]
        hi = [b2[i][1] ^ (~b2[_CHI_1[i]][1] & b2[_CHI_2[i]][1])
              for i in range(25)]
        # iota
        rc = _ROUND_CONSTANTS[rnd]
        lo[0] = lo[0] ^ _U32(rc & 0xFFFFFFFF)
        hi[0] = hi[0] ^ _U32(rc >> 32)

    for l in range(25):
        for j in range(4):
            o_ref[pl.ds(8 * l + j, 1), :] = (
                (lo[l] >> _U32(8 * j)) & _U32(0xFF)).astype(jnp.int32)
            o_ref[pl.ds(8 * l + 4 + j, 1), :] = (
                (hi[l] >> _U32(8 * j)) & _U32(0xFF)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def f1600_pallas(state: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Keccak-f[1600] on [..., 200] int32 byte states, one kernel launch."""
    shape = state.shape[:-1]
    flat = state.reshape((-1, 200))
    R = flat.shape[0]
    pad = (-R) % 128
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 200), flat.dtype)], axis=0)
    sm = flat.T                                   # [200, Rp]
    spec = pl.BlockSpec(sm.shape, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(sm.shape, jnp.int32),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(sm)
    return out.T[:R].reshape(shape + (200,))
