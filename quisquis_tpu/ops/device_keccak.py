"""Batched Keccak-f[1600] on TPU.

The permutation behind the merlin/STROBE transcript layer, vectorized over
a batch axis so B independent transcripts replay in lockstep on the VPU
(the host replays them one at a time; see ops/keccak.py for the scalar
reference this is tested against bit-for-bit).

Representation: a state is [..., 200] int32 *bytes* (values 0..255 — the
byte view is what STROBE's position-based absorb/squeeze needs); the
permutation packs them into 25 lanes of 2 x uint32 (TPU has no 64-bit
integer multiplier or rotator, but 64-bit XOR/rotate splits exactly into
two 32-bit halves), runs 24 rounds under `lax.fori_loop`, and unpacks.

All index maps and rotation amounts are trace-time constants; there is no
data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .keccak import _ROUND_CONSTANTS, _ROTATIONS

_U32 = jnp.uint32

# flat lane index convention (matches ops/keccak.py): lane(x, y) = x + 5y

# rho+pi: dest[y + 5*((2x+3y)%5)] = rotl(src[x + 5y], ROT[x][y])
_PERM_SRC = np.zeros(25, dtype=np.int32)
_ROT_D = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _d = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PERM_SRC[_d] = _x + 5 * _y
        _ROT_D[_d] = _ROTATIONS[_x][_y]

# chi neighbor maps on flat indices (i = x + 5y)
_CHI_1 = np.array([((i % 5) + 1) % 5 + 5 * (i // 5) for i in range(25)],
                  dtype=np.int32)
_CHI_2 = np.array([((i % 5) + 2) % 5 + 5 * (i // 5) for i in range(25)],
                  dtype=np.int32)

_RC_LO = np.array([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS], dtype=np.uint32)
_RC_HI = np.array([rc >> 32 for rc in _ROUND_CONSTANTS], dtype=np.uint32)


def _rotl_pair(lo, hi, r: np.ndarray):
    """64-bit rotate-left by per-lane constant amounts r[25] on (lo, hi)."""
    swap = jnp.asarray((r >= 32))
    a = np.mod(r, 32)
    l0 = jnp.where(swap, hi, lo)
    h0 = jnp.where(swap, lo, hi)
    sh_a = jnp.asarray(a.astype(np.uint32))
    sh_b = jnp.asarray(((32 - a) % 32).astype(np.uint32))
    zero_mask = jnp.asarray((a == 0))
    new_lo = (l0 << sh_a) | jnp.where(zero_mask, _U32(0), h0 >> sh_b)
    new_hi = (h0 << sh_a) | jnp.where(zero_mask, _U32(0), l0 >> sh_b)
    return new_lo, new_hi


def _round(lo, hi, rc_lo, rc_hi):
    """One Keccak round; lo/hi: [..., 25] uint32."""
    shape = lo.shape[:-1]
    g5 = lambda v: v.reshape(shape + (5, 5))  # [..., y, x]
    # theta
    c_lo = g5(lo)[..., 0, :] ^ g5(lo)[..., 1, :] ^ g5(lo)[..., 2, :] \
        ^ g5(lo)[..., 3, :] ^ g5(lo)[..., 4, :]
    c_hi = g5(hi)[..., 0, :] ^ g5(hi)[..., 1, :] ^ g5(hi)[..., 2, :] \
        ^ g5(hi)[..., 3, :] ^ g5(hi)[..., 4, :]
    # rotl(C[x+1], 1)
    cp_lo = jnp.roll(c_lo, -1, axis=-1)
    cp_hi = jnp.roll(c_hi, -1, axis=-1)
    r1_lo = (cp_lo << _U32(1)) | (cp_hi >> _U32(31))
    r1_hi = (cp_hi << _U32(1)) | (cp_lo >> _U32(31))
    d_lo = jnp.roll(c_lo, 1, axis=-1) ^ r1_lo
    d_hi = jnp.roll(c_hi, 1, axis=-1) ^ r1_hi
    lo = (g5(lo) ^ d_lo[..., None, :]).reshape(shape + (25,))
    hi = (g5(hi) ^ d_hi[..., None, :]).reshape(shape + (25,))
    # rho + pi
    b_lo, b_hi = _rotl_pair(lo[..., _PERM_SRC], hi[..., _PERM_SRC], _ROT_D)
    # chi
    lo = b_lo ^ (~b_lo[..., _CHI_1] & b_lo[..., _CHI_2])
    hi = b_hi ^ (~b_hi[..., _CHI_1] & b_hi[..., _CHI_2])
    # iota
    lo = lo.at[..., 0].set(lo[..., 0] ^ rc_lo)
    hi = hi.at[..., 0].set(hi[..., 0] ^ rc_hi)
    return lo, hi


def _f1600_impl(state: jnp.ndarray) -> jnp.ndarray:
    """Keccak-f[1600] on [..., 200] int32 byte states (batched)."""
    shape = state.shape[:-1]
    b = state.astype(_U32).reshape(shape + (25, 8))
    lo = b[..., 0] | (b[..., 1] << _U32(8)) | (b[..., 2] << _U32(16)) \
        | (b[..., 3] << _U32(24))
    hi = b[..., 4] | (b[..., 5] << _U32(8)) | (b[..., 6] << _U32(16)) \
        | (b[..., 7] << _U32(24))

    rc_lo = jnp.asarray(_RC_LO)
    rc_hi = jnp.asarray(_RC_HI)

    def body(i, carry):
        lo_, hi_ = carry
        return _round(lo_, hi_, rc_lo[i], rc_hi[i])

    lo, hi = jax.lax.fori_loop(0, 24, body, (lo, hi))

    parts = [lo & _U32(0xFF), (lo >> _U32(8)) & _U32(0xFF),
             (lo >> _U32(16)) & _U32(0xFF), (lo >> _U32(24)) & _U32(0xFF),
             hi & _U32(0xFF), (hi >> _U32(8)) & _U32(0xFF),
             (hi >> _U32(16)) & _U32(0xFF), (hi >> _U32(24)) & _U32(0xFF)]
    out = jnp.stack(parts, axis=-1).reshape(shape + (200,))
    return out.astype(jnp.int32)


# jitted: a transcript replay calls the permutation dozens of times with one
# shape — the nested jit makes every call site share a single lowered
# computation instead of inlining ~400 ops each into the outer graph
_f1600_xla = jax.jit(_f1600_impl)


def f1600(state: jnp.ndarray) -> jnp.ndarray:
    """Keccak-f[1600] on [..., 200] int32 byte states (batched).

    On a real TPU the all-24-rounds-in-one-kernel Pallas form runs
    (~15% faster in-program than the fori_loop XLA form, measured at 50
    chained permutations on a v5 lite chip; bit-exact — on-chip gate in
    tests/test_tpu_hardware.py); the XLA form runs elsewhere."""
    if jax.default_backend() == "tpu":
        from .pallas_keccak import f1600_pallas

        return f1600_pallas(state)
    return _f1600_xla(state)
