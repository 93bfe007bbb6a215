"""Pallas mega-kernel bit-exactness (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.ops import point as pt
from quisquis_tpu.ops.pallas_point import scalar_mul_pallas, msm_pallas
from quisquis_tpu.accounts.transcript import SeededRng


def test_pallas_scalar_mul_matches_exact():
    B = 8
    scalars = [0, 1, 7, ex.L - 1, 2**200 + 12345, 3, 2**64, 55555]
    base_s = [11, 22, 33, 44, 55, 66, 77, 88]
    host_pts = [ex.pt_base_mul(s) for s in base_s]
    points = pt.from_exact_batch(host_pts)
    nib = jnp.asarray(pt.scalars_to_nibbles(scalars))
    out = scalar_mul_pallas(nib, points, tile=B, interpret=True)
    got = pt.compress_to_bytes(out)
    for i, s in enumerate(scalars):
        assert bytes(got[i]) == ex.ristretto_encode(ex.pt_mul(s, host_pts[i]))


def test_pallas_base_mul_matches_exact():
    scalars = [0, 1, 2, ex.L - 1, 2**180 + 7, 16, 255, 12345678]
    nib = jnp.asarray(pt.scalars_to_nibbles(scalars))
    from quisquis_tpu.ops.pallas_point import base_mul_pallas
    out = base_mul_pallas(nib, tile=8, interpret=True)
    got = pt.compress_to_bytes(out)
    for i, s in enumerate(scalars):
        assert bytes(got[i]) == ex.ristretto_encode(ex.pt_base_mul(s))


def test_pallas_msm_matches_exact():
    r = SeededRng(seed=b"pmsm")
    n = 20  # pads to one 256-lane tile; exercises padding + both kernels
    ss = [r.random_scalar() for _ in range(n)]
    host_pts = [ex.pt_base_mul(r.random_scalar()) for _ in range(n)]
    nib = jnp.asarray(pt.scalars_to_nibbles(ss))
    dev = pt.from_exact_batch(host_pts)
    out = msm_pallas(nib, dev, interpret=True)
    single = pt.ExtPoint(out.x[None], out.y[None], out.z[None], out.t[None])
    assert ex.pt_eq(pt.to_exact_batch(single)[0], ex.pt_msm(ss, host_pts))
