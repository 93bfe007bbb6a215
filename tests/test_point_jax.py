"""Bit-exactness tests: batched JAX point ops vs exact backend."""

import random

import numpy as np
import jax.numpy as jnp

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.ops import field as fe
from quisquis_tpu.ops import point as pt

rng = random.Random(777)
B = 8  # batch size (kept constant to avoid recompiles)


def rand_points(n):
    return [ex.pt_mul(rng.randrange(1, ex.L), ex.BASEPOINT) for _ in range(n)]


def rand_scalars(n):
    return [rng.randrange(ex.L) for _ in range(n)]


def assert_pt_eq(jp: pt.ExtPoint, expected_list):
    got = pt.to_exact_batch(jp)
    for g, e in zip(got, expected_list):
        assert ex.pt_eq(g, e)


def test_add_double_neg():
    ps, qs = rand_points(B), rand_points(B)
    jp, jq = pt.from_exact_batch(ps), pt.from_exact_batch(qs)
    assert_pt_eq(pt.add(jp, jq), [ex.pt_add(p, q) for p, q in zip(ps, qs)])
    assert_pt_eq(pt.double(jp), [ex.pt_double(p) for p in ps])
    assert_pt_eq(pt.neg(jp), [ex.pt_neg(p) for p in ps])
    assert_pt_eq(pt.point_sub(jp, jq), [ex.pt_sub(p, q) for p, q in zip(ps, qs)])


def test_eq_and_identity():
    ps = rand_points(B)
    jp = pt.from_exact_batch(ps)
    assert bool(jnp.all(pt.eq(jp, jp)))
    shifted = pt.from_exact_batch(ps[1:] + ps[:1])
    assert not bool(jnp.any(pt.eq(jp, shifted)))
    ident = pt.identity((B,))
    assert bool(jnp.all(pt.is_identity(ident)))
    assert not bool(jnp.any(pt.is_identity(jp)))
    # doubled vs added representatives of same element compare equal
    assert bool(jnp.all(pt.eq(pt.double(jp), pt.add(jp, jp))))


def test_scalar_mul():
    ps = rand_points(B)
    ss = rand_scalars(B)
    jp = pt.from_exact_batch(ps)
    nibbles = jnp.asarray(pt.scalars_to_nibbles(ss))
    got = pt.scalar_mul(nibbles, jp)
    assert_pt_eq(got, [ex.pt_mul(s, p) for s, p in zip(ss, ps)])


def test_base_mul():
    ss = rand_scalars(B) + [0, 1]
    nibbles = jnp.asarray(pt.scalars_to_nibbles(ss))
    got = pt.base_mul(nibbles)
    assert_pt_eq(got, [ex.pt_mul(s, ex.BASEPOINT) for s in ss])


def test_compress():
    ps = rand_points(B)
    jp = pt.from_exact_batch(ps)
    got = pt.compress_to_bytes(jp)
    for row, p in zip(got, ps):
        assert bytes(row) == ex.ristretto_encode(p)
    # identity encodes to zeros
    z = pt.compress_to_bytes(pt.identity((2,)))
    assert bytes(z[0]) == b"\x00" * 32


def test_decompress():
    ps = rand_points(B)
    encs = np.stack([np.frombuffer(ex.ristretto_encode(p), dtype=np.uint8)
                     for p in ps])
    ok, jp = pt.decompress_from_bytes(encs)
    assert bool(jnp.all(ok))
    assert_pt_eq(jp, ps)
    # invalid: bad encodings rejected
    bad = encs.copy()
    bad[0] = 0
    bad[0, 0] = 1  # field element 1: 1-ss=0 -> y=0 -> reject
    ok2, _ = pt.decompress_from_bytes(bad)
    assert not bool(ok2[0])
    assert bool(jnp.all(ok2[1:]))


def test_elligator_map():
    import hashlib
    seeds = [b"seed%d" % i for i in range(B)]
    uni = np.stack([np.frombuffer(hashlib.sha3_512(s).digest(), dtype=np.uint8)
                    for s in seeds])
    got = pt.from_uniform_bytes(uni)
    expected = [ex.ristretto_from_uniform_bytes(bytes(u)) for u in uni]
    assert_pt_eq(got, expected)


def test_sum_points():
    ps = rand_points(7)  # odd length exercises padding
    jp = pt.from_exact_batch(ps)
    total = pt.sum_points(jp, 0)
    expected = ps[0]
    for p in ps[1:]:
        expected = ex.pt_add(expected, p)
    g = pt.to_exact_batch(pt.ExtPoint(total.x[None], total.y[None],
                                      total.z[None], total.t[None]))[0]
    assert ex.pt_eq(g, expected)
