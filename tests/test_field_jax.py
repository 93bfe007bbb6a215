"""Bit-exactness fuzz tests: JAX int32 limb field vs exact backend."""

import random

import numpy as np
import jax.numpy as jnp

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.ops import field as fe

rng = random.Random(12345)
P = ex.P


def rand_ints(n):
    vals = [rng.randrange(P) for _ in range(n - 4)]
    # adversarial values
    vals += [0, 1, P - 1, P - 19]
    return vals


def test_roundtrip_int():
    xs = rand_ints(32)
    limbs = fe.from_int_batch(xs)
    assert fe.to_int_batch(limbs) == [x % P for x in xs]


def test_add_sub_neg():
    xs, ys = rand_ints(64), rand_ints(64)
    a, b = jnp.asarray(fe.from_int_batch(xs)), jnp.asarray(fe.from_int_batch(ys))
    assert fe.to_int_batch(fe.add(a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
    assert fe.to_int_batch(fe.sub(a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
    assert fe.to_int_batch(fe.neg(a)) == [(-x) % P for x in xs]


def test_mul_random_and_adversarial():
    xs, ys = rand_ints(128), rand_ints(128)
    a, b = jnp.asarray(fe.from_int_batch(xs)), jnp.asarray(fe.from_int_batch(ys))
    got = fe.to_int_batch(fe.mul(a, b))
    assert got == [x * y % P for x, y in zip(xs, ys)]
    # worst-case loose limbs: all limbs at the max loose bound
    worst = np.array([fe.CONTRACT] * 4, dtype=np.int32)
    wv = fe.to_int_batch(worst)[0]
    got2 = fe.to_int_batch(fe.mul(jnp.asarray(worst), jnp.asarray(worst)))
    assert got2 == [wv * wv % P] * 4
    # chained muls keep the loose invariant
    acc = jnp.asarray(worst)
    ref = wv
    for _ in range(5):
        acc = fe.mul(acc, jnp.asarray(worst))
        ref = ref * wv % P
        assert all(int(v) <= c for v, c in zip(np.asarray(acc)[0], fe.CONTRACT))
    assert fe.to_int_batch(acc)[0] == ref


def test_mul_small():
    xs = rand_ints(32)
    a = jnp.asarray(fe.from_int_batch(xs))
    for c in (2, 19, 121665, fe.FOLD):
        assert fe.to_int_batch(fe.mul_small(a, c)) == [x * c % P for x in xs]


def test_invert_and_pow():
    xs = [x for x in rand_ints(32) if x != 0]
    a = jnp.asarray(fe.from_int_batch(xs))
    inv = fe.to_int_batch(fe.invert(a))
    assert inv == [pow(x, P - 2, P) for x in xs]
    p58 = fe.to_int_batch(fe.pow_p58(a))
    assert p58 == [pow(x, (P - 5) // 8, P) for x in xs]


def test_canonicalize_and_eq():
    xs = rand_ints(32)
    a = jnp.asarray(fe.from_int_batch(xs))
    # loose representative of x + p must equal x
    p_loose = jnp.asarray(fe.from_int_batch([P - 1] * 32))
    b = fe.add(a, fe.add(p_loose, fe.ones((32,))))  # a + p
    assert bool(jnp.all(fe.eq(a, b)))
    assert fe.to_int_batch(fe.canonicalize(b)) == [x % P for x in xs]
    assert list(np.asarray(fe.is_zero(fe.sub(a, a)))) == [True] * 32


def test_is_negative_abs():
    xs = rand_ints(64)
    a = jnp.asarray(fe.from_int_batch(xs))
    got = list(np.asarray(fe.is_negative(a)))
    assert got == [bool(x % P & 1) for x in xs]
    gotabs = fe.to_int_batch(fe.cabs(a))
    assert gotabs == [ex.fe_abs(x) for x in xs]


def test_bytes_roundtrip():
    xs = rand_ints(64)
    a = jnp.asarray(fe.from_int_batch(xs))
    bts = fe.to_bytes(a)
    assert [bytes(r) for r in bts] == [ex.fe_to_bytes(x % P) for x in xs]
    back = fe.from_bytes(bts)
    assert fe.to_int_batch(back) == [x % P for x in xs]


def test_sqrt_ratio_batched():
    cases = [(4, 1), (2, 1), (1, 1), (0, 1), (5, 7), (12345, 6789),
             (P - 1, 2), (3, P - 3)]
    u = jnp.asarray(fe.from_int_batch([c[0] for c in cases]))
    v = jnp.asarray(fe.from_int_batch([c[1] for c in cases]))
    ws, r = fe.sqrt_ratio_m1(u, v)
    rs = fe.to_int_batch(r)
    for i, (uu, vv) in enumerate(cases):
        ews, er = ex.sqrt_ratio_m1(uu, vv)
        assert bool(ws[i]) == ews, (i, uu, vv)
        assert rs[i] == er, (i, uu, vv)
