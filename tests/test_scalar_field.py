"""Device scalar-field (mod l) vs the exact host backend, bit-for-bit.

The device representation is "loose" plain limbs (no Montgomery form):
public ops accept/return int32 limbs in [0, 2^12) whose value is congruent
mod l; exact canonical digits appear only at boundaries (canonicalize,
to_bytes_array, to_nibbles). These tests pin both the mod-l values and the
exact byte/digit forms at the boundaries.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.ops import scalar_field as sf

L = ex.L
rng = np.random.default_rng(7)


def rand_scalars(n):
    return [int.from_bytes(rng.bytes(32), "little") % L for n_ in range(n)]


EDGE = [0, 1, 2, L - 1, L - 2, (L - 1) // 2, 2**252, L - 2**200 + 17]


def test_roundtrip():
    xs = rand_scalars(16) + EDGE
    limbs = jnp.asarray(sf.from_int_batch(xs))
    assert sf.to_int_batch(np.asarray(limbs)) == [x % L for x in xs]
    assert np.array_equal(np.asarray(sf.scalars_to_dev(xs)), np.asarray(limbs))
    assert sf.dev_to_scalars(limbs) == [x % L for x in xs]


def test_mul_add_sub_neg():
    xs = rand_scalars(24) + EDGE
    ys = rand_scalars(24) + list(reversed(EDGE))
    a = sf.scalars_to_dev(xs)
    b = sf.scalars_to_dev(ys)
    got_mul = sf.dev_to_scalars(jax.jit(sf.mul)(a, b))
    assert got_mul == [x * y % L for x, y in zip(xs, ys)]
    got_add = sf.dev_to_scalars(jax.jit(sf.add)(a, b))
    assert got_add == [(x + y) % L for x, y in zip(xs, ys)]
    got_sub = sf.dev_to_scalars(jax.jit(sf.sub)(a, b))
    assert got_sub == [(x - y) % L for x, y in zip(xs, ys)]
    got_neg = sf.dev_to_scalars(jax.jit(sf.neg)(a))
    assert got_neg == [(-x) % L for x in xs]


def test_loose_chaining_and_contract():
    """Ops compose on loose (non-canonical) inputs and stay in contract."""
    xs = rand_scalars(16) + EDGE
    ys = rand_scalars(16) + list(reversed(EDGE))
    a = sf.scalars_to_dev(xs)
    b = sf.scalars_to_dev(ys)
    s = jax.jit(sf.add)(a, b)          # loose
    d = jax.jit(sf.sub)(a, b)          # loose
    for t in (s, d):
        assert int(jnp.max(t)) <= sf.LOOSE and int(jnp.min(t)) >= 0
    prod = jax.jit(sf.mul)(s, d)
    assert sf.dev_to_scalars(prod) == [
        (x + y) * (x - y) % L for x, y in zip(xs, ys)]
    # canonicalize yields EXACT digits (not merely congruent)
    canon = np.asarray(jax.jit(sf.canonicalize)(prod))
    for row, x, y in zip(canon, xs, ys):
        v = sum(int(dg) << (sf.BITS * i) for i, dg in enumerate(row))
        assert v == (x + y) * (x - y) % L


def test_invert_and_batch_invert():
    xs = [x or 1 for x in rand_scalars(6) + [1, 2, L - 1]]
    a = sf.scalars_to_dev(xs)
    got = sf.dev_to_scalars(jax.jit(sf.invert)(a))
    assert got == [ex.sc_invert(x) for x in xs]
    rows = jnp.reshape(a, (3, 3, sf.NLIMBS))
    got2 = sf.dev_to_scalars(jax.jit(sf.batch_invert_rows)(rows))
    assert got2 == [ex.sc_invert(x) for x in xs]


def test_powers():
    xs = rand_scalars(3)
    a = sf.scalars_to_dev(xs)
    n = 13
    got = sf.dev_to_scalars(jax.jit(sf.powers, static_argnums=1)(a, n))
    want = [pow(x, k, L) for x in xs for k in range(n)]
    assert got == want


def test_from_bytes_wide():
    blobs = [rng.bytes(64) for _ in range(8)] + [b"\xff" * 64, b"\x00" * 64]
    b = jnp.asarray(np.frombuffer(b"".join(blobs), np.uint8)
                    .reshape(len(blobs), 64).astype(np.int32))
    got = sf.dev_to_scalars(jax.jit(sf.from_bytes_wide)(b))
    assert got == [ex.sc_from_bytes_mod_order_wide(x) for x in blobs]


def test_from_bytes_32():
    blobs = [rng.bytes(32) for _ in range(8)] + [b"\xff" * 32, b"\x00" * 32]
    b = jnp.asarray(np.frombuffer(b"".join(blobs), np.uint8)
                    .reshape(len(blobs), 32).astype(np.int32))
    got = sf.dev_to_scalars(jax.jit(sf.from_bytes)(b))
    assert got == [ex.sc_from_bytes_mod_order(x) for x in blobs]


def test_to_bytes_array():
    xs = rand_scalars(8) + EDGE
    limbs = jnp.asarray(sf.from_int_batch(xs))
    got = np.asarray(jax.jit(sf.to_bytes_array)(limbs))
    for row, x in zip(got, xs):
        assert bytes(row.astype(np.uint8)) == ex.sc_to_bytes(x)


def test_to_nibbles():
    xs = rand_scalars(8) + EDGE
    # feed loose inputs: nibbles must reflect the canonical value
    a = sf.scalars_to_dev(xs)
    loose = jax.jit(sf.add)(a, sf.zeros((len(xs),)))
    nib = np.asarray(jax.jit(sf.to_nibbles)(loose))
    for row, x in zip(nib, xs):
        assert sum(int(d) << (4 * i) for i, d in enumerate(row)) == x % L


def test_eq_is_zero_on_loose():
    xs = rand_scalars(8) + EDGE
    ys = rand_scalars(8) + list(reversed(EDGE))
    a = sf.scalars_to_dev(xs)
    b = sf.scalars_to_dev(ys)
    assert bool(jnp.all(jax.jit(sf.eq)(jax.jit(sf.add)(a, b),
                                       jax.jit(sf.add)(b, a))))
    z = jax.jit(sf.sub)(a, a)
    assert bool(jnp.all(jax.jit(sf.is_zero)(z)))
    ne = np.asarray(jax.jit(sf.eq)(a, b))
    assert not ne[:8].any()  # random lanes differ
