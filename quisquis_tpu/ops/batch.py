"""Fused batched protocol kernels on TPU.

These are the device counterparts of the hot paths in the protocol layer
(BASELINE configs 1-3):

* ElGamal commitment generation: (c, d) = (r*gr, v*G + r*grsk) — fused
  batch kernel: two variable-base scalar-muls + one fixed-base mul + add per
  element, across a batch axis (elgamal.rs:41-53 does this per-element with
  compress/decompress; here everything stays in extended limb form).
* homomorphic adds, account updates (accounts.rs:143-154), commitment
  verification d == v*G + sk*c (elgamal.rs:81-95).

All kernels are jit-compiled, batch = leading axis, and shard cleanly over
a device mesh (see quisquis_tpu.parallel).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import exact as ex
from . import field as fe
from . import point as pt


class BatchCommitment(NamedTuple):
    """Batched ElGamal commitments in extended form."""

    c: pt.ExtPoint
    d: pt.ExtPoint


class BatchPk(NamedTuple):
    gr: pt.ExtPoint
    grsk: pt.ExtPoint


# ---------------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------------

def pks_to_device(pks) -> BatchPk:
    """List of host RistrettoPublicKey -> batched device points."""
    gr = pt.from_exact_batch([pk.gr_point for pk in pks])
    grsk = pt.from_exact_batch([pk.grsk_point for pk in pks])
    return BatchPk(gr, grsk)


def comms_to_device(comms) -> BatchCommitment:
    c = pt.from_exact_batch([cm.c_point for cm in comms])
    d = pt.from_exact_batch([cm.d_point for cm in comms])
    return BatchCommitment(c, d)


def scalars_to_device(scalars) -> jnp.ndarray:
    return jnp.asarray(pt.scalars_to_nibbles(scalars))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def generate_commitments_raw(pk: BatchPk, r_nibbles: jnp.ndarray,
                             v_nibbles: jnp.ndarray) -> BatchCommitment:
    """(c, d) = (r*gr, v*G + r*grsk), batched."""
    c = pt.scalar_mul_raw(r_nibbles, pk.gr)
    gv = pt.base_mul_raw(v_nibbles)
    kh = pt.scalar_mul_raw(r_nibbles, pk.grsk)
    return BatchCommitment(c, pt.add_raw(gv, kh))


generate_commitments = jax.jit(generate_commitments_raw)


def add_commitments_raw(a: BatchCommitment, b: BatchCommitment) -> BatchCommitment:
    return BatchCommitment(pt.add_raw(a.c, b.c), pt.add_raw(a.d, b.d))


add_commitments = jax.jit(add_commitments_raw)


def sub_commitments_raw(a: BatchCommitment, b: BatchCommitment) -> BatchCommitment:
    return BatchCommitment(pt.sub_raw(a.c, b.c), pt.sub_raw(a.d, b.d))


sub_commitments = jax.jit(sub_commitments_raw)


def scale_commitments_raw(a: BatchCommitment, nibbles: jnp.ndarray) -> BatchCommitment:
    return BatchCommitment(pt.scalar_mul_raw(nibbles, a.c),
                           pt.scalar_mul_raw(nibbles, a.d))


scale_commitments = jax.jit(scale_commitments_raw)


def verify_commitments_raw(comm: BatchCommitment, sk_nibbles: jnp.ndarray,
                           v_nibbles: jnp.ndarray) -> jnp.ndarray:
    """d == v*G + sk*c, batched -> bool[batch]."""
    rhs = pt.add_raw(pt.base_mul_raw(v_nibbles),
                     pt.scalar_mul_raw(sk_nibbles, comm.c))
    return pt.eq_raw(comm.d, rhs)


verify_commitments = jax.jit(verify_commitments_raw)


def update_pks_raw(pk: BatchPk, c_nibbles: jnp.ndarray) -> BatchPk:
    """pk' = c * pk (ristretto/keys.rs:146-148), batched."""
    return BatchPk(pt.scalar_mul_raw(c_nibbles, pk.gr),
                   pt.scalar_mul_raw(c_nibbles, pk.grsk))


update_pks = jax.jit(update_pks_raw)


def update_accounts_raw(pk: BatchPk, comm: BatchCommitment,
                        bl_nibbles: jnp.ndarray,
                        update_key_nibbles: jnp.ndarray,
                        comm_nibbles: jnp.ndarray):
    """Account::update_account (accounts.rs:143-154), batched:
    pk' = c*pk; comm' = comm + Enc_pk(bl; r)."""
    new_pk = update_pks_raw(pk, update_key_nibbles)
    new_comm = generate_commitments_raw(pk, comm_nibbles, bl_nibbles)
    return new_pk, add_commitments_raw(new_comm, comm)


update_accounts = jax.jit(update_accounts_raw)


def verify_keypairs_raw(pk: BatchPk, sk_nibbles: jnp.ndarray) -> jnp.ndarray:
    """grsk == sk * gr (ristretto/keys.rs:187-195), batched."""
    return pt.eq_raw(pk.grsk, pt.scalar_mul_raw(sk_nibbles, pk.gr))


verify_keypairs = jax.jit(verify_keypairs_raw)


# ---------------------------------------------------------------------------
# Pallas fast paths (TPU): same semantics, mega-kernel scalar-muls
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("tile",))
def generate_commitments_pallas(pk: BatchPk, r_nibbles: jnp.ndarray,
                                v_nibbles: jnp.ndarray,
                                tile: int = 256) -> BatchCommitment:
    """(c, d) = (r*gr, v*G + r*grsk) using the Pallas ladder kernels."""
    from . import pallas_point as pp
    c = pp.scalar_mul_pallas(r_nibbles, pk.gr, tile=tile)
    gv = pp.base_mul_pallas(v_nibbles, tile=tile)
    kh = pp.scalar_mul_pallas(r_nibbles, pk.grsk, tile=tile)
    return BatchCommitment(c, pt.add_raw(gv, kh))


@partial(jax.jit, static_argnames=("tile",))
def verify_commitments_pallas(comm: BatchCommitment, sk_nibbles: jnp.ndarray,
                              v_nibbles: jnp.ndarray,
                              tile: int = 256) -> jnp.ndarray:
    from . import pallas_point as pp
    rhs = pt.add_raw(pp.base_mul_pallas(v_nibbles, tile=tile),
                     pp.scalar_mul_pallas(sk_nibbles, comm.c, tile=tile))
    return pt.eq_raw(comm.d, rhs)
