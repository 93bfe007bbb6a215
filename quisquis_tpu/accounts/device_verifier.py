"""Device-accelerated batched sigma verification.

The host verifiers (:mod:`quisquis_tpu.accounts.verifier`) recompute the
prover's first messages with per-account multiscalar multiplications — the
verifier hot path (SURVEY §3.3). Here those recombinations run as ONE
batched kernel over all accounts on the device, and only the compressed
32-byte digests return to the host transcript:

    e_delta_i = zr1_i*gr_i + x*c_i
    f_delta_i = zv_i*G + zr1_i*grsk_i + x*d_i          (G fixed-base)
    e_eps_i   = zr2_i*gr'_i + x*c'_i
    f_eps_i   = zv_i*G + zr2_i*grsk'_i + x*d'_i

Equivalent to Verifier.verify_delta_compact_verifier byte-for-byte
(tests/test_device_verifier.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import exact as ex
from ..ops import point as pt
from ..ops import batch as qb
from .accounts import Account
from .verifier import Verifier

L = ex.L


def _dsum_raw(n1, p1: pt.ExtPoint, n2, p2: pt.ExtPoint) -> pt.ExtPoint:
    return pt.add_raw(pt.scalar_mul_raw(n1, p1), pt.scalar_mul_raw(n2, p2))


def _dsum_base_raw(nv, n1, p1: pt.ExtPoint, n2, p2: pt.ExtPoint) -> pt.ExtPoint:
    return pt.add_raw(pt.base_mul_raw(nv), _dsum_raw(n1, p1, n2, p2))


@jax.jit
def _delta_compact_kernel(d_pk: qb.BatchPk, d_comm: qb.BatchCommitment,
                          e_pk: qb.BatchPk, e_comm: qb.BatchCommitment,
                          zv, zr1, zr2, x):
    e_delta = _dsum_raw(zr1, d_pk.gr, x, d_comm.c)
    f_delta = _dsum_base_raw(zv, zr1, d_pk.grsk, x, d_comm.d)
    e_eps = _dsum_raw(zr2, e_pk.gr, x, e_comm.c)
    f_eps = _dsum_base_raw(zv, zr2, e_pk.grsk, x, e_comm.d)
    return (pt.compress_raw(e_delta), pt.compress_raw(f_delta),
            pt.compress_raw(e_eps), pt.compress_raw(f_eps))


def verify_delta_compact_verifier_device(
    delta_accounts: Sequence[Account], epsilon_accounts: Sequence[Account],
    zv_vector: Sequence[int], zr1_vector: Sequence[int],
    zr2_vector: Sequence[int], x: int, verifier: Verifier,
) -> None:
    """Batched-device version of Verifier.verify_delta_compact_verifier."""
    n = len(delta_accounts)
    verifier.new_domain_sep(b"VerifyDeltaCompact")
    for d, e in zip(delta_accounts, epsilon_accounts):
        verifier.allocate_account(b"delta_account", d)
        verifier.allocate_account(b"epsilon_account", e)

    d_pk = qb.pks_to_device([a.pk for a in delta_accounts])
    d_comm = qb.comms_to_device([a.comm for a in delta_accounts])
    e_pk = qb.pks_to_device([a.pk for a in epsilon_accounts])
    e_comm = qb.comms_to_device([a.comm for a in epsilon_accounts])
    zv = qb.scalars_to_device(list(zv_vector))
    zr1 = qb.scalars_to_device(list(zr1_vector))
    zr2 = qb.scalars_to_device(list(zr2_vector))
    xs = qb.scalars_to_device([x] * n)

    e_d, f_d, e_e, f_e = _delta_compact_kernel(
        d_pk, d_comm, e_pk, e_comm, zv, zr1, zr2, xs)
    from ..ops import field as fe
    e_d_b, f_d_b = fe.to_bytes(e_d), fe.to_bytes(f_d)
    e_e_b, f_e_b = fe.to_bytes(e_e), fe.to_bytes(f_e)

    for i in range(n):
        verifier.allocate_point(b"e_delta", bytes(e_d_b[i]))
        verifier.allocate_point(b"f_delta", bytes(f_d_b[i]))
        verifier.allocate_point(b"e_epsilon", bytes(e_e_b[i]))
        verifier.allocate_point(b"f_epsilon", bytes(f_e_b[i]))
    if verifier.get_challenge(b"challenge") != x % L:
        raise ValueError("Dleq Proof Verify: Failed")


@jax.jit
def _zero_balance_kernel(pk: qb.BatchPk, comm: qb.BatchCommitment, z, x):
    e = _dsum_raw(z, pk.gr, x, comm.c)
    f = _dsum_raw(z, pk.grsk, x, comm.d)
    return pt.compress_raw(e), pt.compress_raw(f)


def zero_balance_account_vector_verifier_device(
    anonymity_accounts: Sequence[Account], z: Sequence[int], x: int,
    verifier: Verifier,
) -> None:
    """Batched-device version of zero_balance_account_vector_verifier."""
    n = len(anonymity_accounts)
    assert n == len(z)
    verifier.new_domain_sep(b"ZeroBalanceAccountVectorProof")
    for acc in anonymity_accounts:
        verifier.allocate_account(b"anonymity_account", acc)
    pk = qb.pks_to_device([a.pk for a in anonymity_accounts])
    comm = qb.comms_to_device([a.comm for a in anonymity_accounts])
    zs = qb.scalars_to_device(list(z))
    xs = qb.scalars_to_device([x] * n)
    e, f = _zero_balance_kernel(pk, comm, zs, xs)
    from ..ops import field as fe
    e_b, f_b = fe.to_bytes(e), fe.to_bytes(f)
    for i in range(n):
        verifier.allocate_point(b"e", bytes(e_b[i]))
        verifier.allocate_point(b"f", bytes(f_b[i]))
    if verifier.get_challenge(b"challenge") != x % L:
        raise ValueError("Zero balance account verification failed")
