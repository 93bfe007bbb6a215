"""Device-batched account operations.

Batch counterparts of the Account-layer hot paths: delta/epsilon account
creation (accounts.rs:198-220 — 2n ElGamal commitments) and bulk account
updates run as fused device kernels over the whole account vector; only the
compressed 64-byte wire forms return to the host.

Byte-identical to the host Account methods given the same SeededRng
(tests/test_device_accounts.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from ..ops import exact as ex
from ..ops import point as pt
from ..ops import batch as qb
from ..ops import field as fe
from ..primitives.keys import RistrettoPublicKey
from ..primitives.elgamal import ElGamalCommitment
from .accounts import Account
from .transcript import SeededRng

L = ex.L


def _comm_to_host(comm: qb.BatchCommitment) -> List[ElGamalCommitment]:
    c_bytes = fe.to_bytes(pt.compress(comm.c))
    d_bytes = fe.to_bytes(pt.compress(comm.d))
    return [ElGamalCommitment(bytes(cb), bytes(db))
            for cb, db in zip(c_bytes, d_bytes)]


def create_delta_and_epsilon_accounts_device(
    accounts: Sequence[Account], bl: Sequence[int],
    base_pk: RistrettoPublicKey, rng: SeededRng,
) -> Tuple[List[Account], List[Account], List[int]]:
    """Device-batched Account.create_delta_and_epsilon_accounts.

    Draws rscalars in the same order as the host version, so outputs are
    byte-identical for the same rng state.
    """
    n = len(accounts)
    rscalar = Account.generate_sum_and_negate_rscalar(n, rng)
    pk_dev = qb.pks_to_device([a.pk for a in accounts])
    base_dev = qb.pks_to_device([base_pk] * n)
    r_nib = qb.scalars_to_device(rscalar)
    v_nib = qb.scalars_to_device([v % L for v in bl])
    delta_comm = qb.generate_commitments(pk_dev, r_nib, v_nib)
    eps_comm = qb.generate_commitments(base_dev, r_nib, v_nib)
    delta_host = _comm_to_host(delta_comm)
    eps_host = _comm_to_host(eps_comm)
    delta = [Account(a.pk, c) for a, c in zip(accounts, delta_host)]
    epsilon = [Account(base_pk, c) for c in eps_host]
    return delta, epsilon, rscalar


def update_accounts_device(
    accounts: Sequence[Account], bl: Sequence[int],
    update_key_scalars: Sequence[int],
    commitment_scalars: Sequence[int],
) -> List[Account]:
    """Device-batched Account.update_account over an account vector."""
    pk_dev = qb.pks_to_device([a.pk for a in accounts])
    comm_dev = qb.comms_to_device([a.comm for a in accounts])
    new_pk, new_comm = qb.update_accounts(
        pk_dev, comm_dev, qb.scalars_to_device([v % L for v in bl]),
        qb.scalars_to_device(list(update_key_scalars)),
        qb.scalars_to_device(list(commitment_scalars)))
    gr_bytes = fe.to_bytes(pt.compress(new_pk.gr))
    grsk_bytes = fe.to_bytes(pt.compress(new_pk.grsk))
    comm_host = _comm_to_host(new_comm)
    return [
        Account(RistrettoPublicKey(bytes(g), bytes(h)), c)
        for g, h, c in zip(gr_bytes, grsk_bytes, comm_host)
    ]
