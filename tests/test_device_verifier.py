"""Device batched sigma verification == host verification."""

import pytest

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import RistrettoPublicKey
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.prover import Prover
from quisquis_tpu.accounts.verifier import Verifier
from quisquis_tpu.accounts.device_verifier import (
    verify_delta_compact_verifier_device,
    zero_balance_account_vector_verifier_device)
from tests.test_sigma import make_updated_accounts

L = ex.L


def test_delta_compact_device_verifier():
    r = SeededRng(seed=b"devv")
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [(-5) % L, 5, 0, 0, 0, 0, 0, 0]
    accounts, _ = make_updated_accounts(r, n=8)
    delta, epsilon, rscalars = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)
    t = Transcript(b"DeltaCompact")
    prover = Prover(b"DLEQProof", t, rng=r)
    zv, zr1, zr2, x = Prover.verify_delta_compact_prover(
        delta, epsilon, rscalars, values, prover).get_dleq()
    # device path accepts
    tv = Transcript(b"DeltaCompact")
    verify_delta_compact_verifier_device(
        delta, epsilon, zv, zr1, zr2, x, Verifier(b"DLEQProof", tv))
    # and rejects tampering
    tv2 = Transcript(b"DeltaCompact")
    with pytest.raises(ValueError):
        verify_delta_compact_verifier_device(
            delta, epsilon, [(z + 1) % L for z in zv], zr1, zr2, x,
            Verifier(b"DLEQProof", tv2))


def test_zero_balance_device_verifier():
    r = SeededRng(seed=b"devz")
    base_pk = RistrettoPublicKey.generate_base_pk()
    key = RistrettoPublicKey.update_public_key(base_pk, r.random_scalar())
    accounts, rscalars = [], []
    for _ in range(8):
        acc, cr = Account.generate_account(
            RistrettoPublicKey.update_public_key(key, r.random_scalar()), r)
        accounts.append(acc)
        rscalars.append(cr)
    t = Transcript(b"ZB")
    prover = Prover(b"DLOGProof", t, rng=r)
    z, x = Prover.zero_balance_account_vector_prover(
        accounts, rscalars, prover).get_dlog()
    tv = Transcript(b"ZB")
    zero_balance_account_vector_verifier_device(
        accounts, z, x, Verifier(b"DLOGProof", tv))
