"""Device-batched account ops == host account ops (byte-identical)."""

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import SeededRng
from quisquis_tpu.accounts.device_accounts import (
    create_delta_and_epsilon_accounts_device, update_accounts_device)

L = ex.L


def make_accounts(r, n=8):
    out = []
    for _ in range(n):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        out.append(acc)
    return out


def test_delta_epsilon_device_matches_host():
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [(-5) % L, 5, 0, 0, 0, 0, 0, 0]
    r1 = SeededRng(seed=b"da")
    accounts = make_accounts(r1)
    # same account set + identically-seeded rngs for both paths
    r_host = SeededRng(seed=b"db")
    r_dev = SeededRng(seed=b"db")
    d_h, e_h, rs_h = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r_host)
    d_d, e_d, rs_d = create_delta_and_epsilon_accounts_device(
        accounts, values, base_pk, r_dev)
    assert rs_h == rs_d
    assert all(a == b for a, b in zip(d_h, d_d))
    assert all(a == b for a, b in zip(e_h, e_d))


def test_update_accounts_device_matches_host():
    r = SeededRng(seed=b"upd-dev")
    accounts = make_accounts(r)
    bl = [7] * 8
    uks = [r.random_scalar() for _ in range(8)]
    cs = [r.random_scalar() for _ in range(8)]
    host = [Account.update_account(a, b, u, c)
            for a, b, u, c in zip(accounts, bl, uks, cs)]
    dev = update_accounts_device(accounts, bl, uks, cs)
    assert all(a == b for a, b in zip(host, dev))
