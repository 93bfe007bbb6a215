"""Demo CLI (equivalent of the reference's `quisquisbin`,
/root/reference/src/bin.rs:15-117): keygen -> account -> update -> pk
update/verify -> base pk -> commitments add; plus a full-transaction demo.

Run: python -m quisquis_tpu.cli
"""

from __future__ import annotations

from .ops import exact as ex
from .primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from .primitives.elgamal import ElGamalCommitment
from .accounts.accounts import Account
from .accounts.transcript import SeededRng


def main() -> None:
    rng = SeededRng()
    print("== quisquis_tpu demo ==")

    sk = RistrettoSecretKey.random(rng)
    pk = RistrettoPublicKey.from_secret_key(sk, rng)
    print(f"secret key : {sk.as_bytes().hex()}")
    print(f"public key : {pk.as_bytes().hex()}")

    acc, comm_scalar = Account.generate_account(pk, rng)
    print(f"account    : pk={acc.pk.as_bytes().hex()[:32]}.. "
          f"comm={acc.comm.to_bytes().hex()[:32]}..")
    acc.verify_account(sk, 0)
    print("verify_account(0)          : OK")

    updated = Account.update_account(acc, 16, rng.random_scalar(),
                                     rng.random_scalar())
    updated.verify_account(sk, 16)
    print("update_account(+16) verify : OK")

    update_scalar = rng.random_scalar()
    updated_pk = RistrettoPublicKey.update_public_key(pk, update_scalar)
    assert RistrettoPublicKey.verify_public_key_update(updated_pk, pk,
                                                       update_scalar)
    print("pk update + verify         : OK")

    base_pk = RistrettoPublicKey.generate_base_pk()
    print(f"base pk    : {base_pk.as_bytes().hex()[:32]}..")

    c1 = ElGamalCommitment.generate_commitment(pk, rng.random_scalar(), 16)
    c2 = ElGamalCommitment.generate_commitment(pk, rng.random_scalar(), 26)
    added = ElGamalCommitment.add_commitments(c1, c2)
    added.verify_commitment(sk, 42)
    print("commitment add (16+26=42)  : OK")

    print(f"decommit(42) == 42         : "
          f"{added.decommit_value(sk, max_value=1 << 16) == 42}")


if __name__ == "__main__":
    main()
