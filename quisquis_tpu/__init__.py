"""quisquis_tpu: a TPU-native QuisQuis protocol framework.

From-scratch JAX/Pallas re-design of the capabilities of
`twilight-project/quisquis-rust` (reference layout: src/lib.rs:14-49):
accounts, elgamal, keys, ristretto, pedersen, shuffle (+ transaction, util).

Layering (TPU-first):
  ops/         int32-limb GF(2^255-19) + Edwards/ristretto kernels, MSM,
               Keccak/STROBE, exact host backend
  primitives/  keys, ElGamal + Pedersen commitments, zkSchnorr
  accounts/    Account model, Merlin transcripts, sigma provers/verifiers,
               range proofs
  bulletproofs/ 64-bit aggregated range proofs (inner-product argument)
  shuffle/     Bayer-Groth shuffle argument suite (parameterized m x n)
  transaction/ full QuisQuis transaction orchestration
  parallel/    jax.sharding mesh partitioning (MSM / batch verification)
  utils/       addresses, serde helpers
"""

from .primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from .primitives.elgamal import ElGamalCommitment
from .accounts.accounts import Account

__all__ = [
    "Account",
    "ElGamalCommitment",
    "RistrettoPublicKey",
    "RistrettoSecretKey",
]

__version__ = "0.1.0"

# enable the native C++ curve backend (if built) now that the package is
# fully initialized
from .ops.exact import _try_enable_native as _qq_enable_native  # noqa: E402

_qq_enable_native()
del _qq_enable_native
