"""Key, commitment, and signature primitives."""

from .keys import RistrettoPublicKey, RistrettoSecretKey, BASE_PK_BTC  # noqa: F401
from .elgamal import ElGamalCommitment  # noqa: F401
from .pedersen import PedersenGens, VectorPedersenGens, default_pedersen_gens, vector_pedersen_gens  # noqa: F401
from .schnorr import Signature, VerificationKey  # noqa: F401
