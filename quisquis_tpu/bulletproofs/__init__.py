"""Bulletproofs: generators, inner-product argument, range proofs, R1CS."""

from .generators import BulletproofGens, bulletproof_gens  # noqa: F401
from .inner_product import InnerProductProof  # noqa: F401
from .range_proof import RangeProof  # noqa: F401
from .r1cs import R1CSProver, R1CSVerifier, R1CSProof, LinearCombination  # noqa: F401
