"""Account model, transcripts, sigma provers/verifiers, range proofs.

Mirrors the reference's `accounts` module surface
(/root/reference/src/accounts/mod.rs).
"""

from .accounts import Account  # noqa: F401
from .transcript import Transcript, TranscriptRng, SeededRng  # noqa: F401
from .prover import Prover, SigmaProof  # noqa: F401
from .verifier import Verifier  # noqa: F401
from .rangeproof import RangeProofProver, RangeProofVerifier, range_proof_gadget  # noqa: F401
