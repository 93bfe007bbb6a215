"""Multi-process transaction-verification service (the serving path).

The reference library has no serving story at all — its (dead) transaction
module only self-verifies during creation
(/root/reference/src/transaction/transaction.rs:487-749). This module is the
production-deployment counterpart: a persistent pool of worker *processes*
that verify wire-format transactions in parallel.

Why processes and not threads: a transaction verification replays sigma and
shuffle transcripts on the host, and its wall-clock is dominated by
Python-side orchestration (scalar arithmetic mod ℓ, transcript framing,
ctypes marshalling) that holds the GIL — threads cannot scale it, processes
can. Each worker chunk collects all of its point-identity checks into one
random-weighted MSM (accounts.deferred), so a pool of W workers evaluates W
MSMs instead of per-check small ones.

Transactions cross the process boundary in the framework's wire format
(utils/serde.py), which doubles as an end-to-end exercise of the
deserialization validation path — exactly what a network-facing verifier
service would execute. Workers never touch JAX or the TPU: the host native
curve backend (native/qq_curve.cpp) is the right tool for the many small
MSMs of transcript replay; the device owns the large batched kernels.
"""

from __future__ import annotations

import concurrent.futures as _cf
import hashlib
import multiprocessing as _mp
import os
from typing import List, Optional, Sequence, Tuple

WirePair = Tuple[bytes, bytes]  # (transaction bytes, proof bytes)


def serialize_transaction(tx, proof) -> WirePair:
    """Encode a (Transaction, TransactionProof) pair to wire bytes."""
    from .utils import serde

    return (serde.transaction_to_bytes(tx),
            serde.transaction_proof_to_bytes(proof))


def _verify_chunk(pairs: List[WirePair], seed: bytes) -> int:
    """Worker entry: deserialize and verify a chunk of wire transactions.

    Raises ValueError (propagated to the caller's future) on the first
    invalid transaction or malformed wire blob; returns the count verified.
    """
    from .utils import serde
    from .transaction.transaction import batch_verify_transactions

    items = [(serde.transaction_from_bytes(txb),
              serde.transaction_proof_from_bytes(pfb))
             for txb, pfb in pairs]
    batch_verify_transactions(items, backend="host", seed=seed, workers=1)
    return len(items)


class VerificationService:
    """Persistent process pool verifying wire-format transactions.

    Usage::

        svc = VerificationService(workers=4)
        svc.verify_wire(pairs)          # [(tx_bytes, proof_bytes), ...]
        svc.verify(items)               # [(Transaction, TransactionProof)]
        svc.close()                     # or use as a context manager

    Accepts everything or raises ValueError naming the failing chunk; the
    soundness argument is the same random-linear-combination MSM batching
    as batch_verify_transactions, with an independent weight seed per chunk.
    """

    def __init__(self, workers: Optional[int] = None,
                 seed: Optional[bytes] = None):
        self.workers = workers or (os.cpu_count() or 1)
        self._seed = os.urandom(32) if seed is None else bytes(seed)
        # fork: workers inherit the already-loaded native library and
        # generator caches instead of re-importing (~1s saved per worker);
        # host verification never touches JAX/TPU state, so forking is safe
        ctx = _mp.get_context("fork" if "fork" in _mp.get_all_start_methods()
                              else "spawn")
        self._pool = _cf.ProcessPoolExecutor(max_workers=self.workers,
                                             mp_context=ctx)

    def _chunk_seed(self, index: int) -> bytes:
        return hashlib.sha512(self._seed + b"chunk"
                              + index.to_bytes(8, "little")).digest()[:32]

    def verify_wire(self, pairs: Sequence[WirePair]) -> int:
        """Verify wire-format transactions across the pool; returns count."""
        pairs = list(pairs)
        if not pairs:
            return 0
        nchunks = min(self.workers, len(pairs))
        chunks = [pairs[i::nchunks] for i in range(nchunks)]
        futures = [self._pool.submit(_verify_chunk, c, self._chunk_seed(i))
                   for i, c in enumerate(chunks)]
        total = 0
        err = None
        for i, f in enumerate(futures):
            try:
                total += f.result()
            except ValueError as e:
                err = err or ValueError(f"chunk {i}: {e}")
        if err is not None:
            raise err
        return total

    def verify(self, items) -> int:
        """Verify in-memory (Transaction, TransactionProof) pairs."""
        return self.verify_wire([serialize_transaction(tx, pf)
                                 for tx, pf in items])

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self) -> "VerificationService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# observability
from .utils.metrics import instrument as _instrument  # noqa: E402

VerificationService.verify_wire = _instrument("serving.verify_wire")(
    VerificationService.verify_wire)
