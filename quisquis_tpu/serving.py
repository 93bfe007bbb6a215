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


class BuildRequest:
    """Wire-friendly transaction-build request (picklable across workers).

    Fields mirror the inputs of transaction.create_transaction for the
    common single-sender/single-receiver transfer; the anonymity set is
    padded to `n` with fresh zero-balance accounts inside the worker
    (transaction.rs:103-164 semantics).
    """

    __slots__ = ("sender_account", "sender_sk", "amount", "receiver_pk",
                 "sender_updated_balance", "n", "seed")

    def __init__(self, sender_account: bytes, sender_sk: bytes, amount: int,
                 receiver_pk: bytes, sender_updated_balance: int, n: int = 9,
                 seed: Optional[bytes] = None):
        self.sender_account = bytes(sender_account)  # 128-byte account wire
        self.sender_sk = bytes(sender_sk)            # 32-byte scalar
        self.amount = int(amount)
        self.receiver_pk = bytes(receiver_pk)        # 64-byte dual-point pk
        self.sender_updated_balance = int(sender_updated_balance)
        self.n = int(n)
        self.seed = seed

    def __getstate__(self):
        return tuple(getattr(self, s) for s in self.__slots__)

    def __setstate__(self, state):
        for s, v in zip(self.__slots__, state):
            setattr(self, s, v)


def _build_chunk(reqs: List[BuildRequest], seed: bytes) -> List[WirePair]:
    """Worker entry: build (prove + self-verify) a chunk of transactions and
    return them in wire format."""
    from .accounts.accounts import Account
    from .accounts.transcript import SeededRng
    from .ops import exact as ex
    from .primitives.keys import RistrettoPublicKey, RistrettoSecretKey
    from .transaction.transaction import (
        Sender, Receiver, create_transaction,
        generate_value_and_account_vector)

    out: List[WirePair] = []
    for i, req in enumerate(reqs):
        rng = SeededRng(seed=(req.seed if req.seed is not None else
                              seed + i.to_bytes(8, "little")))
        account = Account.from_bytes(req.sender_account)
        # NOT RistrettoSecretKey.from_bytes: that is the reference's
        # hash-to-scalar derivation (keys.rs:45), not a deserializer —
        # here the wire carries the canonical scalar bytes themselves
        sk = RistrettoSecretKey(ex.sc_from_bytes_mod_order(req.sender_sk))
        rec_pk = RistrettoPublicKey.from_bytes(req.receiver_pk)
        sender = Sender(total_amount=-req.amount, account=account,
                        receivers=[Receiver(req.amount, rec_pk)])
        values, accounts, anon, diff, sc, rc = \
            generate_value_and_account_vector([sender], rng=rng, n=req.n)
        tx, proof = create_transaction(
            values, accounts,
            sender_updated_balance=[req.sender_updated_balance],
            sender_sk=[sk], anonymity_comm_scalar=anon,
            anonymity_account_diff=diff,
            receiver_updated_balance=[req.amount],
            senders_count=sc, receivers_count=rc, rng=rng)
        out.append(serialize_transaction(tx, proof))
    return out


class ProvingService:
    """Persistent process pool *building* transactions (prove-side twin of
    VerificationService; same GIL rationale). Returns wire-format pairs in
    request order, each already self-verified by create_transaction."""

    def __init__(self, workers: Optional[int] = None,
                 seed: Optional[bytes] = None):
        self.workers = workers or (os.cpu_count() or 1)
        self._seed = os.urandom(32) if seed is None else bytes(seed)
        ctx = _mp.get_context("fork" if "fork" in _mp.get_all_start_methods()
                              else "spawn")
        self._pool = _cf.ProcessPoolExecutor(max_workers=self.workers,
                                             mp_context=ctx)

    def build(self, requests: Sequence[BuildRequest]) -> List[WirePair]:
        requests = list(requests)
        if not requests:
            return []
        nchunks = min(self.workers, len(requests))
        chunks = [requests[i::nchunks] for i in range(nchunks)]
        seeds = [hashlib.sha512(self._seed + b"build"
                                + i.to_bytes(8, "little")).digest()[:32]
                 for i in range(nchunks)]
        futures = [self._pool.submit(_build_chunk, c, s)
                   for c, s in zip(chunks, seeds)]
        results = [f.result() for f in futures]
        # un-interleave back to request order
        out: List[Optional[WirePair]] = [None] * len(requests)
        for i, chunk_out in enumerate(results):
            out[i::nchunks] = chunk_out
        return out  # type: ignore[return-value]

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self) -> "ProvingService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# observability
from .utils.metrics import instrument as _instrument  # noqa: E402

VerificationService.verify_wire = _instrument("serving.verify_wire")(
    VerificationService.verify_wire)
ProvingService.build = _instrument("serving.build")(ProvingService.build)
