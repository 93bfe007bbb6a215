"""Deferred point-identity checks: cross-proof batch verification.

The reference verifies every proof eagerly, one multiscalar multiplication
at a time (/root/reference/src/accounts/verifier.rs:91-99 and every
`pt_eq`-style check in /root/reference/src/shuffle/*.rs). On TPU the right
shape is the opposite: collect every point-identity check from a *batch* of
proofs, scale each by an independent random 128-bit weight, and evaluate
the whole thing as ONE large MSM on the device Pallas Pippenger pipeline
(the same random-linear-combination trick the vendored bulletproofs crate
uses for `RangeProof::verify_multiple` batching, generalized to arbitrary
sigma/shuffle checks).

Soundness: if any single check Σ s_i·P_i ≠ identity, the weighted sum is
non-identity except with probability 2^-128 over the verifier's weights
(which the prover cannot predict — they are drawn fresh per verification
from OS entropy unless a seed is pinned for tests).

Fiat–Shamir challenges still derive on the host transcript (sequential
Keccak, cheap); only the heavy point arithmetic is deferred. Checks whose
*result bytes feed back into the transcript* (Schnorr-style first-message
recomputation, e.g. ddh.rs:109-142) cannot be deferred and stay eager.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Sequence

from ..ops import exact as ex

L = ex.L


def assert_identity(defer: Optional["DeferredPointChecks"],
                    scalars: Sequence[int], points: Sequence[ex.Point],
                    msg: str) -> None:
    """Assert Σ s_i·P_i == identity — immediately, or deferred into `defer`."""
    if defer is not None:
        defer.check(scalars, points, msg)
    elif not ex.pt_eq(ex.pt_msm(scalars, points), ex.IDENTITY):
        raise ValueError(msg)


class DeferredPointChecks:
    """Accumulates point-identity assertions Σ s_i·P_i == identity.

    Duplicate points (Pedersen generators appear in nearly every check)
    are coalesced by accumulating their weighted scalars, so a batch of B
    shuffle proofs costs one MSM over roughly B·(unique commitments) terms
    instead of B·(all terms).
    """

    def __init__(self, seed: Optional[bytes] = None):
        self._seed = os.urandom(32) if seed is None else bytes(seed)
        self._ctr = 0
        # keyed by id(point): the repeated points (Pedersen generators) are
        # the same cached objects across every check, and id() avoids
        # hashing 4-bigint tuples on every term. Distinct objects holding
        # equal points simply stay as separate MSM terms (correct, just
        # unmerged).
        self._acc: dict = {}   # id(point) -> accumulated scalar mod L
        self._pts: dict = {}   # id(point) -> point
        self.labels: List[str] = []

    def _weight(self) -> int:
        h = hashlib.sha512(
            self._seed + self._ctr.to_bytes(8, "little")).digest()
        self._ctr += 1
        return int.from_bytes(h[:16], "little") | (1 << 127)

    def check(self, scalars: Sequence[int], points: Sequence[ex.Point],
              msg: str) -> None:
        """Assert Σ scalars_i · points_i == identity (deferred)."""
        if len(scalars) != len(points):
            raise ValueError(f"{msg}: scalar/point length mismatch")
        w = self._weight()
        acc = self._acc
        pts = self._pts
        for s, p in zip(scalars, points):
            k = id(p)
            if k in acc:
                acc[k] = (acc[k] + w * s) % L
            else:
                acc[k] = w * s % L
                pts[k] = p
        self.labels.append(msg)

    def check_eq(self, scalars: Sequence[int], points: Sequence[ex.Point],
                 rhs: ex.Point, msg: str) -> None:
        """Assert Σ scalars_i · points_i == rhs (deferred)."""
        self.check(list(scalars) + [L - 1], list(points) + [rhs], msg)

    def derive(self, index: int) -> "DeferredPointChecks":
        """A sub-accumulator with an independent weight stream.

        Used to split a batch across worker threads: each worker collects
        into its own accumulator (no shared mutable state), and the parts
        are `merge`d into one MSM at the end. The sub-seed is derived from
        this accumulator's seed, so the prover can predict it exactly when
        they can predict the parent's (i.e. never, unless a test pins it).
        """
        return DeferredPointChecks(hashlib.sha512(
            self._seed + b"derive" + index.to_bytes(8, "little")).digest()[:32])

    def merge(self, other: "DeferredPointChecks") -> None:
        """Fold another accumulator's terms into this one."""
        acc, pts = self._acc, self._pts
        for k, s in other._acc.items():
            if k in acc:
                acc[k] = (acc[k] + s) % L
            else:
                acc[k] = s
                pts[k] = other._pts[k]
        self.labels.extend(other.labels)

    @property
    def num_terms(self) -> int:
        return len(self._acc)

    def _terms(self):
        items = [(s, self._pts[k]) for k, s in self._acc.items() if s != 0]
        return [s for s, _ in items], [p for _, p in items]

    def verify(self, backend: str = "auto", mesh=None) -> None:
        """Evaluate the combined MSM; raise ValueError if non-identity.

        backend: "host" (native threaded Pippenger), "device" (Pallas/XLA
        MSM on the default JAX device), "sharded" (point axis sharded over
        `mesh`), or "auto" (host for small term counts, device otherwise).
        """
        scalars, points = self._terms()
        if not scalars:
            return
        if backend == "auto":
            # the threaded native host Pippenger wins until the MSM is
            # large enough to amortize device transfer + dispatch (the
            # bench TPU sits behind a ~60 ms tunnel; measured crossover
            # is in the tens of thousands of terms)
            backend = "device" if len(scalars) >= 32768 else "host"
        if backend == "host":
            total = ex.pt_msm(scalars, points)
        elif backend == "device":
            from ..ops import msm as qmsm
            total = qmsm.msm_host(scalars, points)
        elif backend == "sharded":
            if mesh is None:
                raise ValueError("sharded backend requires a mesh")
            import jax.numpy as jnp
            from ..ops import point as pt
            from ..parallel.sharded_msm import sharded_msm
            ndev = mesh.devices.size
            pad = (-len(scalars)) % ndev
            scalars = list(scalars) + [0] * pad
            points = list(points) + [ex.IDENTITY] * pad
            nib = jnp.asarray(pt.scalars_to_nibbles(scalars))
            out = sharded_msm(mesh, nib, pt.from_exact_batch(points))
            single = pt.ExtPoint(out.x[None], out.y[None],
                                 out.z[None], out.t[None])
            total = pt.to_exact_batch(single)[0]
        else:
            raise ValueError(f"unknown backend {backend!r}")
        if not ex.pt_eq(total, ex.IDENTITY):
            raise ValueError(
                "Batched point-check verification failed; one of: "
                + "; ".join(sorted(set(self.labels))))
