"""Resident device daemon: one process owns the TPU and stays warm.

Why this exists (measured, round 5): the per-process cost of bringing a
one-program device verifier/prover up through the axon PJRT tunnel is
minutes per shape EVEN WITH a persistent-compilation-cache hit — with a
warm cache the m=2 shuffle verifier still pays ~77 s re-tracing, ~110 s
executable deserialize, and ~220 s first-execution finalization
(tools/cache_probe.py prints the breakdown). jax's cache key itself is
deterministic across processes (the probe shows the cross-process HIT);
the toll is plugin/runtime-side and not something a client process can
skip.

The production answer is architectural: exactly one resident process
(this daemon) pays the warmup once and keeps the compiled executables
live; every other process — serving workers, CLIs, batch jobs — connects
over a Unix socket and gets steady-state latency on its FIRST request
(tests/test_daemon.py asserts the protocol; tools/cache_probe.py --daemon
asserts the wall clock on real hardware).

The reference is a single-process Rust library with no JIT and no analog
(/root/reference/src/lib.rs); this is TPU-deployment infrastructure.

Protocol: multiprocessing.connection (length-prefixed pickle) with an
authkey. One request at a time — device programs serialize on the single
chip anyway. Requests:

  ("ping",)                                   -> ("ok", backend_name)
  ("warmup", [shape descriptors])             -> ("ok", seconds)
  ("shuffle-verify", [entry blobs], seed, backend)
                                              -> ("ok", count) | ("invalid", msg)
  ("range-prove", n, values, blindings, seeds)-> ("ok", [(proof bytes, [V bytes])])
  ("tx-verify", [(tx blob, proof blob)], seed)-> ("ok", count) | ("invalid", msg)
  ("shutdown",)                               -> ("ok", "bye")

Shape descriptors are utils.jaxcache's (("shuffle", m, B), ("range", n,
m, B), ("range-prove", n, m, B), ("shuffle-prove", m, B)).
"""

from __future__ import annotations

import os
import time
from multiprocessing.connection import Client as _Client
from multiprocessing.connection import Listener as _Listener
from typing import List, Optional, Sequence, Tuple

_DEFAULT_ADDR = os.path.join("/tmp", f"quisquis-daemon-{os.getuid()}.sock")
_DEFAULT_KEY = b"quisquis-tpu-daemon"


class DeviceDaemon:
    """The resident device owner. Construct, (optionally) warmup, serve."""

    def __init__(self, address: str = _DEFAULT_ADDR,
                 authkey: bytes = _DEFAULT_KEY,
                 shapes: Sequence[Tuple] = (),
                 platform: Optional[str] = None):
        from .utils.jaxcache import enable_persistent_cache

        if platform is not None:
            # must land before backend initialization; this rig's
            # sitecustomize registers the TPU plugin in every process and
            # the env var alone does not override it
            import jax

            jax.config.update("jax_platforms", platform)
        enable_persistent_cache()
        self.address = address
        self.shapes = list(shapes)
        if os.path.exists(address):
            os.unlink(address)
        self._listener = _Listener(address, "AF_UNIX", authkey=authkey)
        if self.shapes:
            self._do_warmup(self.shapes)

    # ------------------------------------------------------------ handlers

    @staticmethod
    def _do_warmup(shapes) -> float:
        from .utils.jaxcache import warmup

        t0 = time.time()
        warmup(shapes)
        return time.time() - t0

    @staticmethod
    def _shuffle_verify(blobs: List[bytes], seed: Optional[bytes],
                        backend: str = "auto") -> int:
        from .accounts.transcript import Transcript, SeededRng
        from .accounts.verifier import Verifier
        from .shuffle.shuffle import batch_verify_shuffle_proofs
        from .utils import serde

        entries = []
        for blob in blobs:
            proof, statement, inputs, outputs = \
                serde.shuffle_entry_from_bytes(blob)
            entries.append((proof,
                            Verifier(b"Shuffle", Transcript(b"ShuffleProof")),
                            statement, inputs, outputs))
        batch_verify_shuffle_proofs(
            entries, backend=backend,
            seed=seed if seed is not None else None)
        return len(entries)

    @staticmethod
    def _range_prove(n: int, values, blindings, seeds):
        from .accounts.transcript import Transcript, SeededRng
        from .bulletproofs.range_proof import RangeProof

        lanes = [(Transcript(b"RangeProof"), list(v), list(b),
                  SeededRng(seed=s))
                 for v, b, s in zip(values, blindings, seeds)]
        out = RangeProof.prove_batch(lanes, n, backend="auto")
        return [(proof.to_bytes(), list(V)) for proof, V in out]

    @staticmethod
    def _tx_verify(pairs, seed: Optional[bytes]) -> int:
        from .transaction.transaction import batch_verify_transactions
        from .utils import serde

        items = [(serde.transaction_from_bytes(t),
                  serde.transaction_proof_from_bytes(p)) for t, p in pairs]
        batch_verify_transactions(items, seed=seed)
        return len(items)

    # --------------------------------------------------------------- serve

    def serve_forever(self) -> None:
        """Accept-and-dispatch loop; returns after a shutdown request."""
        while True:
            conn = self._listener.accept()
            try:
                if self._serve_conn(conn):
                    return
            finally:
                conn.close()

    def _serve_conn(self, conn) -> bool:
        """Serve one connection until EOF; True means shutdown requested."""
        import jax

        while True:
            try:
                req = conn.recv()
            except EOFError:
                return False
            try:
                op = req[0]
                if op == "ping":
                    conn.send(("ok", jax.default_backend()))
                elif op == "warmup":
                    conn.send(("ok", self._do_warmup(req[1])))
                elif op == "shuffle-verify":
                    backend = req[3] if len(req) > 3 else "auto"
                    conn.send(("ok", self._shuffle_verify(req[1], req[2],
                                                          backend)))
                elif op == "range-prove":
                    conn.send(("ok", self._range_prove(req[1], req[2],
                                                       req[3], req[4])))
                elif op == "tx-verify":
                    conn.send(("ok", self._tx_verify(req[1], req[2])))
                elif op == "shutdown":
                    conn.send(("ok", "bye"))
                    return True
                else:
                    conn.send(("error", f"unknown op {op!r}"))
            except ValueError as e:          # verification failure
                conn.send(("invalid", str(e)))
            except Exception as e:           # noqa: BLE001 - report, keep serving
                conn.send(("error", f"{type(e).__name__}: {e}"))

    def close(self) -> None:
        self._listener.close()
        if os.path.exists(self.address):
            os.unlink(self.address)


class DeviceClient:
    """Thin client for DeviceDaemon; safe to use from freshly started
    processes — no jax import, no compilation, first request runs at the
    daemon's steady-state latency."""

    def __init__(self, address: str = _DEFAULT_ADDR,
                 authkey: bytes = _DEFAULT_KEY, retries: int = 50,
                 retry_delay: float = 0.2):
        last = None
        for _ in range(retries):
            try:
                self._conn = _Client(address, "AF_UNIX", authkey=authkey)
                break
            except (FileNotFoundError, ConnectionRefusedError) as e:
                last = e
                time.sleep(retry_delay)
        else:
            raise ConnectionError(f"daemon not reachable at {address}: {last}")

    def _call(self, *req):
        self._conn.send(req)
        status, payload = self._conn.recv()
        if status == "ok":
            return payload
        if status == "invalid":
            raise ValueError(payload)
        raise RuntimeError(payload)

    def ping(self) -> str:
        return self._call("ping")

    def warmup(self, shapes: Sequence[Tuple]) -> float:
        return self._call("warmup", list(shapes))

    def verify_shuffles(self, blobs: Sequence[bytes],
                        seed: Optional[bytes] = None,
                        backend: str = "auto") -> int:
        """Verify wire-format shuffle entries; raises ValueError if any
        proof fails. backend: shuffle.batch_verify_shuffle_proofs's
        ("auto" follows the measured crossover; "device-batched" forces
        the warmed one-program verifier)."""
        return self._call("shuffle-verify", list(blobs), seed, backend)

    def prove_ranges(self, n: int, values, blindings, seeds):
        """Batched aggregated range proving; returns
        [(proof bytes, [V bytes])] per lane."""
        return self._call("range-prove", n, list(values), list(blindings),
                          list(seeds))

    def verify_transactions(self, pairs, seed: Optional[bytes] = None) -> int:
        """Verify wire-format (transaction, proof) pairs."""
        return self._call("tx-verify", list(pairs), seed)

    def shutdown(self) -> None:
        try:
            self._call("shutdown")
        except (EOFError, ConnectionError, OSError):
            pass

    def close(self) -> None:
        self._conn.close()

    def __enter__(self) -> "DeviceClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def main(argv: Optional[List[str]] = None) -> None:
    """``python -m quisquis_tpu.daemon [--socket PATH] [shape ...]``

    Shapes: ``shuffle:m:B`` ``range:n:m:B`` ``range-prove:n:m:B``
    ``shuffle-prove:m:B`` (e.g. ``shuffle:8:16 range:64:16:64``)."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--socket", default=_DEFAULT_ADDR)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before init")
    ap.add_argument("shapes", nargs="*")
    args = ap.parse_args(argv)
    shapes = []
    for s in args.shapes:
        parts = s.split(":")
        shapes.append((parts[0],) + tuple(int(x) for x in parts[1:]))
    daemon = DeviceDaemon(args.socket, shapes=shapes,
                          platform=args.platform)
    print(f"quisquis daemon ready on {args.socket} "
          f"({len(shapes)} warm shapes)", flush=True)
    try:
        daemon.serve_forever()
    finally:
        daemon.close()


if __name__ == "__main__":
    main()
