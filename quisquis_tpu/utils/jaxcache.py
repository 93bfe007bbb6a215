"""One shared persistent XLA compilation cache for every entry point.

Per-shape compilation of the one-program device verifiers/provers costs
minutes on a real chip (measured round 3/4: ~508 s cold for
``DeviceShuffleVerifier(m=8, batch=16)``, ~424 s for
``DeviceRangeVerifier(n=64, m=1, batch=256)``). This module is the
single switch:

- :func:`enable_persistent_cache` points the process at ONE cache
  directory (``$QQ_JAX_CACHE``, else ``<repo>/.jax_cache`` in a checkout,
  else ``~/.cache/quisquis_tpu/jax``). Tests, ``benchmarks.py``, the CLI
  and the serving services all call it, so they share executables.
- The device dispatcher classes expose ``warmup()`` (compile a shape
  bucket up front on zero-filled inputs); :func:`warmup` here drives them
  from a list of shape descriptors so a service can pre-compile at start.

What the cache does and does NOT buy (measured round 5,
tools/cache_probe.py): the cache key is deterministic and HITS across
processes — a hit skips the XLA compile itself. On this rig's PJRT
tunnel, a fresh process still pays re-tracing (~1 min), executable
deserialization (~2 min) and first-execution finalization (~4 min) per
heavy shape, so ``warmup()`` makes FIRST REQUESTS fast only within the
process that ran it. A deployment that needs fresh processes served
warm runs ONE resident ``quisquis_tpu.daemon`` process (it calls
:func:`warmup` at start) and connects thin clients to it.

The reference has no analog (single-process Rust, no JIT); this is pure
TPU-deployment infrastructure.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence, Tuple

_ENV = "QQ_JAX_CACHE"
_enabled_dir: str | None = None


def default_cache_dir() -> str:
    """Resolve the shared cache directory (see module docstring)."""
    env = os.environ.get(_ENV)
    if env:
        return env
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg)
    if os.path.exists(os.path.join(repo, "pyproject.toml")):
        return os.path.join(repo, ".jax_cache")
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "quisquis_tpu", "jax")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable jax's persistent compilation cache at the shared directory.

    Idempotent; safe to call before or after jax initializes a backend.
    Returns the directory in use.
    """
    global _enabled_dir
    import jax

    if cache_dir is None:
        # partition by active backend: XLA:CPU AOT executables record the
        # compiling process's machine-feature set, and a TPU-plugin
        # process emits CPU artifacts with a different flavor
        # (+prefer-no-gather/-scatter) than a pure-CPU process — loading
        # across that boundary warns "could lead to SIGILL". Separate
        # subdirectories make every process read only its own flavor.
        cache_dir = os.path.join(default_cache_dir(),
                                 jax.default_backend())
    if _enabled_dir == cache_dir:
        return cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the device-verifier executables are the whole point of the cache:
    # cache everything that took real compile time, regardless of size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = cache_dir
    return cache_dir


#: shape descriptors accepted by :func:`warmup`:
#:   ("shuffle", m, batch)            — DeviceShuffleVerifier
#:   ("range", n, m, batch)           — DeviceRangeVerifier
#:   ("range-prove", n, m, batch)     — DeviceRangeProver
#:   ("shuffle-prove", m, batch)      — DeviceShuffleProver
ShapeDesc = Tuple


def warmup(shapes: Iterable[ShapeDesc], verbose: bool = False) -> None:
    """Compile device dispatcher programs for the given shape buckets.

    After ``warmup``, the first real request on each listed shape IN THIS
    PROCESS runs at steady-state latency. It does not make other
    processes fast (see the module docstring); run warmup inside the
    resident ``quisquis_tpu.daemon`` for that.
    """
    import time

    enable_persistent_cache()
    for desc in shapes:
        kind = desc[0]
        t0 = time.time()
        if kind == "shuffle":
            from ..shuffle.device_verify import get_device_shuffle_verifier

            get_device_shuffle_verifier(desc[1], desc[2]).warmup()
        elif kind == "range":
            from ..bulletproofs.device_verify import get_device_range_verifier

            get_device_range_verifier(desc[1], desc[2], desc[3]).warmup()
        elif kind == "range-prove":
            from ..bulletproofs.device_prove import get_device_range_prover

            get_device_range_prover(desc[1], desc[2], desc[3]).warmup()
        elif kind == "shuffle-prove":
            from ..shuffle.device_prove import get_device_shuffle_prover

            get_device_shuffle_prover(desc[1], desc[2]).warmup()
        else:
            raise ValueError(f"unknown warmup shape kind {kind!r}")
        if verbose:
            print(f"warmup {desc}: {time.time() - t0:.1f}s", flush=True)
