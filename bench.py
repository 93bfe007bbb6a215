#!/usr/bin/env python
"""Benchmark harness: Ristretto scalar-mul throughput per chip.

Runs the batched variable-base scalar-mul kernel (the hot op behind every
commitment/account/verifier path) on the default device (real TPU under the
driver), and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
measured against the driver-authored target of 1e6 scalar-muls/s/chip.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quisquis_tpu.ops import point as pt

    dev = jax.devices()[0]
    batch = int(os.environ.get("QQ_BENCH_BATCH", "8192"))

    rng = np.random.default_rng(42)
    # random scalars as nibble digits; random-ish points = multiples of B
    nibbles = jnp.asarray(rng.integers(0, 16, size=(batch, 64), dtype=np.int32))
    base = pt.basepoint((batch,))
    # give every lane a distinct point: P_i = (i+1)*B via one warm scalar_mul
    seed_sc = jnp.asarray(rng.integers(0, 16, size=(batch, 64), dtype=np.int32))
    points = pt.scalar_mul(seed_sc, base)
    jax.block_until_ready(points)

    f = jax.jit(pt.scalar_mul_raw)
    out = f(nibbles, points)  # compile
    jax.block_until_ready(out)

    iters = int(os.environ.get("QQ_BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(nibbles, points)
        # force full materialization each iteration: the experimental TPU
        # platform's block_until_ready can return before execution completes
        np.asarray(out.x[0, 0])
    t1 = time.perf_counter()

    per_sec = batch * iters / (t1 - t0)
    target = 1_000_000.0
    print(json.dumps({
        "metric": "ristretto_scalar_muls_per_sec_per_chip",
        "value": round(per_sec, 1),
        "unit": "scalar_muls/s",
        "vs_baseline": round(per_sec / target, 4),
    }))


if __name__ == "__main__":
    main()
