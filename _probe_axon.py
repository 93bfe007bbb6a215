"""Probe: does per-call execution overhead on the axon TPU scale with
program SIZE (unrolled ops) independent of FLOPs? (scratch)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
x = jnp.ones((256, 25), jnp.int32)

def timeit(name, fn, *a):
    r = fn(*a); jax.block_until_ready(r)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); r = fn(*a); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:8.2f} ms", flush=True)

# small program, same work via fori_loop (8192 iterations)
@jax.jit
def rolled(x):
    def body(i, v):
        return (v * 3 + 1) & 0x7FFFFFFF
    return jax.lax.fori_loop(0, 8192, body, x)

# large program: 8192 unrolled ops
@jax.jit
def unrolled(x):
    v = x
    for i in range(8192):
        v = (v * 3 + (i & 7)) & 0x7FFFFFFF
    return v

# medium: 1024 unrolled
@jax.jit
def unrolled1k(x):
    v = x
    for i in range(1024):
        v = (v * 3 + (i & 7)) & 0x7FFFFFFF
    return v

timeit("rolled fori 8192", rolled, x)
timeit("unrolled 1024", unrolled1k, x)
t0 = time.time()
timeit("unrolled 8192", unrolled, x)
