"""Profile trace/lower/compile of the device shuffle verifier (scratch)."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from quisquis_tpu.shuffle.device_verify import DeviceShuffleVerifier

m = int(sys.argv[1]) if len(sys.argv) > 1 else 3
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
dsv = DeviceShuffleVerifier(m=m, batch=B)
comp = jnp.zeros((B, dsv._npoints, 32), jnp.int32)
scal = jnp.zeros((B, dsv._nscalars, 32), jnp.int32)
weights = jnp.zeros((B, dsv.NCHECKS, 64), jnp.int32)
states = jnp.zeros((B, 200), jnp.int32)

t0 = time.time()
traced = jax.jit(dsv._build, static_argnums=4).trace(comp, scal, weights, states, (0, 0, 0))
t1 = time.time()
print(f"trace: {t1-t0:.1f}s", flush=True)
lowered = traced.lower()
t2 = time.time()
print(f"lower: {t2-t1:.1f}s", flush=True)
txt = lowered.as_text()
print(f"stablehlo: {len(txt)/1e6:.1f} MB, {txt.count(chr(10))/1e3:.0f}k lines, "
      f"{txt.count('func.func')} funcs, {txt.count('call @')} calls", flush=True)
t4 = time.time()
compiled = lowered.compile()
t5 = time.time()
print(f"compile: {t5-t4:.1f}s", flush=True)
