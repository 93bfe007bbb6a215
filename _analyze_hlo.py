"""Parse StableHLO text, compute post-inline expanded op counts (scratch)."""
import os, sys, time, re, collections
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from quisquis_tpu.shuffle.device_verify import DeviceShuffleVerifier

m, B = 3, 2
dsv = DeviceShuffleVerifier(m=m, batch=B)
comp = jnp.zeros((B, dsv._npoints, 32), jnp.int32)
scal = jnp.zeros((B, dsv._nscalars, 32), jnp.int32)
weights = jnp.zeros((B, dsv.NCHECKS, 64), jnp.int32)
states = jnp.zeros((B, 200), jnp.int32)
txt = jax.jit(dsv._build, static_argnums=4).trace(comp, scal, weights, states, (0, 0, 0)).lower().as_text()

# parse funcs
funcs = {}   # name -> (own_ops, [callee names])
cur = None
own = 0
callees = []
for line in txt.splitlines():
    s = line.strip()
    mfn = re.match(r'func.func (?:public |private )?@([\w.\-]+)', s)
    if mfn:
        if cur: funcs[cur] = (own, callees)
        cur, own, callees = mfn.group(1), 0, []
        continue
    if s.startswith('}') and cur and s == '}':
        continue
    if '= stablehlo.' in s or s.startswith('stablehlo.'):
        own += 1
    mc = re.search(r'call @([\w.\-]+)', s)
    if mc:
        callees.append(mc.group(1))
if cur: funcs[cur] = (own, callees)

# bottom-up expanded size
expanded = {}
def exp(f, stack=()):
    if f in expanded: return expanded[f]
    if f not in funcs: return 1
    if f in stack: return 0
    own, cals = funcs[f]
    tot = own + sum(exp(c, stack + (f,)) for c in cals)
    expanded[f] = tot
    return tot

sys.setrecursionlimit(100000)
cands = [f for f in funcs if "main" in f]; print("main candidates:", cands[:5]); main = cands[0]
total = exp(main)
print(f"funcs: {len(funcs)}, total expanded ops from main: {total/1e6:.2f}M")

# attribute: for each func, (number of times reached) x size. Compute reach counts.
reach = collections.Counter({main: 1})
order = []
seen = set()
def topo(f):
    if f in seen or f not in funcs: return
    seen.add(f)
    for c in funcs[f][1]:
        topo(c)
    order.append(f)
topo(main)
for f in reversed(order):
    n = reach[f]
    if n == 0: continue
    for c in funcs[f][1]:
        reach[c] += n

rows = []
for f, (own, cals) in funcs.items():
    rows.append((reach[f] * own, reach[f], own, f))
rows.sort(reverse=True)
print("\ntop 25 by (times-reached x own-ops):")
for tot, r, own, f in rows[:25]:
    print(f"  {tot/1e3:9.1f}k  reached={r:6d} own={own:5d}  {f}")
