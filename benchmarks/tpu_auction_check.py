#!/usr/bin/env python
"""Validate + time the whole-auction Pallas kernel on the real chip, then
time the full fused CLTR train step with it routed in."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unet_torch_tpu.kernels.auction import (
    auction_lsap,
    auction_lsap_pallas,
)

print("backend:", jax.default_backend(), flush=True)

B, Q, T = 96, 2000, 32
rng = np.random.RandomState(0)
costs = jnp.asarray(rng.rand(B, Q, T).astype(np.float32) * 4)
valid = np.ones((B, T), bool)
valid[7, 20:] = False
valid = jnp.asarray(valid)

ker = jax.jit(lambda c, v: auction_lsap_pallas(c, v))
ref = jax.jit(jax.vmap(auction_lsap))

o_k = np.asarray(ker(costs, valid))
o_r = np.asarray(ref(costs, valid))
cn = np.asarray(costs)
bad = 0
for b in range(B):
    n = int(np.asarray(valid)[b].sum())
    ck = sum(cn[b, o_k[b, j], j] for j in range(n))
    cr = sum(cn[b, o_r[b, j], j] for j in range(n))
    if abs(ck - cr) > 1e-2:
        bad += 1
        print(f"  instance {b}: kernel {ck:.4f} vs jnp {cr:.4f}")
print(f"cost agreement: {B - bad}/{B} instances", flush=True)

for name, fn in [("pallas", ker), ("jnp-vmap", ref)]:
    fn(costs, valid).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(costs, valid)
    out.block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

# full CLTR fused step
import bench

fn, state, args = bench._make_cltr_state(8, "bf16")
for _ in range(2):
    state, loss = fn(state, *args)
    float(loss)
t0 = time.perf_counter()
steps = 10
for _ in range(steps):
    state, loss = fn(state, *args)
float(loss)
dt = (time.perf_counter() - t0) / steps
print(f"cltr b8 step: {dt*1e3:.1f} ms -> {8/dt:.1f} img/s", flush=True)
