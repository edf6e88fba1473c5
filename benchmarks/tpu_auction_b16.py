#!/usr/bin/env python
"""Time the fused CLTR step at b16/b32 with the Pallas auction routed in."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench

for b in (16, 32):
    fn, state, args = bench._make_cltr_state(b, "bf16")
    for _ in range(2):
        state, loss = fn(state, *args)
        float(loss)
    t0 = time.perf_counter()
    steps = 10
    for _ in range(steps):
        state, loss = fn(state, *args)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    print(f"cltr b{b} step: {dt*1e3:.1f} ms -> {b/dt:.1f} img/s", flush=True)
