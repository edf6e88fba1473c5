#!/usr/bin/env python
"""Multitask batch-knee recheck after the r4 layout work."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

for b in (16,):
    fn, state, args = bench._make_multitask_state(b)
    for _ in range(2):
        state, loss = fn(state, *args)
        float(loss)
    t0 = time.perf_counter()
    steps = 10
    for _ in range(steps):
        state, loss = fn(state, *args)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    print(f"multitask b{b}: {dt*1e3:.1f} ms -> {b/dt:.1f} img/s", flush=True)
