#!/usr/bin/env python
"""Profile the UNet-64 bf16 train step and print the top device ops by time.

Parses the perfetto trace that jax.profiler writes (works on axon, r1-proven)
and aggregates op durations so the perf work targets measured hot spots.

Run: python benchmarks/bench_profile.py [--batch 16] [--steps 5]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_steps(batch: int, steps: int, log_dir: str, remat: bool = False):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps
    from unet_torch_tpu.utils.debug import profile_trace

    model = UNet(3, 3, 64, remat=remat, dtype=jnp.bfloat16)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 512, 512, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (batch, 512, 512)), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "CE", "CE", 3)
    key = jax.random.key(1)
    for _ in range(2):
        state, loss = step(state, x, y, 1e-3, key)
        float(loss)
    with profile_trace(log_dir):
        for _ in range(steps):
            state, loss = step(state, x, y, 1e-3, key)
        float(loss)


def parse_trace(log_dir: str, steps: int, top: int = 30):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", log_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # device-lane events carry run ids / op names; skip host python lanes
        name = ev.get("name", "")
        if not name or name.startswith(("$", "Thread", "process")):
            continue
        args = ev.get("args") or {}
        if "long_name" in args or "hlo_op" in args or True:
            pass
        dur = float(ev.get("dur", 0.0)) / 1e3  # us -> ms
        pid = ev.get("pid", 0)
        key = (pid, name)
        durs[key] += dur
        counts[key] += 1
    # keep the pid with the largest total (the device compute lane)
    by_pid = defaultdict(float)
    for (pid, name), d in durs.items():
        by_pid[pid] += d
    if not by_pid:
        print("empty trace")
        return
    device_pid = max(by_pid, key=by_pid.get)
    rows = [(d / steps, counts[(pid, n)], n) for (pid, n), d in durs.items()
            if pid == device_pid]
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"device lane pid={device_pid}: {total:.1f} ms/step total")
    for ms, cnt, name in rows[:top]:
        print(f"  {ms:8.3f} ms  x{cnt:<4d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--log-dir", default="")
    args = ap.parse_args()
    log_dir = args.log_dir or tempfile.mkdtemp(prefix="unet_prof_")
    run_steps(args.batch, args.steps, log_dir, remat=args.remat)
    parse_trace(log_dir, args.steps)


if __name__ == "__main__":
    main()
