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


def _warmup_and_trace(fn, state, args, steps: int, log_dir: str):
    """Shared warmup + profiled loop (float(loss) forces the axon sync)."""
    from unet_torch_tpu.utils.debug import profile_trace

    for _ in range(2):
        state, loss = fn(state, *args)
        float(loss)
    with profile_trace(log_dir):
        for _ in range(steps):
            state, loss = fn(state, *args)
        float(loss)


def run_steps(batch: int, steps: int, log_dir: str, remat: bool = False,
              fold: bool = False, model_name: str = "unet"):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    if model_name in ("cltr", "unet_bench", "transunet") and (remat or fold):
        # these builders pin their own remat/fold choices — a silently
        # ignored flag would mislabel the resulting profile
        raise SystemExit(f"--remat/--fold are ignored by --model "
                         f"{model_name}; drop them (the builder pins its "
                         f"own layout choices)")
    if model_name == "cltr":
        # reuse the bench builder so the profiled step is the bench step
        import bench

        fn, state, args = bench._make_cltr_state(batch)
        _warmup_and_trace(fn, state, args, steps, log_dir)
        return
    if model_name == "transunet":
        from unet_torch_tpu.models.transunet import build_transunet
        model = build_transunet("TransUnet", img_size=512, n_channels=3,
                                num_classes=3, dtype=jnp.bfloat16)
    elif model_name == "unet_bench":
        # the exact bench headline step (fold + fused planes head defaults)
        import bench

        fn, state, args = bench._make_unet_state(batch, jnp.bfloat16,
                                                 fused_head=True)
        _warmup_and_trace(fn, state, args, steps, log_dir)
        return
    else:
        model = UNet(3, 3, 64, remat=remat, fold=fold, dtype=jnp.bfloat16)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 512, 512, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (batch, 512, 512)), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "CE", "CE", 3)
    key = jax.random.key(1)
    _warmup_and_trace(step, state, (x, y, 1e-3, key), steps, log_dir)


def parse_trace(log_dir: str, steps: int, top: int = 40):
    """Aggregate device-lane op durations; events carry the optimized-HLO
    metadata (long_name with shapes/layouts, hlo_category, bytes_accessed,
    model_flops) so the report attributes time to categories and shapes."""
    import re

    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", log_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    meta = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        args = ev.get("args") or {}
        if not name or "long_name" not in args:
            continue
        durs[name] += float(ev.get("dur", 0.0)) / 1e3  # us -> ms
        counts[name] += 1
        meta[name] = args
    if not durs:
        print("no annotated device events found")
        return
    total = sum(durs.values()) / steps
    bycat = defaultdict(float)
    for n, d in durs.items():
        bycat[meta[n].get("hlo_category", "?")] += d / steps
    print(f"device total: {total:.1f} ms/step")
    for c, d in sorted(bycat.items(), key=lambda kv: -kv[1]):
        if d > 0.05:
            print(f"  {d:7.2f} ms  {c}")
    print()
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    for n, d in rows:
        a = meta[n]
        ms = d / steps
        gb = float(a.get("bytes_accessed", 0)) / 1e9
        gf = float(a.get("model_flops", 0)) / 1e9
        m = re.match(r"%\S+ = (\S+?)[ (]", a.get("long_name", ""))
        out = m.group(1)[:60] if m else "?"
        print(f"  {ms:7.3f} ms x{counts[n] // steps:<2d} "
              f"{a.get('hlo_category', '?')[:16]:<16} {gb:6.2f}GB "
              f"{gf:6.0f}GF  {n[:24]:<24} {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fold", action="store_true")
    ap.add_argument("--model", default="unet",
                    choices=["unet", "unet_bench", "transunet", "cltr"])
    ap.add_argument("--log-dir", default="")
    args = ap.parse_args()
    log_dir = args.log_dir or tempfile.mkdtemp(prefix="unet_prof_")
    run_steps(args.batch, args.steps, log_dir, remat=args.remat,
              fold=args.fold, model_name=args.model)
    parse_trace(log_dir, args.steps)


if __name__ == "__main__":
    main()
