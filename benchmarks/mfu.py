#!/usr/bin/env python
"""Per-family model-FLOPs / MFU accounting (VERDICT r2 item 1).

For every bench config this lowers the exact jitted train/infer step the
bench times, reads XLA's compiled cost analysis (flops), optionally measures
step time on the real chip, and emits TF/s + % of bf16 peak.

Caveats, stated so the numbers are honest:
- XLA `cost_analysis()["flops"]` counts the flops of the optimized HLO —
  including the 2x dense-fold flops of the W-folded UNet layout and any
  remat recomputation — so this is *achieved* flops, not minimal model
  flops.  BASELINE.md quotes both where they differ.
- Peak used: TPU v5e 197 TFLOP/s bf16 (f32 configs are still normalized to
  the bf16 peak — the MXU is the same silicon; an f32 row's MFU reads low by
  construction and says so).

Run: python benchmarks/mfu.py [--no-time]  (JSON to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

V5E_BF16_PEAK = 197e12


def _flops_of(fn, state, args):
    """Returns (xla_flops, kernel_flops): XLA's compiled cost analysis plus
    the trace-time analytic tally of matmul flops inside Pallas kernels
    (kernels/accounting.py) — cost_analysis cannot see into custom calls, so
    without the tally the attention-in-kernel families under-report."""
    import jax

    from unet_torch_tpu.kernels.accounting import count_kernel_flops

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn, donate_argnums=0)
    with count_kernel_flops() as tally:
        lowered = jitted.lower(state, *args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", float("nan"))), sum(tally.values())


def _time_step(fn, state, args, steps):
    for _ in range(2):
        state, loss = fn(state, *args)
        float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = fn(state, *args)
    float(loss)
    return (time.perf_counter() - t0) / steps


def _infer_builder(make_model):
    """Variables as a jit ARGUMENT (closed-over params serialize into the
    HLO — HTTP 413 on TransUnet-size models through the axon tunnel, and
    measured ~27% slower steady-state; bench.py::tpu_unet_infer)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_torch_tpu.eval.metrics import class_argmax

    model, batch = make_model()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, bench.SIZE, bench.SIZE, bench.CHANNELS),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)

    @jax.jit
    def predict(variables, x):
        out = model.apply(variables, x, train=False)
        return class_argmax(out)

    return predict, variables, x, batch


def main():
    do_time = "--no-time" not in sys.argv
    out = {}

    def add_train(name, builder, batch, steps=10):
        print(f"=== {name}", file=sys.stderr, flush=True)
        fn, state, args = builder()
        xla_flops, kern_flops = _flops_of(fn, state, args)
        flops = xla_flops + kern_flops
        row = {"batch": batch, "step_gflops": round(flops / 1e9, 1),
               "kernel_gflops": round(kern_flops / 1e9, 1)}
        if do_time:
            dt = _time_step(fn, state, args, steps)
            row["ms_per_step"] = round(dt * 1e3, 1)
            row["img_per_sec"] = round(batch / dt, 1)
            row["tf_per_sec"] = round(flops / dt / 1e12, 1)
            row["mfu_vs_bf16_peak"] = round(flops / dt / V5E_BF16_PEAK, 3)
        out[name] = row
        print(f"  {row}", file=sys.stderr, flush=True)

    import jax.numpy as jnp

    add_train("unet64_512px_bf16_b16",
              lambda: bench._make_unet_state(16, jnp.bfloat16), 16)
    add_train("unet64_512px_f32_b8",
              lambda: bench._make_unet_state(8, jnp.float32), 8)
    add_train("unet64_512px_bf16_b16_dice_bce_mc",
              lambda: bench._make_unet_state(16, jnp.bfloat16,
                                             loss="dice_bce_mc"), 16)
    add_train("multitask_unet64_512px_bf16_b8",
              lambda: bench._make_multitask_state(8), 8)
    add_train("transunet_r50vitb16_512px_bf16_b8",
              lambda: bench._make_transunet_state(8), 8)
    # b8 to match the committed MFU.json / BASELINE.md row (the bench suite's
    # throughput entry runs b16, but the MFU ledger was measured at b8)
    add_train("cltr_2000q_256px_bf16_b8_fused",
              lambda: bench._make_cltr_state(8, "bf16"), 8)

    # inference rows
    import jax

    def _make_transunet():
        from unet_torch_tpu.models.transunet import build_transunet

        return build_transunet("TransUnet", img_size=bench.SIZE,
                               n_channels=bench.CHANNELS,
                               num_classes=bench.N_CLASSES,
                               dtype=jnp.bfloat16), 16

    for name, make in [
        ("unet64_512px_bf16_b16_infer", lambda: (
            __import__("unet_torch_tpu.models.unet",
                       fromlist=["UNet"]).UNet(
                bench.CHANNELS, bench.N_CLASSES, 64, fold=True,
                dtype=jnp.bfloat16), 16)),
        ("transunet_r50vitb16_512px_bf16_b16_infer", _make_transunet),
    ]:
        print(f"=== {name}", file=sys.stderr, flush=True)
        from unet_torch_tpu.kernels.accounting import count_kernel_flops

        predict, variables, x, batch = _infer_builder(make)
        with count_kernel_flops() as tally:
            lowered = predict.lower(variables, x)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan"))) + sum(tally.values())
        row = {"batch": batch, "step_gflops": round(flops / 1e9, 1),
               "kernel_gflops": round(sum(tally.values()) / 1e9, 1)}
        if do_time:
            import numpy as np

            np.asarray(predict(variables, x))
            t0 = time.perf_counter()
            for _ in range(10):
                pred = predict(variables, x)
            np.asarray(pred)
            dt = (time.perf_counter() - t0) / 10
            row["ms_per_step"] = round(dt * 1e3, 1)
            row["img_per_sec"] = round(batch / dt, 1)
            row["tf_per_sec"] = round(flops / dt / 1e12, 1)
            row["mfu_vs_bf16_peak"] = round(flops / dt / V5E_BF16_PEAK, 3)
        out[name] = row
        print(f"  {row}", file=sys.stderr, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
