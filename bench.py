#!/usr/bin/env python
"""Benchmark: UNet-64 512x512 segmentation training throughput on one TPU chip
vs the PyTorch reference on CPU (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The PyTorch-CPU baseline is measured once by importing the reference's own
Model.py from /root/reference (run, not copied) and timed on identical shapes;
the result is cached in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import time

BATCH = 16
SIZE = 512
N_CLASSES = 3
CHANNELS = 3
STEPS = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_MEASURED.json")


def measure_torch_cpu_baseline(steps: int = 2, batch: int = 2) -> float:
    """images/sec of the reference UNet training step on CPU torch."""
    import sys
    import types

    import numpy as np
    import torch

    # Model.py imports torchvision but never uses it; the module is absent in
    # this image, so satisfy the import with an empty stub.
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, "/root/reference")
    from Model import UNet as TorchUNet  # reference model, executed in place

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    model = TorchUNet(CHANNELS, N_CLASSES, 64, usa_cuda=False)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    ce = torch.nn.CrossEntropyLoss()
    x = torch.randn(batch, CHANNELS, SIZE, SIZE)
    y = torch.randint(0, N_CLASSES, (batch, SIZE, SIZE))

    # one warmup step
    opt.zero_grad()
    ce(model(x), y).backward()
    opt.step()

    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = ce(model(x), y)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return steps * batch / dt


def get_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_img_per_sec"]
    ips = measure_torch_cpu_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_img_per_sec": ips,
                   "config": {"batch": 2, "size": SIZE,
                              "model": "UNet-64", "loss": "CE"}}, f)
    return ips


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    # bf16 compute / f32 params+stats: the MXU-native mixed-precision policy
    model = UNet(n_channels=CHANNELS, n_classes=N_CLASSES, base=64,
                 dtype=jnp.bfloat16)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BATCH, SIZE, SIZE, CHANNELS), jnp.float32)
    y = jnp.asarray(rng.randint(0, N_CLASSES, (BATCH, SIZE, SIZE)),
                    jnp.float32)

    variables = model.init(jax.random.key(0), x[:1], train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    train_step, _ = make_single_steps(model, tx, "CE", "CE", N_CLASSES)

    key = jax.random.key(1)
    # warmup/compile (two calls: the donated-buffer path can retrace once)
    for _ in range(2):
        state, loss = train_step(state, x, y, 1e-3, key)
        float(loss)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = train_step(state, x, y, 1e-3, key)
    # NB: float() forces a real device sync through the donation chain;
    # block_until_ready alone does not flush the axon tunnel's async queue.
    float(loss)
    dt = time.perf_counter() - t0
    return STEPS * BATCH / dt


def main():
    baseline = get_baseline()
    tpu_ips = measure_tpu()
    print(json.dumps({
        "metric": f"unet64_{SIZE}px_bf16_train_images_per_sec_per_chip",
        "value": round(tpu_ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(tpu_ips / baseline, 3),
    }))


if __name__ == "__main__":
    main()
