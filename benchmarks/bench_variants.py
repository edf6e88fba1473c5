#!/usr/bin/env python
"""A/B step-time bench for the level-1 perf experiments (pool VJP, convT VJP,
W-folded level 1).  Each variant monkeypatches the implementation switch and
times the full UNet-64 bf16 b16 train step on the real chip.

Run: python benchmarks/bench_variants.py v_old v_pool v_convt v_fold
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_torch_tpu.nn import blocks  # noqa: E402


_DEFAULT_POOL = blocks._max_pool_2x2_eq      # reshape-max default
_ARGMAX_POOL = blocks._max_pool_2x2_argmax   # custom-VJP experiment
_DEFAULT_UP_CONVT = blocks.up_conv_transpose


def _vjp_up_convt(features, dtype):
    """Up upsample via the reverse-free custom-VJP TorchConvTranspose2x2
    (same inits as the default factory)."""
    return blocks.TorchConvTranspose2x2(
        features, dtype=dtype, kernel_init=blocks.torch_convt_kernel_init,
        bias_init=blocks.torch_uniform_init(features * 4))


def configure(variant: str) -> bool:
    """Returns fold flag; patches blocks in place.  v_pool swaps the Down
    max-pool for the argmax custom VJP; v_convt swaps Up's upsample module
    for the custom-VJP ConvTranspose (Up routes through up_conv_transpose
    precisely so this patch measures what the model runs)."""
    blocks.max_pool_2x2 = (_ARGMAX_POOL if variant == "v_pool"
                           else _DEFAULT_POOL)
    blocks.up_conv_transpose = (_vjp_up_convt if variant == "v_convt"
                                else _DEFAULT_UP_CONVT)
    return variant == "v_fold"


def run(variant: str, batch=16, steps=20):
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    fold = configure(variant)
    model = UNet(3, 3, 64, dtype=jnp.bfloat16, fold=fold)
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
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, x, y, 1e-3, key)
    float(loss)
    dt = time.perf_counter() - t0
    return steps * batch / dt, dt / steps * 1e3


def main():
    variants = sys.argv[1:] or ["v_old", "v_pool", "v_convt", "v_fold"]
    out = {}
    for v in variants:
        print(f"=== {v} ...", file=sys.stderr, flush=True)
        ips, ms = run(v)
        out[v] = {"img_per_sec": round(ips, 2), "ms_per_step": round(ms, 2)}
        print(f"  {v}: {ips:.2f} img/s ({ms:.1f} ms/step)", file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
