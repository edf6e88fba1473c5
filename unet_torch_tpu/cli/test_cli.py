"""Standalone evaluation CLI.

The reference's evaluation entry points are edit-the-constants `main()`s with
hardcoded user paths (test.py:467-509, test_mc3serousv5.py:1347-1386,
test_reg3serousv5mt.py:637-675 — SURVEY §4).  This CLI supplies the same
capability reproducibly:

    python test.py <config.yml> --checkpoint run/seedN/models/best.pt \
        [--test-path DIR] [--mode auto|single|single_crop|single_mc|reg|mt_reg]

Loads the config's model, restores the checkpoint, and runs the matching eval
suite into <save_dir>/eval/.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from unet_torch_tpu import ckpt
from unet_torch_tpu.cli.config import Config
from unet_torch_tpu.cli.train_cli import build_datasets_and_model
from unet_torch_tpu.core.mesh import make_mesh
from unet_torch_tpu.data.io import get_image_list
import unet_torch_tpu.losses as losses


class _EvalShim:
    """Minimal trainer-like holder for eval.reports.make_predict_fn."""

    def __init__(self, model, state):
        self.model = model
        self.state = state


def _auto_mode(model_type: str) -> str:
    if model_type in ("attention", "single", "TransUnet"):
        return "single_mc"
    if model_type in ("multi_task_regTU", "multi_task_reg"):
        return "mt_reg"
    if model_type in ("regression", "regression_t"):
        return "reg"
    raise ValueError(f"No eval mode for model_type {model_type!r}")


def run_eval(cfg: Config, checkpoint: str, test_path=None, mode="auto",
             out_dir=None, crop_size=256):
    from flax import serialization

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.eval import reports
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState

    losses.set_class_number(cfg.model.num_class)
    _train_ds, _val_ds, model = build_datasets_and_model(
        cfg, cfg.train.seeds[0])
    input_size = tuple(cfg.model.input_size)

    x = jnp.zeros((1, *input_size,
                   3 if cfg.model.channel in (3, -2) else 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    payload = ckpt.load_weights(checkpoint)
    state = ckpt.restore_into(state, payload)
    shim = _EvalShim(model, state)

    paths = test_path or (cfg.dataset.test_path[0]
                          if cfg.dataset.test_path else None)
    if not paths:
        raise ValueError("No test path given (config test_path empty)")
    image_list = get_image_list(paths)
    out_dir = out_dir or os.path.join(cfg.dataset.save_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)

    if mode == "auto":
        mode = _auto_mode(cfg.model.model_type)
    args = (shim, input_size, cfg.model.channel, cfg.model.num_class,
            image_list, out_dir)
    if mode == "single_mc":
        results = reports.test_single_mc(*args)
    elif mode == "single":
        results = reports.test_single(*args)
    elif mode == "single_crop":
        results = reports.test_single_crop(shim, input_size,
                                           cfg.model.channel,
                                           cfg.model.num_class, crop_size,
                                           image_list, out_dir)
    elif mode == "reg":
        results = reports.test_single_reg(*args)
    elif mode == "mt_reg":
        results = reports.test_multiple_reg(*args)
    else:
        raise ValueError(f"Unknown mode {mode!r}")
    print(results)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--test-path", default=None)
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "single", "single_crop", "single_mc",
                             "reg", "mt_reg"])
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--crop-size", type=int, default=256)
    args = ap.parse_args(argv)
    cfg = Config.load(args.config)
    run_eval(cfg, args.checkpoint, args.test_path, args.mode, args.out_dir,
             args.crop_size)


if __name__ == "__main__":
    main()
