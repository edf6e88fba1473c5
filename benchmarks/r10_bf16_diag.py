#!/usr/bin/env python
"""r10 (VERDICT r4 item 1a): bf16 quality hardening on the mc fixture.

Reruns the PARITY_SUITE `bf16_vs_f32` experiment at 12 seeds (vs the r4
6-seed entry whose "within 1 sigma" sign-off leaned on one outlier seed,
per_seed_bf16[3] = 0.5674) and records a per-epoch val-dice curve for every
run so an outlier's divergence point is visible (loss spike vs steady gap).

Protocol is IDENTICAL to parity_suite.mc_ours (base 8, 64^2, 32 train /
48 val, batch 4, lr 1e-3, Adam wd 1e-4, 80 epochs): same data, same rng
stream (mid-training eval uses train=False apply which consumes no rng and
mutates no state), so the final dice matches what mc_ours would return.

Optional ladder arm (only meaningful if the 12-seed gap held — it did
not, so this stayed unused):
  f32_outc   final 1x1 conv in f32, everything else bf16

Writes benchmarks/R10_BF16_DIAG.json and refreshes the `bf16_vs_f32`
entry of benchmarks/PARITY_SUITE.json (per-seed lists + protocol).

Run (CPU): python benchmarks/r10_bf16_diag.py [--seeds 12] [--arms float32,bfloat16,f32_outc]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from parity_dice import dice_multiclass, make_data  # noqa: E402

EVAL_EVERY = 4


def mc_ours_curve(train, val, epochs, base, lr, batch, seed, dtype,
                  head_dtype=None):
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    (xs, ys), (vx, vy) = train, val
    kw = {}
    if head_dtype is not None:
        kw["head_dtype"] = (jnp.float32 if head_dtype == "float32"
                            else jnp.bfloat16)
    model = UNet(3, 3, base,
                 dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
                 **kw)
    tx = make_optimizer("Adam", lr, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "dice_bce_mc", "dice_bce_mc", 3)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    vx_j = jnp.asarray(vx)

    def val_dice():
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          vx_j, train=False)
        pred = np.argmax(np.asarray(out, np.float32), axis=-1)
        return dice_multiclass(pred, vy, 3)

    curve = []
    train_losses = []
    for ep in range(1, epochs + 1):
        perm = rng.permutation(len(xs))
        ep_losses = []
        for i in range(0, len(xs), batch):
            idx = perm[i:i + batch]
            key, sub = jax.random.split(key)
            state, loss = step(state, jnp.asarray(xs[idx]),
                               jnp.asarray(ys[idx], jnp.float32), lr, sub)
            ep_losses.append(float(loss))
        train_losses.append(round(float(np.mean(ep_losses)), 4))
        if ep % EVAL_EVERY == 0 or ep == epochs:
            curve.append((ep, round(val_dice(), 4)))
    return curve[-1][1], curve, train_losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--base", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--arms", default="float32,bfloat16",
                    help="comma list: float32, bfloat16, f32_outc")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    train, val = make_data(n_train=32, n_val=48)
    out_path = os.path.join(HERE, "R10_BF16_DIAG.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    ARMS = {
        "float32": dict(dtype="float32"),
        "bfloat16": dict(dtype="bfloat16"),
        "f32_outc": dict(dtype="bfloat16", head_dtype="float32"),
    }

    for arm in args.arms.split(","):
        kw = ARMS[arm]
        finals, curves, tls = [], [], []
        for s in range(args.seeds):
            final, curve, tl = mc_ours_curve(
                train, val, args.epochs, args.base, args.lr, args.batch,
                s, **kw)
            finals.append(final)
            curves.append(curve)
            tls.append(tl)
            print(f"{arm} seed {s}: final dice {final:.4f}", flush=True)
        results[arm] = {
            "final_mean": round(float(np.mean(finals)), 4),
            "final_std": round(float(np.std(finals)), 4),
            "per_seed_final": finals,
            "curves": curves,
            "train_loss_per_epoch": tls,
            "protocol": {"seeds": args.seeds, "epochs": args.epochs,
                         "base": args.base, "lr": args.lr,
                         "batch": args.batch, "size": 64,
                         "n_train": 32, "n_val": 48,
                         "eval_every": EVAL_EVERY}}
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # refresh the canonical PARITY_SUITE entry when both default arms ran
    if "float32" in results and "bfloat16" in results:
        ps_path = os.path.join(HERE, "PARITY_SUITE.json")
        with open(ps_path) as f:
            suite = json.load(f)
        f32 = results["float32"]["per_seed_final"]
        bf16 = results["bfloat16"]["per_seed_final"]
        suite["bf16_vs_f32"] = {
            "f32_dice": round(float(np.mean(f32)), 4),
            "bf16_dice": round(float(np.mean(bf16)), 4),
            "abs_gap": round(abs(float(np.mean(f32)) -
                                 float(np.mean(bf16))), 4),
            "f32_std": round(float(np.std(f32)), 4),
            "bf16_std": round(float(np.std(bf16)), 4),
            "per_seed_f32": f32,
            "per_seed_bf16": bf16,
            "note": "r10 12-seed rerun (r4's 6-seed entry hinged on one "
                    "outlier); per-epoch curves in R10_BF16_DIAG.json",
            "protocol": results["bfloat16"]["protocol"]}
        with open(ps_path, "w") as f:
            json.dump(suite, f, indent=2)
        print("PARITY_SUITE bf16_vs_f32 refreshed:",
              json.dumps({k: suite["bf16_vs_f32"][k] for k in
                          ("f32_dice", "bf16_dice", "abs_gap")}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
