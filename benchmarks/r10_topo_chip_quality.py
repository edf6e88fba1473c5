#!/usr/bin/env python
"""r10: topo pairing-policy quality A/B at REPRESENTATIVE scale, on chip.

The 64^2 CPU fixture amplifies both mitigation knobs into caricature:
its blobs are ~3-6 px (2x pooled pairing merges/speckles them — ds2 MRE
1.13) and its epochs are 8 steps (depth-2 pairing indices are 1/4-epoch
stale — MRE 0.107 -> 0.136).  Production images are 512^2 with cells an
order of magnitude larger relative to the pooling cell, and epochs are
hundreds of steps.  This experiment re-measures the same arms at 256^2
with 20 cells/img (r 3-6 px, same absolute size as the fixture but 16x
the area) and 16 steps/epoch, trained END-TO-END ON THE REAL TPU through
the production two-phase host-pairing path (train/steps.py).

Arms (x3 seeds): dice_bce-only control, serial ds1 (exact reference
semantics), piped-d2 ds1 (current trainer default), serial ds2,
piped-d2 ds2, piped-d1 ds2 (the throughput winner if quality holds —
R10_TOPO_DS_AB.json measured ds2 at 68 img/s vs 20 at ds1).

Metric: component-count MRE on 32 held-out images (cv2
connectedComponents at 0.5, the MRAccuracy convention, loss.py:422-440).
Writes benchmarks/R10_TOPO_CHIP_QUALITY.json incrementally.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
N_TRAIN, N_VAL = 128, 32
N_CELLS = 20
BATCH = 8
BASE = 16
EPOCHS = 30
WARM_EPOCHS = 5
LR = 1e-3
SEEDS = 3

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R10_TOPO_CHIP_QUALITY.json")


def make_data():
    from unet_torch_tpu.data.synthetic import make_blob_sample

    rng = np.random.RandomState(0)
    xs, ys, ds = [], [], []
    for _ in range(N_TRAIN + N_VAL):
        img, mask, dots, _ = make_blob_sample(rng, SIZE, N_CELLS, 3)
        im = (img.astype(np.float64) - img.mean((0, 1))) / img.std((0, 1))
        xs.append(im.astype(np.float32))
        ys.append((mask > 0).astype(np.float32))
        ds.append(dots.astype(np.float32))
    xs, ys, ds = np.stack(xs), np.stack(ys), np.stack(ds)
    return ((xs[:N_TRAIN], ys[:N_TRAIN], ds[:N_TRAIN]),
            (xs[N_TRAIN:], ys[N_TRAIN:], ds[N_TRAIN:]))


def run_arm(train, val, seed, use_topo, pair_downsample=1, pipeline_depth=0):
    import cv2

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_topo_steps

    (xs, ys, dots), (vx, vy, vdots) = train, val
    model = UNet(3, 1, BASE)
    tx = make_optimizer("Adam", LR, 1e-4)
    variables = model.init(jax.random.key(seed), jnp.asarray(xs[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    (warm_step, _), (topo_step, _), TopoPipeline = make_topo_steps(
        model, tx, "TopoLoss", 1, pair_downsample=pair_downsample)
    rng = np.random.RandomState(seed)
    key = jax.random.key(seed + 1)
    warm = WARM_EPOCHS if use_topo else EPOCHS
    for ep in range(1, EPOCHS + 1):
        perm = rng.permutation(len(xs))
        pipe = (TopoPipeline(depth=pipeline_depth)
                if pipeline_depth and ep > warm else None)
        for i in range(0, len(xs), BATCH):
            idx = perm[i:i + BATCH]
            bx = jnp.asarray(xs[idx])
            by = jnp.asarray(ys[idx])
            bd = jnp.asarray(dots[idx])
            key, sub = jax.random.split(key)
            if ep <= warm:
                state, _ = warm_step(state, bx, by, bd, LR, sub)
            elif pipe is not None:
                state, _ = pipe.step(state, bx, by, bd, LR, sub)
            else:
                state, _ = topo_step(state, bx, by, bd, LR, sub)
        if pipe is not None:
            state, _ = pipe.flush(state)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    vars_final = {"params": state.params, "batch_stats": state.batch_stats}
    mres = []
    for i in range(0, len(vx), BATCH):
        out = np.asarray(fwd(vars_final, jnp.asarray(vx[i:i + BATCH])),
                         np.float32)
        prob = 1.0 / (1.0 + np.exp(-out[..., 0]))
        for p, d in zip(prob, vdots[i:i + BATCH]):
            n_pred = cv2.connectedComponents((p > 0.5).astype(np.uint8))[0] - 1
            n_gt = float(d.sum())
            mres.append(abs(n_pred - n_gt) / max(n_gt, 1.0))
    return float(np.mean(mres))


ARMS = [
    ("dice_bce_only", dict(use_topo=False)),
    ("serial_ds1", dict(use_topo=True)),
    ("piped_d2_ds1", dict(use_topo=True, pipeline_depth=2)),
    ("serial_ds2", dict(use_topo=True, pair_downsample=2)),
    ("piped_d2_ds2", dict(use_topo=True, pair_downsample=2,
                          pipeline_depth=2)),
    ("piped_d1_ds2", dict(use_topo=True, pair_downsample=2,
                          pipeline_depth=1)),
]


def main():
    train, val = make_data()
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name, kw in ARMS:
        if name in results:
            continue
        vals = []
        for s in range(SEEDS):
            vals.append(round(run_arm(train, val, s, **kw), 4))
            print(f"{name} seed {s}: MRE {vals[-1]:.4f}", flush=True)
        results[name] = {"mre_mean": round(float(np.mean(vals)), 4),
                         "per_seed": vals}
        results["protocol"] = {
            "size": SIZE, "n_cells": N_CELLS, "n_train": N_TRAIN,
            "n_val": N_VAL, "batch": BATCH, "base": BASE,
            "epochs": EPOCHS, "warm_epochs": WARM_EPOCHS, "lr": LR,
            "seeds": SEEDS,
            "backend": "axon TPU (production two-phase host pairing)"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"== {name}: {results[name]['mre_mean']:.4f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
