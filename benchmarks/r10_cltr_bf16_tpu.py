#!/usr/bin/env python
"""r10 (VERDICT r4 item 1b): CLTR bf16-vs-f32 trained outcome at >=6 seeds.

Reuses parity_cltr_detect's data/model/protocol verbatim (48^2 easy point
data, thin (1,1,1,1) backbone, 16 queries, checkpoints 50/150/300/600,
lr 1e-4 clip 0.1) but runs BOTH ours arms on the real TPU: the CPU run
paces at ~2.5 h/arm on this contended 1-vCPU host (6 seeds x 2 arms
~= 30 h), while the TPU step is dispatch-bound at ~ms scale.  The arms
are ours-only (torch_final_mae stays from the r4 CPU record), so backend
choice only affects wall-clock; trajectory chaos makes per-seed values
backend-sensitive, but the bf16-vs-f32 comparison is within-backend,
seed-matched — the same logic as every PARITY_SUITE experiment.

Writes benchmarks/PARITY_CLTR_BF16.json (same shape as the r4 file, 6
seeds) incrementally per seed.
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from parity_cltr_detect import (  # noqa: E402
    CLIP,
    SMALL,
    BATCH,
    N_TRAIN,
    N_VAL,
    SIZE,
    make_easy_point_data,
    run_ours,
)

OUT = os.path.join(HERE, "PARITY_CLTR_BF16.json")
CHECKPOINTS = [50, 150, 300, 600]
SEEDS = 6
LR = 1e-4


def main():
    runs = []
    for s in range(SEEDS):
        tr, va = make_easy_point_data(s)
        baseline = float(np.mean([len(t["labels"]) for t in va[1]]))
        print(f"seed {s}: no-detection baseline MAE {baseline:.3f}",
              flush=True)
        row = {"seed": s, "baseline_mae": round(baseline, 3)}
        row["ours"] = run_ours(tr, va, CHECKPOINTS, LR, s)
        row["ours_bf16"] = run_ours(tr, va, CHECKPOINTS, LR, s,
                                    precision="bf16")
        runs.append(row)

        def _final(arm):
            vals = [r[arm][CHECKPOINTS[-1]]["count_mae"]
                    for r in runs if arm in r]
            return round(float(np.mean(vals)), 4) if vals else None

        summary = {
            "config": {**SMALL, "lr": LR, "clip": CLIP, "size": SIZE,
                       "n_train": N_TRAIN, "n_val": N_VAL, "batch": BATCH,
                       "checkpoints": CHECKPOINTS, "seeds": len(runs),
                       "backend": "axon TPU (arms are ours-only; "
                                  "bf16-vs-f32 is within-backend, "
                                  "seed-matched)"},
            "runs": runs,
            "torch_final_mae": None,
            "ours_final_mae": _final("ours"),
            "ours_bf16_final_mae": _final("ours_bf16"),
            "baseline_mae": round(float(np.mean(
                [r["baseline_mae"] for r in runs])), 4),
        }
        with open(OUT, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"== after seed {s}: f32 {summary['ours_final_mae']} "
              f"bf16 {summary['ours_bf16_final_mae']} "
              f"(baseline {summary['baseline_mae']})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
