#!/usr/bin/env python
"""r10 A/B (VERDICT r4 item 4, throughput side): topo step with PH pairing
on a ds x-max-pooled likelihood, real chip + this 1-vCPU host.

The r4 topo number (21.8 img/s) sits at a ~360 ms/batch host pairing floor
(union-find over the full 512^2 likelihood, 8 imgs).  Pairing on a 2x/4x
pooled map shrinks the host work and the D2H transfer ~ds^2; the quality
side (count MRE at convergence) runs separately on the CPU fixture
(parity_suite.py --experiments topo_coarse).

Also times the localized TopoCount loss (window=64, ds=1) — its per-window
union-find has the same asymptotic cost but different constants.

Writes benchmarks/R10_TOPO_DS_AB.json incrementally.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R10_TOPO_DS_AB.json")
RESULTS = {}


def save(key, val):
    RESULTS[key] = round(val, 2)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== {key}: {val:.2f} img/s", flush=True)


def main():
    save("topo_b8_ds1", bench.tpu_topo(batch=8, steps=10, pair_downsample=1))
    save("topo_b8_ds2", bench.tpu_topo(batch=8, steps=10, pair_downsample=2))
    save("topo_b8_ds4", bench.tpu_topo(batch=8, steps=10, pair_downsample=4))
    # drift guard: rerun the control after the arms
    save("topo_b8_ds1_rerun",
         bench.tpu_topo(batch=8, steps=10, pair_downsample=1))
    save("topocount_b8_ds1",
         bench.tpu_topo(batch=8, steps=10, loss_type="TopoCount"))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
