"""r9 A/B: ResNetV2 root space-to-depth rewrite in the full TransUnet step.

Arms: (a) new default (root 7x7/s2 evaluated as s2d 4x4/s1 — resnetv2.py::
_s2d_conv7x7s2), (b) UNET_TPU_NO_ROOT_S2D=1 direct-conv control.  The env
var is read at trace time and each bench.tpu_transunet call builds a fresh
jitted step, so in-process flips are safe.  r8 context: the direct root ran
at 7 TF/s fwd (1.38 ms) + 12.7 TF/s wgrad (0.79 ms) of a 106.6 ms step.

Writes benchmarks/R9_S2D_AB.json incrementally.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R9_S2D_AB.json")
RESULTS = {}


def save(key, val):
    RESULTS[key] = round(val, 2)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== {key}: {val:.2f} img/s", flush=True)


def main():
    os.environ.pop("UNET_TPU_NO_ROOT_S2D", None)
    save("transunet_b8_s2d", bench.tpu_transunet(batch=8, steps=10))
    os.environ["UNET_TPU_NO_ROOT_S2D"] = "1"
    save("transunet_b8_direct", bench.tpu_transunet(batch=8, steps=10))
    os.environ.pop("UNET_TPU_NO_ROOT_S2D", None)
    # second s2d arm guards against tunnel drift ordering effects
    save("transunet_b8_s2d_rerun", bench.tpu_transunet(batch=8, steps=10))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
