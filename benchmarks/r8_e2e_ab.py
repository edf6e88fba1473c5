"""r8 end-to-end A/B: merged single-pass flash backward in full train steps.

Arms: (a) new default (merged bwd + nkt==1 fast-path fwd), (b) forced
two-pass backward (UNET_TPU_ATTN_BWD2 semantics via the module flag; each
bench.tpu_* call builds a fresh jitted step, and the inner kernels key their
jit caches on the threaded static args, so in-process flips are safe).
r7 controls for reference: transunet_b8 69.4, cltr_b16 127.2 img/s.

Writes benchmarks/R8_E2E_AB.json incrementally.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_torch_tpu.kernels import attention as A  # noqa: E402

import bench  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R8_E2E_AB.json")
RESULTS = {}


def save(key, val):
    RESULTS[key] = round(val, 2)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== {key}: {val:.2f} img/s", flush=True)


def main():
    A._BWD2_ENV = False
    save("cltr_b16_merged", bench.tpu_cltr(batch=16, steps=10))
    save("transunet_b8_merged", bench.tpu_transunet(batch=8, steps=10))
    A._BWD2_ENV = True
    save("cltr_b16_twopass", bench.tpu_cltr(batch=16, steps=10))
    save("transunet_b8_twopass", bench.tpu_transunet(batch=8, steps=10))
    A._BWD2_ENV = False
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
