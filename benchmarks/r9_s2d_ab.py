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


def parity_on_chip():
    """Forward parity of the s2d vs direct root through the FULL TransUnet
    on the real TPU (the CPU equivalence test is necessary but not
    sufficient — Mosaic/XLA lowering can differ per backend).  Same params,
    both paths, max |Δ| recorded."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.transunet import build_transunet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 512, 512, 3), jnp.float32)

    outs = {}
    for arm, env in (("s2d", None), ("direct", "1")):
        if env is None:
            os.environ.pop("UNET_TPU_NO_ROOT_S2D", None)
        else:
            os.environ["UNET_TPU_NO_ROOT_S2D"] = env
        model = build_transunet("TransUnet", img_size=512, n_channels=3,
                                num_classes=3, dtype=jnp.float32)
        variables = model.init(jax.random.key(0), x[:1], train=False)

        @jax.jit
        def fwd(v, xx):
            return model.apply(v, xx, train=False)

        outs[arm] = np.asarray(fwd(variables, x))
    os.environ.pop("UNET_TPU_NO_ROOT_S2D", None)
    maxdiff = float(np.abs(outs["s2d"] - outs["direct"]).max())
    RESULTS["parity_maxdiff_f32_512px"] = maxdiff
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== on-chip f32 parity max|Δ| = {maxdiff:.3e}", flush=True)


def main():
    os.environ.pop("UNET_TPU_NO_ROOT_S2D", None)
    save("transunet_b8_s2d", bench.tpu_transunet(batch=8, steps=10))
    os.environ["UNET_TPU_NO_ROOT_S2D"] = "1"
    save("transunet_b8_direct", bench.tpu_transunet(batch=8, steps=10))
    os.environ.pop("UNET_TPU_NO_ROOT_S2D", None)
    # second s2d arm guards against tunnel drift ordering effects
    save("transunet_b8_s2d_rerun", bench.tpu_transunet(batch=8, steps=10))
    parity_on_chip()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
