#!/usr/bin/env python
"""Host input-pipeline throughput on real-shaped 512² data.

The TPU consumes ~83 img/s (bench.py headline); the host loader must outrun
that or training is input-bound.  Measures NumpyLoader img/s over DataBinary:
cold first epoch (cv2 decode + aug + zoom + z-norm) and warm epochs (the r2
decoded-sample cache).  Writes LOADER_BENCH.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(augmentation: bool, epochs: int = 3, n_images: int = 24,
            batch: int = 8, num_workers: int = 0, cache: bool = True):
    import tempfile

    from unet_torch_tpu.data.datasets import DataBinary
    from unet_torch_tpu.data.loader import NumpyLoader
    from unet_torch_tpu.data.synthetic import write_synthetic_dataset

    root = os.path.join(tempfile.gettempdir(),
                        f"loader_bench_{n_images}_512")
    if not os.path.isdir(root) or len(os.listdir(root)) < n_images:
        write_synthetic_dataset(root, n_images=n_images, size=512,
                                n_classes=3, seed=0)
    ds = DataBinary([root], ch=3, augmentation=augmentation,
                    input_size=(512, 512),
                    cache_bytes=(2 << 30) if cache else 0)
    loader = NumpyLoader(ds, batch, shuffle=True, seed=0,
                         num_workers=num_workers)
    rates = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        n = 0
        for xb, yb in loader:
            n += len(xb)
        rates.append(n / (time.perf_counter() - t0))
    return [round(r, 2) for r in rates]


def main():
    out = {}
    out["eval_nocache_img_per_sec"] = measure(False, cache=False, epochs=2)
    out["eval_cached_img_per_sec"] = measure(False, cache=True)
    out["train_aug_nocache_img_per_sec"] = measure(True, cache=False,
                                                   epochs=2)
    out["train_aug_cached_img_per_sec"] = measure(True, cache=True)
    out["train_aug_cached_workers4_img_per_sec"] = measure(
        True, cache=True, num_workers=4)
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "LOADER_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
