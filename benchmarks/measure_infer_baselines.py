"""Measure-and-cache the torch-CPU *inference* baselines.

The train baselines survive in BENCH_r02.json's recorded suite; the infer
keys (`unet_infer`, `transunet_infer`) were measured in a prior session but
BASELINE_MEASURED.json is gitignored, so a fresh checkout loses them.  This
re-measures exactly bench.py's baseline_unet_infer / baseline_transunet_infer
and merges them into the cache so the driver's end-of-round bench run does
not spend its budget on torch-CPU forwards.
"""
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

for key in ("unet_infer", "transunet_infer"):
    ips = bench.get_baseline(key)
    print(key, ips, flush=True)
