#!/usr/bin/env python
"""r4 experiment: CLTR transformer bf16 end-to-end vs f32 (real chip).

The r3 gating fix (models/cltr/transformer.py::raw_attention computes in the
activation dtype) means the f32 model now honestly runs f32 attention; the
bf16 path needs the model itself in bf16.  This measures both plus the batch
knee under bf16.

Run: python benchmarks/r4_cltr_bf16.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    out = {}
    for name, kw in [
        ("cltr_f32_b8", dict(batch=8, precision="f32")),
        ("cltr_bf16_b8", dict(batch=8, precision="bf16")),
        ("cltr_bf16_b16", dict(batch=16, precision="bf16")),
        ("cltr_bf16_b32", dict(batch=32, steps=6, precision="bf16")),
    ]:
        print(f"=== {name}", file=sys.stderr, flush=True)
        try:
            ips = bench.tpu_cltr(**kw)
        except Exception as e:
            out[name] = {"error": str(e)}
            print(f"  FAILED {e!r}", file=sys.stderr, flush=True)
            continue
        out[name] = round(ips, 2)
        print(f"  {ips:.2f} img/s", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
