#!/usr/bin/env python
"""Infer batch-size sweep on the real chip (r5).

The r4 infer entries fixed b16 (unet 223.6, transunet 141.8 img/s, ~52% MFU
for the UNet forward).  Forward-only steps have no wgrads to fill the MXU
between dispatches — a larger batch may amortise per-step overhead.  One
process, one JSON line per point, honest sync inside the bench fns.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

out = {}
for b in (16, 32, 64):
    out[f"unet_infer_b{b}"] = round(bench.tpu_unet_infer(batch=b), 2)
    print(json.dumps(out), flush=True)
for b in (16, 32):
    out[f"transunet_infer_b{b}"] = round(bench.tpu_transunet_infer(batch=b),
                                         2)
    print(json.dumps(out), flush=True)
