#!/usr/bin/env python
"""Lane-folding experiment: can packing W-pixel pairs into the 128-lane minor
dim kill the 2x HBM padding tax on C=64 activations?  (BASELINE.md r1 perf
notes: (B,512,512,64) tensors lay out as T(8,128) with C=64 in the lane dim ->
"2.0x expansion"; ~30 conv fusions bandwidth-bound.)

A 3x3 conv on the folded tensor (B,H,W/2,2C) with a restructured (3,3,2C,2C)
kernel is EXACTLY the original conv: output position 2w'+k_out reads input
2(w'+dwf)+k_in where k_in = k_out + dw - 2*dwf.  Zeros pad the structural
holes; the MXU computes dense 128-lane contractions either way, so folding
halves bytes at equal MXU work.

Run (TPU): python benchmarks/bench_fold.py
Verify only (CPU): python benchmarks/bench_fold.py --verify
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# (k_out, dw_orig) -> (k_in, dw_folded); dw_folded = (k_out + dw - k_in)/2
_FOLD_MAP = {
    0: [(-1, 1, -1), (0, 0, 0), (1, 1, 0)],
    1: [(-1, 0, 0), (0, 1, 0), (1, 0, 1)],
}


def fold_kernel(k):
    """(3,3,Ci,Co) conv kernel -> (3,3,2Ci,2Co) folded-layout kernel."""
    kh, kw, ci, co = k.shape
    assert kw == 3
    kf = jnp.zeros((kh, 3, 2 * ci, 2 * co), k.dtype)
    for k_out, entries in _FOLD_MAP.items():
        for dw, k_in, dwf in entries:
            kf = kf.at[:, dwf + 1, k_in * ci:(k_in + 1) * ci,
                       k_out * co:(k_out + 1) * co].set(k[:, dw + 1])
    return kf


def fold(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unfold(x):
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def verify():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    ref = conv(jax.nn.relu(conv(x, k1)), k2)
    xf = fold(x)
    got = unfold(conv(jax.nn.relu(conv(xf, fold_kernel(k1))),
                      fold_kernel(k2)))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"fold equivalence max err: {err:.2e}")
    assert err < 1e-4
    return err


def _time(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out)) if out.ndim else float(out)  # compile+sync
    out = fn(*args)
    float(jnp.sum(out)) if out.ndim else float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out)) if out.ndim else float(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    if args.verify:
        jax.config.update("jax_platforms", "cpu")
        verify()
        return

    verify()
    B, H, W, C = args.batch, 512, 512, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    @jax.jit
    def chain_plain(x, k1, k2):
        return jnp.sum(conv(jax.nn.relu(conv(x, k1)), k2).astype(jnp.float32))

    @jax.jit
    def chain_folded(x, k1, k2):
        # fold/unfold at the boundaries included (realistic relayout cost)
        xf = fold(x)
        y = conv(jax.nn.relu(conv(xf, fold_kernel(k1))), fold_kernel(k2))
        return jnp.sum(unfold(y).astype(jnp.float32))

    @jax.jit
    def grad_plain(x, k1, k2):
        f = lambda k1, k2: jnp.sum(
            conv(jax.nn.relu(conv(x, k1)), k2).astype(jnp.float32))
        g = jax.grad(f, argnums=(0, 1))(k1, k2)
        return sum(jnp.sum(gi.astype(jnp.float32)) for gi in g)

    @jax.jit
    def grad_folded(x, k1, k2):
        def f(k1, k2):
            xf = fold(x)
            y = conv(jax.nn.relu(conv(xf, fold_kernel(k1))), fold_kernel(k2))
            return jnp.sum(y.astype(jnp.float32))
        g = jax.grad(f, argnums=(0, 1))(k1, k2)
        return sum(jnp.sum(gi.astype(jnp.float32)) for gi in g)

    results = {}
    for name, fn in [("fwd_plain", chain_plain), ("fwd_folded", chain_folded),
                     ("grad_plain", grad_plain), ("grad_folded", grad_folded)]:
        ms = _time(fn, x, k1, k2)
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)
    results["fwd_speedup"] = round(results["fwd_plain"] /
                                   results["fwd_folded"], 3)
    results["grad_speedup"] = round(results["grad_plain"] /
                                    results["grad_folded"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
