"""r8b: scan-chained attention microbench — clean device times.

The r8_attn_ab.py wall timings carried ~1.4 ms/call of tunneled dispatch
overhead (the 4096x4096 matmul probes read 0.5-11 "TF/s" — pure overhead).
Here every measured op is chained L times inside ONE jit via lax.scan
(carry q' = out / dq, so iterations are data-dependent and cannot be CSE'd
or overlapped), so per-op time = t/L with one dispatch total.

Writes benchmarks/R8B_ATTN_SCAN.json incrementally.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unet_torch_tpu.kernels import attention as A  # noqa: E402
from r8_attn_ab import packed2_fwd  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R8B_ATTN_SCAN.json")
RESULTS = {}
L = 20


def save(section, payload):
    RESULTS[section] = payload
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== {section}: {json.dumps(payload)}", flush=True)


def chain_time(step, q, k, v, iters=3):
    """step: q -> q' (same shape).  Returns seconds per step call."""
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            return step(c, k, v), None
        c, _ = jax.lax.scan(body, q, None, length=L)
        return c

    r = run(q, k, v)
    float(jnp.sum(r.astype(jnp.float32)))  # compile + sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = run(q, k, v)
        float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / L)
    return best


def mk(b, h, n, d, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, n, d), dtype)
    k = jnp.asarray(rng.randn(b, h, n, d), dtype)
    v = jnp.asarray(rng.randn(b, h, n, d), dtype)
    return q, k, v


# ------------------------------------------------------------- matmul rates
def matmul_rates():
    rng = np.random.RandomState(0)
    res = {}
    M = N = 4096

    for name, K, dt in (("bf16_K64", 64, jnp.bfloat16),
                        ("bf16_K128", 128, jnp.bfloat16),
                        ("bf16_K512", 512, jnp.bfloat16),
                        ("f32_K512", 512, jnp.float32)):
        a = jnp.asarray(rng.randn(M, K), dt)
        b = jnp.asarray(rng.randn(K, N), dt)
        d2 = jnp.asarray(rng.randn(N, K), dt)  # maps (M,N) back to (M,K)

        def step(c, b_, d_):
            out = jax.lax.dot_general(c, b_, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return jax.lax.dot_general(out.astype(dt), d_,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32
                                       ).astype(dt)

        sec = chain_time(step, a, b, d2) / 2  # two matmuls per step
        res[f"{name}_tfs"] = round(2 * M * N * K / sec / 1e12, 1)
    save("matmul_rates", res)


# --------------------------------------------------------------- kernels
def vit_kernels():
    b, h, n, d = 8, 12, 1024, 64
    q, k, v = mk(b, h, n, d)
    scale = d ** -0.5
    seed = jnp.uint32(7)
    gf_fwd = 2 * b * h * n * n * 2 * d / 1e9
    res = {}

    for name, f32d in (("f32dots", True), ("opdots", False)):
        fwd = lambda q, k, v, _f=f32d: A.dropout_flash_attention(
            q, k, v, seed, scale, 0.0, False, _f)
        sec = chain_time(fwd, q, k, v)
        res[f"{name}_fwd_ms"] = round(sec * 1e3, 3)
        res[f"{name}_fwd_tfs"] = round(gf_fwd / sec / 1e3, 1)

        def gstep(qc, k, v, _f=f32d):
            g = jax.grad(lambda q_, k_, v_: jnp.sum(
                A.dropout_flash_attention(q_, k_, v_, seed, scale, 0.0,
                                          False, _f)
                .astype(jnp.float32) ** 2), argnums=(0, 1, 2))(qc, k, v)
            return (g[0] + g[1] + g[2]).astype(qc.dtype) * 1e-3

        sec = chain_time(gstep, q, k, v)
        res[f"{name}_fwdbwd_ms"] = round(sec * 1e3, 3)
        res[f"{name}_fwdbwd_tfs"] = round(4.5 * gf_fwd / sec / 1e3, 1)

    pk = lambda q, k, v: packed2_fwd(q, k, v, scale).astype(q.dtype)
    sec = chain_time(pk, q, k, v)
    res["packed2_fwd_ms"] = round(sec * 1e3, 3)
    res["packed2_fwd_tfs"] = round(gf_fwd / sec / 1e3, 1)
    save("vit_b8_h12_n1024_d64", res)


def cltr_kernels():
    b, h, n, d = 16, 8, 2000, 32
    q, k, v = mk(b, h, n, d)
    scale = d ** -0.5
    seed = jnp.uint32(7)
    gf_fwd = 2 * b * h * n * n * 2 * d / 1e9
    res = {}
    orig = A._dfa_blocks
    try:
        for bq, bk in ((512, 1024), (1024, 1024), (256, 2048), (1024, 2048)):
            A._dfa_blocks = lambda nq, nk, _b=(bq, bk): _b

            fwd = lambda q, k, v: A.dropout_flash_attention(
                q, k, v, seed, scale, 0.1, False, False)
            try:
                sec = chain_time(fwd, q, k, v)
                res[f"bq{bq}_bk{bk}_fwd_ms"] = round(sec * 1e3, 3)
                res[f"bq{bq}_bk{bk}_fwd_tfs"] = round(gf_fwd / sec / 1e3, 1)
            except Exception as e:  # VMEM OOM configs
                res[f"bq{bq}_bk{bk}_fwd_ms"] = f"ERR {type(e).__name__}"
                continue

            def gstep(qc, k, v):
                g = jax.grad(lambda q_, k_, v_: jnp.sum(
                    A.dropout_flash_attention(q_, k_, v_, seed, scale, 0.1,
                                              False, False)
                    .astype(jnp.float32) ** 2), argnums=(0, 1, 2))(qc, k, v)
                return (g[0] + g[1] + g[2]).astype(qc.dtype) * 1e-3

            try:
                sec = chain_time(gstep, q, k, v)
                res[f"bq{bq}_bk{bk}_fwdbwd_ms"] = round(sec * 1e3, 3)
            except Exception as e:
                res[f"bq{bq}_bk{bk}_fwdbwd_ms"] = f"ERR {type(e).__name__}"
            save("cltr_b16_h8_n2000_d32", res)
    finally:
        A._dfa_blocks = orig
    save("cltr_b16_h8_n2000_d32", res)


def main():
    print("devices:", jax.devices(), flush=True)
    matmul_rates()
    vit_kernels()
    cltr_kernels()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
