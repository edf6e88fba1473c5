"""r8 attention A/B on the real chip: dot-operand precision + head packing.

Tests two structural hypotheses about the r4-r7 "~50 TF/s attention ceiling"
(VERDICT r3 items 2 and 7):
  (a) d_head=64 leaves half the 128-lane MXU idle -> pack 2 heads per lane
      tile (block-diagonal packed kernel, section D) — plus a direct MXU
      K/N-width probe (section A) that measures whether sub-128 contraction
      widths are actually padded to the 128-cycle rate.
  (b) every in-kernel dot upcasts operands to f32, and f32 matmul runs at
      ~1/4 the bf16 MXU rate on v5e -> operand-dtype dots with f32
      accumulation (sections B/C A/B the new f32_dots=False kernel path).

Writes benchmarks/R8_ATTN_AB.json incrementally (timeout-safe).
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "R8_ATTN_AB.json")
RESULTS = {}


def save(section, payload):
    RESULTS[section] = payload
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"== {section}: {json.dumps(payload)}", flush=True)


def timeit(fn, iters=30):
    r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # axon: float() forces flush
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- A: probes
def mxu_probes():
    rng = np.random.RandomState(0)
    res = {}
    M = N = 4096

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for K in (32, 64, 128, 256, 512):
        a = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        b = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
        f = jax.jit(mm)
        dt = timeit(lambda: f(a, b))
        res[f"bf16_K{K}_tfs"] = round(2 * M * N * K / dt / 1e12, 1)
    for K in (128, 512):
        a = jnp.asarray(rng.randn(M, K), jnp.float32)
        b = jnp.asarray(rng.randn(K, N), jnp.float32)
        f = jax.jit(mm)
        dt = timeit(lambda: f(a, b))
        res[f"f32_K{K}_tfs"] = round(2 * M * N * K / dt / 1e12, 1)
    # N-width probe (PV-shaped: wide contraction, narrow output)
    for Nw in (32, 64, 128, 256):
        a = jnp.asarray(rng.randn(M, 2048), jnp.bfloat16)
        b = jnp.asarray(rng.randn(2048, Nw), jnp.bfloat16)
        f = jax.jit(mm)
        dt = timeit(lambda: f(a, b))
        res[f"bf16_N{Nw}_tfs"] = round(2 * M * 2048 * Nw / dt / 1e12, 1)
    save("mxu_probes", res)


# ------------------------------------------------- B/C: kernel dtype A/B
def kernel_ab(tag, b, h, n, d, rate, dtype=jnp.bfloat16):
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, h, n, d), dtype)
    k = jnp.asarray(rng.randn(b, h, n, d), dtype)
    v = jnp.asarray(rng.randn(b, h, n, d), dtype)
    seed = jnp.uint32(7)
    scale = d ** -0.5
    res = {}
    outs = {}
    # useful model flops (fwd): 2*B*H*N^2*2d; bwd ~2.5x more
    gf_fwd = 2 * b * h * n * n * 2 * d / 1e9

    for name, f32d in (("f32dots", True), ("opdots", False)):
        fwd = jax.jit(functools.partial(
            A.dropout_flash_attention, scale=scale, rate=rate,
            f32_dots=f32d))
        dt = timeit(lambda: fwd(q, k, v, seed))
        res[f"{name}_fwd_ms"] = round(dt * 1e3, 3)
        res[f"{name}_fwd_tfs"] = round(gf_fwd / dt / 1e3, 1)
        outs[name] = fwd(q, k, v, seed)

        grad = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                A.dropout_flash_attention(q, k, v, seed, scale, rate,
                                          False, f32d)
                .astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))
        dt = timeit(lambda: grad(q, k, v))
        res[f"{name}_fwdbwd_ms"] = round(dt * 1e3, 3)
    diff = jnp.abs(outs["f32dots"].astype(jnp.float32)
                   - outs["opdots"].astype(jnp.float32))
    res["fwd_maxdiff"] = float(diff.max())
    res["fwd_out_absmax"] = float(
        jnp.abs(outs["f32dots"].astype(jnp.float32)).max())
    save(tag, res)


# ---------------------------------------------- C2: CLTR tile-size ladder
def tile_ladder():
    rng = np.random.RandomState(2)
    b, h, n, d = 16, 8, 2000, 32
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    seed = jnp.uint32(7)
    scale = d ** -0.5
    res = {}
    orig = A._dfa_blocks
    try:
        for bq, bk in ((512, 1024), (512, 2048), (1024, 1024), (256, 2048)):
            A._dfa_blocks = lambda nq, nk, _bq=bq, _bk=bk: (_bq, _bk)
            grad = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    A.dropout_flash_attention(q, k, v, seed, scale, 0.1,
                                              False, False)
                    .astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            dt = timeit(lambda: grad(q, k, v))
            res[f"bq{bq}_bk{bk}_fwdbwd_ms"] = round(dt * 1e3, 3)
    finally:
        A._dfa_blocks = orig
    save("cltr_tile_ladder", res)


# ------------------------------------------- D: 2-head block-diag packing
def packed2_fwd(q, k, v, scale, block_q=512, interpret=False):
    """Block-diagonal 2-head packed whole-K forward (d=64 -> 128 lanes).

    qcat (bq, 128) = [q_h0 | q_h1]; kcat (2nk, 128) = [[k0, 0], [0, k1]];
    s_cat (bq, 2nk) = qcat @ kcat^T gives both heads' scores in one dot at
    full 128-wide contraction; vcat (2nk, 128) = [[v0, 0], [0, v1]] gives
    both heads' PV in one dot at full 128-wide output.  Same MXU cycle count
    as the padded per-head dots IF the MXU pads K/N<128 to the 128 rate —
    this kernel plus the section-A probe settles that question empirically.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dd = q.shape
    nk = k.shape[2]
    assert h % 2 == 0 and dd == 64
    qf = q.reshape(b * h // 2, 2, nq, dd)
    kf = k.reshape(b * h // 2, 2, nk, dd)
    vf = v.reshape(b * h // 2, 2, nk, dd)
    bq = min(block_q, nq)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        q2 = q_ref[0]
        qcat = jnp.concatenate([q2[0], q2[1]], axis=-1)  # (bq, 128)
        k2 = k_ref[0]
        z = jnp.zeros_like(k2[0])
        kcat = jnp.concatenate(
            [jnp.concatenate([k2[0], z], axis=-1),
             jnp.concatenate([z, k2[1]], axis=-1)], axis=0)  # (2nk, 128)
        s = jax.lax.dot_general(qcat, kcat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s0, s1 = s[:, :nk], s[:, nk:]

        def soft(x):
            m = jnp.max(x, axis=-1, keepdims=True)
            e = jnp.exp(x - m)
            return e, jnp.sum(e, axis=-1, keepdims=True)

        e0, l0 = soft(s0)
        e1, l1 = soft(s1)
        v2 = v_ref[0]
        zv = jnp.zeros_like(v2[0])
        vcat = jnp.concatenate(
            [jnp.concatenate([v2[0], zv], axis=-1),
             jnp.concatenate([zv, v2[1]], axis=-1)], axis=0)  # (2nk, 128)
        pcat = jnp.concatenate([e0, e1], axis=-1).astype(v2.dtype)
        o = jax.lax.dot_general(pcat, vcat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0] = (o[:, :dd] / l0).astype(o_ref.dtype)
        o_ref[0, 1] = (o[:, dd:] / l1).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h // 2, nq // bq),
        in_specs=[
            pl.BlockSpec((1, 2, bq, dd), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, nk, dd), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, nk, dd), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, bq, dd), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h // 2, 2, nq, dd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, dd)


def packing_ab():
    rng = np.random.RandomState(3)
    b, h, n, d = 8, 12, 1024, 64  # ViT-B @ 512px shapes
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.bfloat16)
    scale = d ** -0.5
    res = {}
    gf = 2 * b * h * n * n * 2 * d / 1e9

    ref = A.attention_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                                v.astype(jnp.float32), scale)
    pk = jax.jit(functools.partial(packed2_fwd, scale=scale))
    out = pk(q, k, v)
    res["packed_maxerr"] = float(
        jnp.abs(out.astype(jnp.float32) - ref).max())
    dt = timeit(lambda: pk(q, k, v))
    res["packed2_fwd_ms"] = round(dt * 1e3, 3)
    res["packed2_fwd_tfs"] = round(gf / dt / 1e3, 1)

    for name, f32d in (("unpacked_f32dots", True), ("unpacked_opdots", False)):
        f = jax.jit(functools.partial(
            A._attention_flash, scale=scale, block_q=512, block_k=1024,
            f32_dots=f32d))
        dt = timeit(lambda: f(q, k, v))
        res[f"{name}_fwd_ms"] = round(dt * 1e3, 3)
        res[f"{name}_fwd_tfs"] = round(gf / dt / 1e3, 1)
    save("packing_ab_vit", res)


def main():
    print("devices:", jax.devices(), flush=True)
    mxu_probes()
    # B: ViT-B shapes (TransUnet 512px: 12 heads x d64, N=1024, rate 0)
    kernel_ab("vit_b8_h12_n1024_d64", 8, 12, 1024, 64, 0.0)
    # C: CLTR decoder self-attn shapes (8 heads x d32, N=2000, rate 0.1)
    kernel_ab("cltr_b16_h8_n2000_d32", 16, 8, 2000, 32, 0.1)
    packing_ab()
    tile_ladder()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
