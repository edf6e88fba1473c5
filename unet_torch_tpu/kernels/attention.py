"""Fused multi-head attention — Pallas TPU kernel with XLA fallback.

Shared by the ViT encoder (TransUnet/vit_seg_modeling.py:50-94 semantics) and
the CLTR conditional-DETR stack (CLTR/attention.py:166-373 semantics: q/k may
be pre-projected at a different width than v).

Design: the reference sequences are short (ViT ≤ ~1k tokens, CLTR memory
≤ ~64, queries 2000), so per (batch*head) the full (N, D) q/k/v and the (Nq,
Nk) score matrix fit comfortably in VMEM.  One grid cell per (batch*head)
computes QK^T -> softmax -> PV entirely on-chip: one HBM read per operand, one
write for the output, zero materialised intermediates in HBM.  (A tiled
flash-attention variant only pays off for much longer sequences than this
workload ever produces.)

`fused_attention` auto-falls back to a pure-jnp einsum path on non-TPU
backends or when a key-padding mask is supplied; the fallback is also the
correctness oracle in tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from unet_torch_tpu.kernels import accounting

# MXU dot operand precision for the attention kernels.  The r8 A/B
# (benchmarks/r8_attn_ab.py, r8b_attn_scan.py) measured that inside Pallas,
# `convert(bf16->f32); dot(..., preferred=f32)` and bf16-operand dots are
# BIT-IDENTICAL on the real chip and time-identical (Mosaic lowers both to
# the same bf16 MXU passes with f32 accumulation) — so this flag changes
# nothing on TPU silicon and exists as (a) documentation of that measured
# negative, and (b) an interpret-mode control (on CPU the f32 upcast is a
# genuine precision difference).  f32_dots=False (the default) keeps the
# kernels' dot operands in their storage dtype, which is what the hardware
# executes either way; UNET_TPU_ATTN_F32_DOTS=1 restores the explicit
# upcast.
_F32_DOTS_ENV = os.environ.get("UNET_TPU_ATTN_F32_DOTS", "0") == "1"

# Set UNET_TPU_ATTN_BWD2=1 to force the two-pass flash backward (the r8
# control path) instead of the merged single-pass backward.
_BWD2_ENV = os.environ.get("UNET_TPU_ATTN_BWD2", "0") == "1"


def _resolve_f32_dots(flag):
    return _F32_DOTS_ENV if flag is None else bool(flag)


def _use_pallas_default() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def attention_reference(q, k, v, scale):
    """Oracle: q,k (B,H,Nq/Nk,Dqk); v (B,H,Nk,Dv)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "f32_dots"))
def _attention_pallas(q, k, v, scale, bias=None, interpret=False,
                      f32_dots=False):
    """Whole-sequence kernel.  ``bias``: optional (B, Nk) additive score bias
    (padding masks encode as -1e30 there), broadcast over heads/queries."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dqk = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    accounting.record("attention_fwd", 2 * b * h * nq * nk * (dqk + dv))
    qf = q.reshape(b * h, nq, dqk)
    kf = k.reshape(b * h, nk, dqk)
    vf = v.reshape(b * h, nk, dv)
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        qb, kb = q_ref[0], k_ref[0]
        if f32_dots:
            qb, kb = qb.astype(jnp.float32), kb.astype(jnp.float32)
        vb = v_ref[0]
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + b_ref[0, 0].astype(jnp.float32)[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, nq, dqk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, dqk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk, dv), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if has_bias:
        # (B, 1, Nk) so the block's last two dims equal the array dims —
        # Mosaic requires (8,128)-divisible OR full-dim blocks; a 2-D
        # (1, nk) block is illegal whenever B > 1
        in_specs.append(pl.BlockSpec((1, 1, nk), lambda i: (i // h, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias[:, None, :])
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nq, dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, dv), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, nq, dv)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret", "f32_dots"))
def _attention_flash(q, k, v, scale, bias=None, block_q=256, block_k=512,
                     interpret=False, f32_dots=False):
    """Flash-tiled attention: online softmax over Nk tiles, so VMEM holds only
    (block_q x block_k) scores — arbitrary sequence lengths keep the fused
    path (the whole-sequence kernel above is limited to ~10MB of q/k/v+scores).

    Grid (BH, nq_tiles, nk_tiles), K innermost: TPU grids run sequentially, so
    the m/l/acc scratch carries across the K sweep of each Q tile
    (pallas_guide.md grid-revisiting pattern)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dqk = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    bq = min(block_q, _ceil_to(nq, 8))
    bk = min(block_k, _ceil_to(nk, 128))
    nq_p, nk_p = _ceil_to(nq, bq), _ceil_to(nk, bk)
    accounting.record("attention_flash_fwd",
                      2 * b * h * nq_p * nk_p * (dqk + dv))

    qf = q.reshape(b * h, nq, dqk)
    kf = k.reshape(b * h, nk, dqk)
    vf = v.reshape(b * h, nk, dv)
    if nq_p != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_p - nq), (0, 0)))
    if nk_p != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_p - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_p - nk), (0, 0)))
    has_bias = bias is not None
    if has_bias and nk_p != nk:
        bias = jnp.pad(bias, ((0, 0), (0, nk_p - nk)))
    n_k_tiles = nk_p // bk

    def kernel(q_ref, k_ref, v_ref, *rest):
        if has_bias:
            b_ref, o_ref, m_scr, l_scr, acc_scr = rest
        else:
            o_ref, m_scr, l_scr, acc_scr = rest
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        qb, kb = q_ref[0], k_ref[0]
        if f32_dots:
            qb, kb = qb.astype(jnp.float32), kb.astype(jnp.float32)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + b_ref[0, 0].astype(jnp.float32)[None, :]
        # mask padded K columns (global index >= true nk)
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk, s, -1e30)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * corr + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * corr + pv
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

        @pl.when(ki == n_k_tiles - 1)
        def _final():
            o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, bq, dqk), lambda i, j, ki: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dqk), lambda i, j, ki: (i, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dv), lambda i, j, ki: (i, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if has_bias:
        # 3-D (B, 1, Nk_p) bias for Mosaic block legality (see above)
        in_specs.append(pl.BlockSpec((1, 1, bk),
                                     lambda i, j, ki: (i // h, 0, ki),
                                     memory_space=pltpu.VMEM))
        args.append(bias[:, None, :])
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nq_p // bq, n_k_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dv), lambda i, j, ki: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :nq].reshape(b, h, nq, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_pallas_diff(q, k, v, scale, interpret, f32_dots):
    return _attention_pallas(q, k, v, scale, interpret=interpret,
                             f32_dots=f32_dots)


def _attention_diff_fwd(q, k, v, scale, interpret, f32_dots):
    return (_attention_pallas(q, k, v, scale, interpret=interpret,
                              f32_dots=f32_dots), (q, k, v))


def _einsum_bwd(q, k, v, g, scale, bias=None):
    """Shared backward: recompute the probability matrix (optionally biased)
    and let XLA fuse the four einsums."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv


def _attention_diff_bwd(scale, interpret, f32_dots, res, g):
    """Pallas forward / einsum backward — pallas_call has no autodiff rule."""
    q, k, v = res
    return _einsum_bwd(q, k, v, g, scale)


_attention_pallas_diff.defvjp(_attention_diff_fwd, _attention_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_flash_diff(q, k, v, scale, interpret, f32_dots):
    return _attention_flash(q, k, v, scale, interpret=interpret,
                            f32_dots=f32_dots)


def _attention_flash_fwd(q, k, v, scale, interpret, f32_dots):
    return (_attention_flash(q, k, v, scale, interpret=interpret,
                             f32_dots=f32_dots), (q, k, v))


_attention_flash_diff.defvjp(_attention_flash_fwd, _attention_diff_bwd)


def _masked_bwd(scale, interpret, f32_dots, res, g):
    q, k, v, bias = res
    dq, dk, dv = _einsum_bwd(q, k, v, g, scale, bias=bias)
    return dq, dk, dv, jnp.zeros_like(bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_masked_diff(q, k, v, bias, scale, interpret, f32_dots):
    return _attention_pallas(q, k, v, scale, bias=bias, interpret=interpret,
                             f32_dots=f32_dots)


def _attention_masked_fwd(q, k, v, bias, scale, interpret, f32_dots):
    return (_attention_pallas(q, k, v, scale, bias=bias, interpret=interpret,
                              f32_dots=f32_dots), (q, k, v, bias))


_attention_masked_diff.defvjp(_attention_masked_fwd, _masked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_flash_masked_diff(q, k, v, bias, scale, interpret, f32_dots):
    return _attention_flash(q, k, v, scale, bias=bias, interpret=interpret,
                            f32_dots=f32_dots)


def _attention_flash_masked_fwd(q, k, v, bias, scale, interpret, f32_dots):
    return (_attention_flash(q, k, v, scale, bias=bias, interpret=interpret,
                             f32_dots=f32_dots), (q, k, v, bias))


_attention_flash_masked_diff.defvjp(_attention_flash_masked_fwd, _masked_bwd)


def fused_attention(q, k, v, scale=None, key_padding_mask=None,
                    use_pallas=None, interpret=False, f32_dots=None):
    """q,k: (B,H,N,Dqk); v: (B,H,Nk,Dv) -> (B,H,Nq,Dv).

    Differentiable (custom VJP: Pallas forward, einsum backward).  Falls back
    to the einsum path when masked or on non-TPU backends.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    f32_dots = _resolve_f32_dots(f32_dots)
    flash = False
    if use_pallas is None:
        use_pallas = _use_pallas_default()
        # whole-sequence kernel: q/k/v + the (Nq, Nk) score matrix must fit
        # VMEM (~16MB/core); longer sequences switch to the flash-tiled
        # kernel (online softmax over Nk tiles) instead of losing the fusion
        nq, nk = q.shape[2], k.shape[2]
        vmem_bytes = 4 * (nq * nk + nq * q.shape[3] + nk * k.shape[3]
                          + nk * v.shape[3] + nq * v.shape[3])
        if vmem_bytes > 10 * 1024 * 1024:
            flash = use_pallas
    if not use_pallas:
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if key_padding_mask is not None:
            s = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, s)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)
    if key_padding_mask is not None:
        # padding mask as an additive score bias (-1e30 on padding): the
        # masked kernels keep the fused path for nested variable-size
        # batches (r1 fell back to XLA whenever a mask was present)
        bias = jnp.where(key_padding_mask, -1e30, 0.0).astype(jnp.float32)
        if flash:
            return _attention_flash_masked_diff(q, k, v, bias, float(scale),
                                                interpret, f32_dots)
        return _attention_masked_diff(q, k, v, bias, float(scale), interpret,
                                      f32_dots)
    if flash:
        return _attention_flash_diff(q, k, v, float(scale), interpret,
                                     f32_dots)
    return _attention_pallas_diff(q, k, v, float(scale), interpret, f32_dots)


# ---------------------------------------------------------------------------
# Dropout flash attention (train path): in-kernel PRNG masks, flash backward
# ---------------------------------------------------------------------------
#
# The CLTR decoder self-attention (2000 queries, ref CLTR/transformer.py:
# 284-314) trains with attention-probs dropout (attention.py:355).  The r3
# remat'd-einsum path still materialised (B,H,Nq,Nk) probs + u32 rng bits +
# keep masks in HBM every layer: the r4 profile put ~110 of 132 ms of the
# CLTR b8 step into exactly those tensors.  This kernel family keeps the
# whole train path tiled in VMEM:
#   fwd   flash (online softmax) with dropout applied to the normalised
#         probs inside the tile; saves only (o, lse) residuals
#   bwd   two flash passes (dk/dv with q innermost; dq with k innermost)
#         that RECOMPUTE s/p per tile from q,k + lse
# The dropout mask is never stored: each (bh, q-tile, k-tile) cell reseeds
# the per-core PRNG with a hash of (base_seed, bh, qi, ki), so forward and
# both backward passes regenerate bit-identical masks.
#
# keep = bits >= rate * 2^32  (P(keep) = 1 - rate), survivors scaled by
# 1/(1-rate) — inverted dropout, same convention as nn/blocks.py::TPUDropout.


def _mix32(x):
    """murmur3 finalizer — avalanching 32-bit mix (public constant-set)."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _tile_seed_scalar(seed, bh, qi, ki, nqt, nkt):
    tid = ((bh * nqt + qi) * nkt + ki).astype(jnp.uint32)
    return _mix32(seed.astype(jnp.uint32) ^ (tid * jnp.uint32(2654435761)))


def _keep_mask(seed_ref, i, qi, ki, bq, bk, shape, nqt, nkt, nk_p, thr,
               hw_prng):
    """Tile keep-mask.  hw_prng=True uses the TPU's hardware PRNG seeded
    per (bh, q-tile, k-tile) — identical bits whenever the same tile is
    revisited in the backward passes (same seed + same shape), at a
    fraction of the VPU cost of the portable counter hash.  hw_prng=False
    (interpret mode / tests) uses the index-pure murmur hash, whose mask
    the test oracle can reproduce in plain jnp."""
    if hw_prng:
        from jax.experimental.pallas import tpu as pltpu

        pltpu.prng_seed(_tile_seed_scalar(seed_ref[0], i, qi, ki, nqt, nkt))
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return bits >= jnp.uint32(thr)
    return _dropout_keep(seed_ref[0], i, qi * bq, ki * bk, shape, nk_p, thr)


def _dropout_keep(seed, bh, q0, k0, shape, nk_total, thr):
    """Counter-based keep mask for the (q0.., k0..) tile: a pure function of
    (seed, batch*head, global row, global col), so the forward and both
    backward passes regenerate IDENTICAL masks with no stored state, on any
    backend (pltpu.prng has no interpret-mode lowering).  P(keep) =
    1 - thr/2^32."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(q0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(k0)
    base = _mix32(seed.astype(jnp.uint32)
                  ^ (bh.astype(jnp.uint32) * jnp.uint32(2654435761)))
    h = _mix32((r * jnp.uint32(nk_total) + c) ^ base)
    return h >= jnp.uint32(thr)


@functools.partial(jax.jit, static_argnames=("scale", "rate", "block_q",
                                             "block_k", "interpret",
                                             "hw_prng", "f32_dots"))
def _dropout_flash_fwd(q, k, v, seed, scale, rate, block_q=256, block_k=512,
                       interpret=False, hw_prng=False, f32_dots=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dqk = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    bq = min(block_q, _ceil_to(nq, 8))
    bk = min(block_k, _ceil_to(nk, 128))
    nq_p, nk_p = _ceil_to(nq, bq), _ceil_to(nk, bk)
    qf = q.reshape(b * h, nq, dqk)
    kf = k.reshape(b * h, nk, dqk)
    vf = v.reshape(b * h, nk, dv)
    if nq_p != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_p - nq), (0, 0)))
    if nk_p != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_p - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_p - nk), (0, 0)))
    nqt, nkt = nq_p // bq, nk_p // bk
    thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)  # python int: kernel const
    inv_keep = 1.0 / (1.0 - rate)
    accounting.record("dropout_flash_fwd",
                      2 * b * h * nq_p * nk_p * (dqk + dv))

    def kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
               m_scr, l_scr, acc_scr):
        i, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        if nkt > 1:
            @pl.when(ki == 0)
            def _init():
                m_scr[...] = jnp.full_like(m_scr, -1e30)
                l_scr[...] = jnp.zeros_like(l_scr)
                acc_scr[...] = jnp.zeros_like(acc_scr)

        qb, kb = q_ref[0], k_ref[0]
        if f32_dots:
            qb, kb = qb.astype(jnp.float32), kb.astype(jnp.float32)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk, s, -1e30)

        if nkt == 1:
            # single k-tile (e.g. ViT 512px: nk=1024=bk): plain softmax, no
            # online-correction state — measured 1.72 -> 1.56 ms at
            # (8,12,1024,64) (benchmarks/R8C_BWD1_AB.json whole-K vs flash)
            m_new = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_new)
            l_new = jnp.sum(e, axis=-1, keepdims=True)
        else:
            m_prev = m_scr[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            e = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_scr[...] = (l_scr[...] * corr
                          + jnp.sum(e, axis=-1, keepdims=True))

        if thr > 0:
            keep = _keep_mask(seed_ref, i, qi, ki, bq, bk, s.shape, nqt,
                              nkt, nk_p, thr, hw_prng)
            e_drop = jnp.where(keep, e * inv_keep, 0.0)
        else:  # rate == 0 (trace-time): plain flash attention, no PRNG work
            e_drop = e
        pv = jax.lax.dot_general(e_drop.astype(v_ref.dtype), v_ref[0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if nkt == 1:
            o_ref[0] = (pv / l_new).astype(o_ref.dtype)
            # lse replicated over a trailing 8-lane dim: Mosaic requires the
            # last two block dims to be (8k, 128k) or equal to the array
            # dims — (1, bq) is illegal, (bq, 8) with minor dim == 8 is fine
            lse_ref[0] = jnp.broadcast_to(m_new + jnp.log(l_new), (bq, 8))
            return
        acc_scr[...] = acc_scr[...] * corr + pv
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

        @pl.when(ki == nkt - 1)
        def _final():
            o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)
            lse_ref[0] = jnp.broadcast_to(
                (m_scr[:, :1] + jnp.log(l_scr[:, :1])), (bq, 8))

    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, nqt, nkt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dqk), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dqk), lambda i, j, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, j, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dv), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq_p, dv), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq_p, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.uint32), qf, kf, vf)
    return out[:, :nq].reshape(b, h, nq, dv), lse


@functools.partial(jax.jit, static_argnames=("scale", "rate", "block_q",
                                             "block_k", "interpret",
                                             "hw_prng", "f32_dots"))
def _dropout_flash_bwd(q, k, v, seed, lse, dly, g, scale, rate, block_q=256,
                       block_k=512, interpret=False, hw_prng=False,
                       f32_dots=False):
    """dly: rowwise sum(g * o) (the softmax-backward D term), (BH, nq_p)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dqk = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    bq = min(block_q, _ceil_to(nq, 8))
    bk = min(block_k, _ceil_to(nk, 128))
    nq_p, nk_p = _ceil_to(nq, bq), _ceil_to(nk, bk)
    qf = q.reshape(b * h, nq, dqk)
    kf = k.reshape(b * h, nk, dqk)
    vf = v.reshape(b * h, nk, dv)
    gf = g.reshape(b * h, nq, dv)
    if nq_p != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_p - nq), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, nq_p - nq), (0, 0)))
    if nk_p != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_p - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_p - nk), (0, 0)))
    nqt, nkt = nq_p // bq, nk_p // bk
    thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)  # python int: kernel const
    inv_keep = 1.0 / (1.0 - rate)
    # pass 1 (dk/dv): s + dv + dp + dk; pass 2 (dq): s + dp + dq — the two
    # score recomputes and dk/dq contract over dqk, dv and the two dp over dv
    accounting.record("dropout_flash_bwd",
                      2 * b * h * nq_p * nk_p * (4 * dqk + 3 * dv))
    sd = seed.reshape(1).astype(jnp.uint32)

    # operand dtype for every in-kernel dot: inputs stay in their storage
    # dtype (bf16 model -> bf16 operands, full MXU rate) with f32
    # accumulation; f32_dots=True restores the upcast control path
    odt = jnp.float32 if f32_dots else q.dtype

    def recompute(seed_ref, q_ref, k_ref, lse_ref, i, qi, ki):
        qb = q_ref[0].astype(odt)
        kb = k_ref[0].astype(odt)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk, s, -1e30)
        p = jnp.exp(s - lse_ref[0][:, :1])
        if thr == 0:  # rate == 0 (trace-time): no mask recompute
            return p, None
        keep = _keep_mask(seed_ref, i, qi, ki, bq, bk, s.shape, nqt, nkt,
                          nk_p, thr, hw_prng)
        return p, keep

    # ---- pass 1: dk, dv (grid: k tiles outer, q tiles inner)
    def kernel_dkv(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref,
                   dk_ref, dv_ref, dk_scr, dv_scr):
        i, ki, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(qi == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        p, keep = recompute(seed_ref, q_ref, k_ref, lse_ref, i, qi, ki)
        gb = g_ref[0].astype(odt)
        vb = v_ref[0].astype(odt)
        p_drop = p if keep is None else jnp.where(keep, p * inv_keep, 0.0)
        # dv[k, d] = sum_q p_drop[q, k] g[q, d]
        dv_scr[...] += jax.lax.dot_general(
            p_drop.astype(odt), gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - d_ref[0][:, :1])
        # dk[k, d] = sum_q ds[q, k] q[q, d] * scale
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(odt), q_ref[0].astype(odt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        @pl.when(qi == nqt - 1)
        def _final():
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

    dk, dvv = pl.pallas_call(
        kernel_dkv,
        grid=(b * h, nkt, nqt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dqk), lambda i, ki, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dqk), lambda i, ki, qi: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, ki, qi: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dv), lambda i, ki, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, ki, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, ki, qi: (i, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, dqk), lambda i, ki, qi: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, ki, qi: (i, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nk_p, dqk), q.dtype),
            jax.ShapeDtypeStruct((b * h, nk_p, dv), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dqk), jnp.float32),
            pltpu.VMEM((bk, dv), jnp.float32),
        ],
        interpret=interpret,
    )(sd, qf, kf, vf, gf, lse, dly)

    # ---- pass 2: dq (grid: q tiles outer, k tiles inner)
    def kernel_dq(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref,
                  dq_ref, dq_scr):
        i, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            dq_scr[...] = jnp.zeros_like(dq_scr)

        p, keep = recompute(seed_ref, q_ref, k_ref, lse_ref, i, qi, ki)
        gb = g_ref[0].astype(odt)
        vb = v_ref[0].astype(odt)
        dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - d_ref[0][:, :1])
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(odt), k_ref[0].astype(odt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        @pl.when(ki == nkt - 1)
        def _final():
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    dq = pl.pallas_call(
        kernel_dq,
        grid=(b * h, nqt, nkt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dqk), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dqk), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dv), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dqk), lambda i, qi, ki: (i, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, dqk), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dqk), jnp.float32)],
        interpret=interpret,
    )(sd, qf, kf, vf, gf, lse, dly)

    dq = dq[:, :nq].reshape(b, h, nq, dqk)
    dk = dk[:, :nk].reshape(b, h, nk, dqk)
    dvv = dvv[:, :nk].reshape(b, h, nk, dv)
    return dq, dk, dvv


@functools.partial(jax.jit, static_argnames=("scale", "rate", "block_q",
                                             "block_k", "interpret",
                                             "hw_prng", "f32_dots"))
def _dropout_flash_bwd1(q, k, v, seed, lse, dly, g, scale, rate, block_q=256,
                        block_k=512, interpret=False, hw_prng=False,
                        f32_dots=False):
    """Single-pass flash backward: dq, dk, dv in ONE grid sweep.

    The two-pass backward above recomputes s and dp twice (7 dots + 2 exp
    sweeps per (q-tile, k-tile) pair); this kernel computes them once
    (5 dots + 1 exp — 29% fewer contraction cycles) by carrying dq in a
    per-q-tile scratch (k innermost, flushed at ki==nkt-1, exactly like
    pass 2) while dk/dv accumulate into a persistent whole-K VMEM scratch
    (nk_p x d) that lives across the entire (qi, ki) sweep of each bh cell
    and is flushed through the dk/dv out blocks on the last q sweep.  The
    dk/dv out blocks are also stored on earlier sweeps (Pallas writes an out
    block whenever its index changes) — those stores carry garbage that the
    final qi sweep overwrites; the extra traffic is nqt*nk*d, ~0.1 ms/GB.
    Only legal when the (nk_p, d) scratches fit VMEM — _merged_bwd_fits
    gates it; larger shapes fall back to the two-pass kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dqk = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    bq = min(block_q, _ceil_to(nq, 8))
    bk = min(block_k, _ceil_to(nk, 128))
    nq_p, nk_p = _ceil_to(nq, bq), _ceil_to(nk, bk)
    qf = q.reshape(b * h, nq, dqk)
    kf = k.reshape(b * h, nk, dqk)
    vf = v.reshape(b * h, nk, dv)
    gf = g.reshape(b * h, nq, dv)
    if nq_p != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_p - nq), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, nq_p - nq), (0, 0)))
    if nk_p != nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_p - nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_p - nk), (0, 0)))
    nqt, nkt = nq_p // bq, nk_p // bk
    thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    inv_keep = 1.0 / (1.0 - rate)
    accounting.record("dropout_flash_bwd1",
                      2 * b * h * nq_p * nk_p * (3 * dqk + 2 * dv))
    sd = seed.reshape(1).astype(jnp.uint32)
    odt = jnp.float32 if f32_dots else q.dtype

    def kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref,
               dq_ref, dk_ref, dv_ref, dq_scr, dka_scr, dva_scr):
        i, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(ki == 0)
        def _init_q():
            dq_scr[...] = jnp.zeros_like(dq_scr)

        @pl.when(jnp.logical_and(qi == 0, ki == 0))
        def _init_kv():
            dka_scr[...] = jnp.zeros_like(dka_scr)
            dva_scr[...] = jnp.zeros_like(dva_scr)

        qb = q_ref[0].astype(odt)
        kb = k_ref[0].astype(odt)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk, s, -1e30)
        p = jnp.exp(s - lse_ref[0][:, :1])
        keep = None
        if thr > 0:
            keep = _keep_mask(seed_ref, i, qi, ki, bq, bk, s.shape, nqt,
                              nkt, nk_p, thr, hw_prng)

        gb = g_ref[0].astype(odt)
        vb = v_ref[0].astype(odt)
        p_drop = p if keep is None else jnp.where(keep, p * inv_keep, 0.0)
        ks = pl.dslice(ki * bk, bk)
        # dv[k, d] = sum_q p_drop[q, k] g[q, d]
        dva_scr[ks, :] += jax.lax.dot_general(
            p_drop.astype(odt), gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gb, vb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = p * (dp - d_ref[0][:, :1])
        # dk[k, d] = sum_q ds[q, k] q[q, d] * scale
        dka_scr[ks, :] += jax.lax.dot_general(
            ds.astype(odt), qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_scr[...] += jax.lax.dot_general(
            ds.astype(odt), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        @pl.when(ki == nkt - 1)
        def _flush_q():
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

        @pl.when(qi == nqt - 1)
        def _flush_kv():
            dk_ref[0] = dka_scr[ks, :].astype(dk_ref.dtype)
            dv_ref[0] = dva_scr[ks, :].astype(dv_ref.dtype)

    dq, dk, dvv = pl.pallas_call(
        kernel,
        grid=(b * h, nqt, nkt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dqk), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dqk), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dv), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dqk), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dqk), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dv), lambda i, qi, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq_p, dqk), q.dtype),
            jax.ShapeDtypeStruct((b * h, nk_p, dqk), q.dtype),
            jax.ShapeDtypeStruct((b * h, nk_p, dv), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dqk), jnp.float32),
            pltpu.VMEM((nk_p, dqk), jnp.float32),
            pltpu.VMEM((nk_p, dv), jnp.float32),
        ],
        interpret=interpret,
    )(sd, qf, kf, vf, gf, lse, dly)

    dq = dq[:, :nq].reshape(b, h, nq, dqk)
    dk = dk[:, :nk].reshape(b, h, nk, dqk)
    dvv = dvv[:, :nk].reshape(b, h, nk, dv)
    return dq, dk, dvv


def _merged_bwd_fits(nq, nk, dqk, dv, block_q, block_k):
    """The single-pass backward needs persistent (nk_p, d) f32 scratches;
    Mosaic pads the lane dim to 128, so budget with padded widths.  Keep the
    whole working set (scratches + the ~3 live (bq, bk) f32 score tiles)
    well under the ~16MB VMEM."""
    bq = min(block_q, _ceil_to(nq, 8))
    bk = min(block_k, _ceil_to(nk, 128))
    nk_p = _ceil_to(nk, bk)
    lane = lambda d: _ceil_to(d, 128)
    scratch = 4 * (nk_p * (lane(dqk) + lane(dv)) + bq * lane(dqk))
    tiles = 4 * 3 * bq * bk
    return scratch + tiles < 12 * 1024 * 1024


def _dfa_blocks(nq, nk):
    """Tile-size heuristic: Pallas grid-cell dispatch overhead (~1 us/cell)
    dominated the r4 CLTR kernels at (256, 512) tiles — 2048 fwd cells for
    (64, 2000, 2000).  Bigger tiles cut the cell count; the score tile
    (bq x bk x f32 x ~3 live copies) must stay well under VMEM.  The mask
    hash is a pure function of GLOBAL indices and nk_p, and forward/backward
    both derive their blocks from this same function, so the dropout
    pattern is identical across all three passes."""
    bq = 512 if nq >= 512 else None
    bk = 1024 if nk >= 1024 else None
    return bq or 256, bk or 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def dropout_flash_attention(q, k, v, seed, scale, rate, interpret=False,
                            f32_dots=None):
    """Fused train-mode attention with probs dropout, never materialising
    (Nq, Nk) in HBM.  seed: uint32 scalar array; identical seed regenerates
    identical masks (the VJP relies on this).  TPU only — callers fall back
    to the einsum path on CPU (nn raw_attention does this)."""
    bq, bk = _dfa_blocks(q.shape[2], k.shape[2])
    hw = (not interpret) and _use_pallas_default()
    out, _lse = _dropout_flash_fwd(q, k, v, seed, scale, rate,
                                   block_q=bq, block_k=bk,
                                   interpret=interpret, hw_prng=hw,
                                   f32_dots=_resolve_f32_dots(f32_dots))
    return out


def _dfa_fwd(q, k, v, seed, scale, rate, interpret, f32_dots):
    bq, bk = _dfa_blocks(q.shape[2], k.shape[2])
    hw = (not interpret) and _use_pallas_default()
    out, lse = _dropout_flash_fwd(q, k, v, seed, scale, rate,
                                  block_q=bq, block_k=bk,
                                  interpret=interpret, hw_prng=hw,
                                  f32_dots=_resolve_f32_dots(f32_dots))
    return out, (q, k, v, seed, out, lse)


def _dfa_bwd(scale, rate, interpret, f32_dots, res, g):
    q, k, v, seed, out, lse = res
    b, h, nq, _ = q.shape
    nq_p = lse.shape[1]
    d = jnp.einsum("bhqd,bhqd->bhq", g.astype(jnp.float32),
                   out.astype(jnp.float32)).reshape(b * h, nq)
    if nq_p != nq:
        d = jnp.pad(d, ((0, 0), (0, nq_p - nq)))
    d = jnp.broadcast_to(d[..., None], d.shape + (8,))  # match lse layout
    bq, bk = _dfa_blocks(nq, k.shape[2])
    hw = (not interpret) and _use_pallas_default()
    fits = _merged_bwd_fits(nq, k.shape[2], q.shape[3], v.shape[3], bq, bk)
    bwd = (_dropout_flash_bwd if (_BWD2_ENV or not fits)
           else _dropout_flash_bwd1)
    dq, dk, dv = bwd(q, k, v, seed, lse, d, g, scale, rate,
                     block_q=bq, block_k=bk,
                     interpret=interpret, hw_prng=hw,
                     f32_dots=_resolve_f32_dots(f32_dots))
    return dq, dk, dv, jnp.zeros_like(seed)


dropout_flash_attention.defvjp(_dfa_fwd, _dfa_bwd)
