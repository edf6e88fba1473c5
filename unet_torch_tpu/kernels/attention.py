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

import jax
import jax.numpy as jnp


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


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _attention_pallas(q, k, v, scale, bias=None, interpret=False):
    """Whole-sequence kernel.  ``bias``: optional (B, Nk) additive score bias
    (padding masks encode as -1e30 there), broadcast over heads/queries."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, dqk = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    qf = q.reshape(b * h, nq, dqk)
    kf = k.reshape(b * h, nk, dqk)
    vf = v.reshape(b * h, nk, dv)
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        qb = q_ref[0].astype(jnp.float32)
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0]
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + b_ref[0].astype(jnp.float32)[None, :]
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
        in_specs.append(pl.BlockSpec((1, nk), lambda i: (i // h, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
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
                                             "interpret"))
def _attention_flash(q, k, v, scale, bias=None, block_q=256, block_k=512,
                     interpret=False):
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

        qb = q_ref[0].astype(jnp.float32)
        kb = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + b_ref[0].astype(jnp.float32)[None, :]
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
        in_specs.append(pl.BlockSpec((1, bk), lambda i, j, ki: (i // h, ki),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_pallas_diff(q, k, v, scale, interpret):
    return _attention_pallas(q, k, v, scale, interpret=interpret)


def _attention_diff_fwd(q, k, v, scale, interpret):
    return _attention_pallas(q, k, v, scale, interpret=interpret), (q, k, v)


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


def _attention_diff_bwd(scale, interpret, res, g):
    """Pallas forward / einsum backward — pallas_call has no autodiff rule."""
    q, k, v = res
    return _einsum_bwd(q, k, v, g, scale)


_attention_pallas_diff.defvjp(_attention_diff_fwd, _attention_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_flash_diff(q, k, v, scale, interpret):
    return _attention_flash(q, k, v, scale, interpret=interpret)


def _attention_flash_fwd(q, k, v, scale, interpret):
    return _attention_flash(q, k, v, scale, interpret=interpret), (q, k, v)


_attention_flash_diff.defvjp(_attention_flash_fwd, _attention_diff_bwd)


def _masked_bwd(scale, interpret, res, g):
    q, k, v, bias = res
    dq, dk, dv = _einsum_bwd(q, k, v, g, scale, bias=bias)
    return dq, dk, dv, jnp.zeros_like(bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_masked_diff(q, k, v, bias, scale, interpret):
    return _attention_pallas(q, k, v, scale, bias=bias, interpret=interpret)


def _attention_masked_fwd(q, k, v, bias, scale, interpret):
    return (_attention_pallas(q, k, v, scale, bias=bias,
                              interpret=interpret), (q, k, v, bias))


_attention_masked_diff.defvjp(_attention_masked_fwd, _masked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_flash_masked_diff(q, k, v, bias, scale, interpret):
    return _attention_flash(q, k, v, scale, bias=bias, interpret=interpret)


def _attention_flash_masked_fwd(q, k, v, bias, scale, interpret):
    return (_attention_flash(q, k, v, scale, bias=bias,
                             interpret=interpret), (q, k, v, bias))


_attention_flash_masked_diff.defvjp(_attention_flash_masked_fwd, _masked_bwd)


def fused_attention(q, k, v, scale=None, key_padding_mask=None,
                    use_pallas=None, interpret=False):
    """q,k: (B,H,N,Dqk); v: (B,H,Nk,Dv) -> (B,H,Nq,Dv).

    Differentiable (custom VJP: Pallas forward, einsum backward).  Falls back
    to the einsum path when masked or on non-TPU backends.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
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
                                                interpret)
        return _attention_masked_diff(q, k, v, bias, float(scale), interpret)
    if flash:
        return _attention_flash_diff(q, k, v, float(scale), interpret)
    return _attention_pallas_diff(q, k, v, float(scale), interpret)
