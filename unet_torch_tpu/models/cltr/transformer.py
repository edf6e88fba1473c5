"""Conditional-DETR transformer — Flax, batch-first (B, N, C).

Capability parity with /root/reference/CLTR/transformer.py: 6-enc/6-dec
conditional DETR where the decoder separates content and positional q/k
projections, concatenates sine-embedded reference points per head (cross-attn
runs at d_model*2), modulates via a query_scale MLP, and returns stacked
intermediate decoder states + reference points (:122-179, :242-357).

The reference's vendored MultiheadAttention (attention.py:166-373) strips the
input projections and supports vdim != embed_dim; here that is `RawAttention`
(pre-projected q/k/v, per-head scaled dot on the MXU, out proj at vdim).
Token tensors are batch-first throughout — the torch code's (N, B, C) layout
is a CPU-era convention; (B, N, C) keeps the matmuls contiguous for XLA.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_torch_tpu.nn.blocks import TPUDropout

from unet_torch_tpu.models.cltr.position_encoding import (
    gen_sineembed_for_position,
)

xavier_uniform = nn.initializers.xavier_uniform()


def _use_dropout_kernel() -> bool:
    # single source of truth for kernel-vs-einsum routing: the same
    # predicate the rest of the kernel family uses
    from unet_torch_tpu.kernels.attention import _use_pallas_default

    return _use_pallas_default()


def _dense(features, name, dtype=jnp.float32):
    return nn.Dense(features, kernel_init=xavier_uniform, name=name,
                    dtype=dtype)


class MLP(nn.Module):
    """ref transformer.py:21-33 — ReLU MLP."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    last_zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            feats = self.output_dim if is_last else self.hidden_dim
            init = (nn.initializers.zeros if (is_last and self.last_zero_init)
                    else xavier_uniform)
            bias_init = nn.initializers.zeros
            x = nn.Dense(feats, kernel_init=init, bias_init=bias_init,
                         name=f"layer{i}", dtype=self.dtype)(x)
            if not is_last:
                x = nn.relu(x)
        return x


def raw_attention(q, k, v, num_heads, key_padding_mask=None,
                  dropout_rate=0.0, dropout_rng=None):
    """Pre-projected multi-head attention (attention.py:265-267,342-366):
    q,k (B,Nq/Nk,E); v (B,Nk,V); scale 1/sqrt(E/heads); returns (B,Nq,V).

    Routed through the fused Pallas attention kernel when dropout-free.  The
    training path (attention-probs dropout, ref attention.py:355) is a
    remat-wrapped mixed-precision einsum: scores in bf16 with f32
    accumulation, f32 softmax, probs cast bf16, explicit bernoulli mask from
    the captured rng (replayed identically on recompute) — so the
    (B,h,Nq,Nk) probs/mask are never stored for the backward.  Before this,
    the 2000-query decoder self-attention materialised six f32
    (8,8,2000,2000) score tensors per direction: ~100 ms of the 196 ms CLTR
    b8 step (r3 profile)."""
    from unet_torch_tpu.kernels.attention import fused_attention

    b, nq, e = q.shape
    nk = k.shape[1]
    vd = v.shape[-1]
    hd = e // num_heads
    vhd = vd // num_heads
    qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, num_heads, vhd).transpose(0, 2, 1, 3)
    if dropout_rng is None or dropout_rate == 0.0:
        out = fused_attention(qh, kh, vh, scale=hd ** -0.5,
                              key_padding_mask=key_padding_mask)
    elif key_padding_mask is None and _use_dropout_kernel():
        # Pallas dropout-flash kernel: probs dropout applied inside the
        # tiled kernel (counter-hash mask regenerated in the flash
        # backward), so the (B,h,Nq,Nk) probs/bits/mask tensors never touch
        # HBM.  The r4 profile put ~110 of 132 ms of the CLTR b8 step into
        # exactly those tensors across the 6 decoder self-attentions.
        from unet_torch_tpu.kernels.attention import dropout_flash_attention

        seed = jax.random.bits(dropout_rng, dtype=jnp.uint32)
        out = dropout_flash_attention(qh, kh, vh, seed, hd ** -0.5,
                                      float(dropout_rate))
    else:
        # Compute in the model's activation dtype (f32 softmax either way) —
        # casting f32 activations down to bf16 here would silently diverge
        # train numerics from the dtype-preserving fused eval path.  The
        # bf16 fast path engages when the model itself runs bf16.
        cdt = q.dtype

        @jax.checkpoint
        def attn(qh, kh, vh):
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", qh.astype(cdt), kh.astype(cdt),
                preferred_element_type=jnp.float32) * (hd ** -0.5)
            if key_padding_mask is not None:
                scores = jnp.where(key_padding_mask[:, None, None, :],
                                   -jnp.inf, scores)
            probs = jax.nn.softmax(scores, axis=-1).astype(cdt)
            # hardware rng-bit-generator for the (B,h,Nq,Nk) mask: threefry
            # costs ~6 ms per attention at 2000x2000 on TPU (r3 profile — it,
            # not the matmuls, dominated the old dropout path)
            from unet_torch_tpu.nn.blocks import rbg_key
            keep = jax.random.bernoulli(rbg_key(dropout_rng),
                                        1.0 - dropout_rate, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - dropout_rate),
                              jnp.zeros((), cdt))
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh.astype(cdt),
                             preferred_element_type=jnp.float32)
            return out.astype(v.dtype)

        out = attn(qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, vd)


class RawAttention(nn.Module):
    """Vendored-MHA equivalent: only the output projection is learned."""

    embed_dim: int
    num_heads: int
    vdim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, train: bool, key_padding_mask=None):
        rng = (self.make_rng("dropout")
               if train and self.dropout_rate else None)
        out = raw_attention(q.astype(self.dtype), k.astype(self.dtype),
                            v.astype(self.dtype), self.num_heads,
                            key_padding_mask,
                            dropout_rate=self.dropout_rate, dropout_rng=rng)
        return _dense(self.vdim, "out_proj", self.dtype)(out)


class FullAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (q/k/v + out projections) —
    used by the encoder self-attention (ref :187)."""

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, train: bool, key_padding_mask=None):
        qp = _dense(self.embed_dim, "q_proj", self.dtype)(q)
        kp = _dense(self.embed_dim, "k_proj", self.dtype)(k)
        vp = _dense(self.embed_dim, "v_proj", self.dtype)(v)
        rng = (self.make_rng("dropout")
               if train and self.dropout_rate else None)
        out = raw_attention(qp, kp, vp, self.num_heads, key_padding_mask,
                            dropout_rate=self.dropout_rate, dropout_rng=rng)
        return _dense(self.embed_dim, "out_proj", self.dtype)(out)


class TransformerEncoderLayer(nn.Module):
    """ref :182-239 (post-norm path)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, *, train: bool, key_padding_mask=None):
        drop = lambda name: TPUDropout(self.dropout_rate,
                                       deterministic=not train)
        norm = lambda name: nn.LayerNorm(epsilon=1e-5,
                                         use_fast_variance=False,
                                         dtype=self.dtype, name=name)
        src = src.astype(self.dtype)
        q = k = src + pos.astype(self.dtype)
        src2 = FullAttention(self.d_model, self.nhead, self.dropout_rate,
                             dtype=self.dtype, name="self_attn")(
            q, k, src, train=train, key_padding_mask=key_padding_mask)
        src = norm("norm1")(src + drop("d1")(src2))
        src2 = _dense(self.dim_feedforward, "linear1", self.dtype)(src)
        src2 = drop("d")(nn.relu(src2))
        src2 = _dense(self.d_model, "linear2", self.dtype)(src2)
        return norm("norm2")(src + drop("d2")(src2))


class TransformerDecoderLayer(nn.Module):
    """ref :242-357 — separated content/positional projections; cross-attn at
    d_model*2 via per-head concat of content and sine-position halves."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    has_ca_qpos_proj: bool = True  # only the first layer keeps it (ref :132-133)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, query_sine_embed,
                 is_first: bool, *, train: bool, key_padding_mask=None):
        d = self.d_model
        dt = self.dtype
        drop = lambda: TPUDropout(self.dropout_rate, deterministic=not train)
        norm = lambda name: nn.LayerNorm(epsilon=1e-5,
                                         use_fast_variance=False,
                                         dtype=dt, name=name)
        tgt = tgt.astype(dt)

        # ---- self-attention (ref :294-314)
        q = _dense(d, "sa_qcontent_proj", dt)(tgt) + _dense(
            d, "sa_qpos_proj", dt)(query_pos)
        k = _dense(d, "sa_kcontent_proj", dt)(tgt) + _dense(
            d, "sa_kpos_proj", dt)(query_pos)
        v = _dense(d, "sa_v_proj", dt)(tgt)
        tgt2 = RawAttention(d, self.nhead, d, self.dropout_rate, dtype=dt,
                            name="self_attn")(q, k, v, train=train)
        tgt = norm("norm1")(tgt + drop()(tgt2))

        # ---- cross-attention (ref :316-349)
        q_content = _dense(d, "ca_qcontent_proj", dt)(tgt)
        k_content = _dense(d, "ca_kcontent_proj", dt)(memory)
        v = _dense(d, "ca_v_proj", dt)(memory)
        k_pos = _dense(d, "ca_kpos_proj", dt)(pos)
        if is_first and self.has_ca_qpos_proj:
            q = q_content + _dense(d, "ca_qpos_proj", dt)(query_pos)
            k = k_content + k_pos
        else:
            q = q_content
            k = k_content

        b, nq, _ = q.shape
        hw = k.shape[1]
        hd = d // self.nhead
        qse = _dense(d, "ca_qpos_sine_proj", dt)(query_sine_embed)
        q = jnp.concatenate([q.reshape(b, nq, self.nhead, hd),
                             qse.reshape(b, nq, self.nhead, hd)],
                            axis=3).reshape(b, nq, d * 2)
        k = jnp.concatenate([k.reshape(b, hw, self.nhead, hd),
                             k_pos.reshape(b, hw, self.nhead, hd)],
                            axis=3).reshape(b, hw, d * 2)
        tgt2 = RawAttention(d * 2, self.nhead, d, self.dropout_rate, dtype=dt,
                            name="cross_attn")(
            q, k, v, train=train, key_padding_mask=key_padding_mask)
        tgt = norm("norm2")(tgt + drop()(tgt2))

        # ---- FFN (ref :354-357)
        tgt2 = _dense(self.dim_feedforward, "linear1", dt)(tgt)
        tgt2 = drop()(nn.relu(tgt2))
        tgt2 = _dense(self.d_model, "linear2", dt)(tgt2)
        return norm("norm3")(tgt + drop()(tgt2))


class Transformer(nn.Module):
    """ref :52-95 — returns (hs (L,B,Q,D), reference_points (B,Q,2))."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    # also return the encoder memory reshaped to (B, H, W, D) — used by the
    # panoptic mask head (segmentation.py DETRsegm)
    return_memory: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, query_embed, pos_embed, *, train: bool):
        b, h, w, c = src.shape
        src = src.reshape(b, h * w, c)
        pos = pos_embed.reshape(b, h * w, -1).astype(self.dtype)
        mask_flat = mask.reshape(b, h * w) if mask is not None else None
        query_pos = jnp.broadcast_to(query_embed[None],
                                     (b, *query_embed.shape)
                                     ).astype(self.dtype)

        memory = src
        for i in range(self.num_encoder_layers):
            memory = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, dtype=self.dtype,
                name=f"encoder_layer{i}")(
                memory, pos, train=train, key_padding_mask=mask_flat)

        # decoder (ref :122-179).  The reference-point head stays f32 —
        # its sigmoid output parameterises point positions.
        ref_before_sigmoid = MLP(self.d_model, 2, 2, name="ref_point_head")(
            query_pos.astype(jnp.float32))
        reference_points = jax.nn.sigmoid(ref_before_sigmoid)  # (B, Q, 2)
        query_scale = MLP(self.d_model, self.d_model, 2, dtype=self.dtype,
                          name="query_scale")

        output = jnp.zeros_like(query_pos)
        intermediate = []
        norm = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                            dtype=self.dtype, name="decoder_norm")
        for i in range(self.num_decoder_layers):
            pos_transformation = 1.0 if i == 0 else query_scale(output)
            query_sine_embed = (gen_sineembed_for_position(
                reference_points, self.d_model).astype(self.dtype)
                * pos_transformation)
            output = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout_rate, has_ca_qpos_proj=(i == 0),
                dtype=self.dtype, name=f"decoder_layer{i}")(
                output, memory, pos, query_pos, query_sine_embed,
                is_first=(i == 0), train=train,
                key_padding_mask=mask_flat)
            intermediate.append(norm(output))

        hs = jnp.stack(intermediate)  # (L, B, Q, D)
        if self.return_memory:
            return hs, reference_points, memory.reshape(b, h, w, c)
        return hs, reference_points
