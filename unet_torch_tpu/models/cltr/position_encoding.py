"""Positional encodings for the CLTR transformer (NHWC, batch-first).

Parity with /root/reference/CLTR/position_encoding.py: sine 2D with
cumsum-of-mask normalisation (:20-57) and learned row/col embeddings (:60-86).
Returns (B, H, W, C) channel-last maps.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def sine_position_embedding(mask, num_pos_feats=128, temperature=10000,
                            normalize=True, scale=2 * math.pi):
    """mask: (B, H, W) bool, True on padded pixels.  Returns (B,H,W,2*feats)."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=4).reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=4).reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)


class PositionEmbeddingLearned(nn.Module):
    """Learned 50x50 row/col embeddings (ref :60-86)."""

    num_pos_feats: int = 256

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        row = nn.Embed(50, self.num_pos_feats,
                       embedding_init=nn.initializers.uniform(1.0),
                       name="row_embed")(jnp.arange(h))
        col = nn.Embed(50, self.num_pos_feats,
                       embedding_init=nn.initializers.uniform(1.0),
                       name="col_embed")(jnp.arange(w))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (h, w, self.num_pos_feats)),
            jnp.broadcast_to(row[:, None, :], (h, w, self.num_pos_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None], (b, h, w, 2 * self.num_pos_feats))


def gen_sineembed_for_position(pos_tensor, d_model: int = 256):
    """(B, Q, 2) normalised xy -> (B, Q, d_model) sine embedding
    (ref transformer.py:36-49; the reference hardcodes d_model=256)."""
    half = d_model // 2
    scale = 2 * math.pi
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / half)
    x_embed = pos_tensor[:, :, 0] * scale
    y_embed = pos_tensor[:, :, 1] * scale
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=3).reshape(*pos_x.shape[:2], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=3).reshape(*pos_y.shape[:2], -1)
    return jnp.concatenate([pos_y, pos_x], axis=2)
