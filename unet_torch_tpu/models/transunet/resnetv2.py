"""Pre-activation ResNetV2 hybrid backbone — Flax NHWC.

Capability parity with /root/reference/TransUnet/vit_seg_modeling_resnet_skip.py:
weight-standardised convs (StdConv2d :18-25), GroupNorm(32, eps 1e-6)
pre-activation bottlenecks (3,4,9 units; PreActBottleneck :38-74), 7x7/s2 root +
3x3/s2 VALID max-pool, and the skip features zero-padded to the expected sizes
(ResNetV2.forward :142-160).  Returns (bottleneck, [skip3, skip2, skip1]).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _s2d_conv7x7s2(x, kernel, dtype):
    """Evaluate a 7x7/stride-2/pad-3 conv as a space-to-depth 4x4/stride-1
    conv (the classic TPU stem rewrite).

    At C_in=3 the direct conv leaves most of the MXU contraction width idle
    (r8 profile: root fwd 9.9 GF in 1.38 ms = 7 TF/s, wgrad 12.7 TF/s); the
    rewrite contracts over 4*4*4C=48 instead of 7*7*C and shrinks the output
    grid 4x per tap.  It is the SAME multiply-add set, re-indexed: with the
    kernel zero-padded to 8x8 at the top-left, out[i] = sum_{u'=0..7}
    x[2i-4+u'] k8[u'], and u'=2a+b splits into a 4-tap conv (pad 2,1) over
    the 2x2 space-to-depth planes b.  Exact up to dot accumulation order
    (test_transunet.py::test_root_s2d_equivalence).
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k = (k8.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
         .reshape(4, 4, 4 * c, f))
    xs = (x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
          .reshape(b, h // 2, w // 2, 4 * c))
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), k.astype(dtype), (1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class StdConv(nn.Module):
    """Conv with weight standardisation over (H, W, I) per output channel —
    the NHWC/HWIO equivalent of StdConv2d's var over dims [1,2,3]."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: object = "SAME"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features))
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / jnp.sqrt(var + 1e-5)
        # flax freezes list attributes to tuples, so compare the NORMALISED
        # padding — `self.padding == [(3, 3), (3, 3)]` is always False in
        # here, which silently disabled this path through all of r4
        # (ADVICE r4; caught by the routing assertion in
        # tests/test_transunet.py::test_root_s2d_equivalence)
        pad_norm = (tuple(tuple(p) for p in self.padding)
                    if not isinstance(self.padding, str) else self.padding)
        if (tuple(self.kernel_size) == (7, 7)
                and tuple(self.strides) == (2, 2)
                and pad_norm == ((3, 3), (3, 3))
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and in_features <= 8
                and not os.environ.get("UNET_TPU_NO_ROOT_S2D")):
            # the low-C_in root: space-to-depth rewrite (same FMAs, 4x
            # better MXU packing; UNET_TPU_NO_ROOT_S2D=1 is the A/B control).
            # NB: the env var is read at FLAX TRACE TIME — a long-lived
            # jitted step silently keeps whichever branch was traced, so
            # flipping the env after compilation has no effect.  A/B
            # harnesses must build a fresh jitted step per arm (as
            # benchmarks/r9_s2d_ab.py does via fresh bench.tpu_transunet
            # calls).
            y = _s2d_conv7x7s2(x, kernel, self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.strides, padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class PreActBottleneck(nn.Module):
    cout: int
    cmid: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        needs_proj = self.stride != 1 or cin != self.cout

        residual = x
        if needs_proj:
            residual = StdConv(self.cout, (1, 1), (self.stride, self.stride),
                               padding="VALID", dtype=self.dtype,
                               name="downsample")(x)
            # reference uses GroupNorm(cout, cout) here (per-channel groups)
            residual = nn.GroupNorm(num_groups=self.cout, epsilon=1e-5,
                                    dtype=self.dtype, name="gn_proj")(residual)

        y = StdConv(self.cmid, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                               name="gn1")(y))
        y = StdConv(self.cmid, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                               name="gn2")(y))
        y = StdConv(self.cout, (1, 1), padding="VALID", dtype=self.dtype,
                    name="conv3")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                               name="gn3")(y)
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(64 * self.width_factor)
        b, in_size = x.shape[0], x.shape[1]
        x = StdConv(width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, name="root_conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="root_gn")(x)
        x = nn.relu(x)
        features = [x]
        # 3x3 stride-2 VALID max-pool (reference pads 0)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        stage_specs = [
            (width * 4, width, 1),
            (width * 8, width * 2, 2),
            (width * 16, width * 4, 2),
        ]
        for i, ((cout, cmid, stride), n_units) in enumerate(
                zip(stage_specs, self.block_units)):
            for u in range(1, n_units + 1):
                x = PreActBottleneck(
                    cout=cout, cmid=cmid, stride=stride if u == 1 else 1,
                    dtype=self.dtype, name=f"block{i + 1}_unit{u}")(x)
            if i < 2:
                # zero-pad the skip to the size the decoder expects
                # (ResNetV2.forward :150-158)
                right_size = int(in_size / 4 / (i + 1))
                if x.shape[1] != right_size:
                    pad = right_size - x.shape[1]
                    feat = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
                else:
                    feat = x
                features.append(feat)
        return x, features[::-1]
