"""CLTR backbone — ResNet-50 with frozen BatchNorm, Flax NHWC.

Capability parity with /root/reference/CLTR/backbone.py: torchvision resnet50
wrapped with FrozenBatchNorm2d (:26-62), stem+layer1 parameters frozen
(:68-71), 1/32 feature map out (2048 channels).

TPU notes: frozen BN is an affine map with constant statistics — the four
tensors live in the ``batch_stats`` collection (like torch buffers: excluded
from the optimizer), so the whole backbone compiles to pure conv+mul+add and
XLA folds the affine into the adjacent conv.  Pretrained ImageNet weights are
not bundled (zero-egress image); weights initialise randomly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params (ref :26-62)."""

    features: int

    @nn.compact
    def __call__(self, x):
        weight = self.variable("batch_stats", "weight",
                               lambda: jnp.ones(self.features)).value
        bias = self.variable("batch_stats", "bias",
                             lambda: jnp.zeros(self.features)).value
        mean = self.variable("batch_stats", "running_mean",
                             lambda: jnp.zeros(self.features)).value
        var = self.variable("batch_stats", "running_var",
                            lambda: jnp.ones(self.features)).value
        scale = weight / jnp.sqrt(var + 1e-5)
        # cast the per-channel affine to the activation dtype so bf16 compute
        # is not silently promoted to f32 (stats stay f32)
        return x * scale.astype(x.dtype) + (bias - mean * scale).astype(x.dtype)


class Bottleneck(nn.Module):
    features: int  # mid width; out = features * 4
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.features, name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.features * 4,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """torchvision-layout ResNet-50 trunk returning the layer4 (1/32) map.

    ``return_interm=True`` additionally returns the layer1..layer3 maps (the
    FPN features DETRsegm consumes — ref backbone.py return_interm_layers)."""

    dtype: jnp.dtype = jnp.float32
    layers: Sequence[int] = (3, 4, 6, 3)
    return_interm: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        # torch MaxPool2d(3, 2, padding=1): pad with -inf so padding never wins
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        widths = (64, 128, 256, 512)
        interm = []
        for li, (w, n) in enumerate(zip(widths, self.layers), start=1):
            for b in range(n):
                stride = 2 if (b == 0 and li > 1) else 1
                x = Bottleneck(w, strides=stride, downsample=(b == 0),
                               dtype=self.dtype,
                               name=f"layer{li}_block{b}")(x)
            interm.append(x)
        if self.return_interm:
            return tuple(interm)  # layer1..layer4, NHWC
        return x  # (B, H/32, W/32, 2048)


def backbone_freeze_mask(params_subtree) -> dict:
    """Trainability mask for the backbone params: False (frozen) for the stem
    and layer1 (BackboneBase freezing, ref :68-71), True elsewhere."""

    def trainable(path, _leaf):
        keys = [getattr(p, "key", "") for p in path]
        return not any(k == "conv1" or k.startswith("layer1_") for k in keys)

    return jax.tree_util.tree_map_with_path(trainable, params_subtree)
