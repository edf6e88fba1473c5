"""Functional torchvision stand-in so the reference CLTR code can run on CPU
for baseline measurement (torchvision is not installed in this image).

Provides the standard, publicly documented ResNet-50 architecture (He et al.
2015 / the torchvision layout the reference's state_dict keys assume),
IntermediateLayerGetter, and box_area — our own implementations, no
torchvision code.  `pretrained=True` is accepted but returns random init
(zero-egress image); throughput baselines don't need trained weights.
"""

from __future__ import annotations

import sys
import types


def _build_modules():
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     dilation=1, norm_layer=nn.BatchNorm2d):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = norm_layer(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=dilation, dilation=dilation,
                                   bias=False)
            self.bn2 = norm_layer(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = norm_layer(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3), num_classes=1000,
                     replace_stride_with_dilation=None,
                     norm_layer=nn.BatchNorm2d, zero_init_residual=False):
            super().__init__()
            if replace_stride_with_dilation is None:
                replace_stride_with_dilation = [False, False, False]
            self._norm_layer = norm_layer
            self.inplanes = 64
            self.dilation = 1
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(
                128, layers[1], 2, replace_stride_with_dilation[0])
            self.layer3 = self._make_layer(
                256, layers[2], 2, replace_stride_with_dilation[1])
            self.layer4 = self._make_layer(
                512, layers[3], 2, replace_stride_with_dilation[2])
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * 4, num_classes)

        def _make_layer(self, planes, blocks, stride=1, dilate=False):
            norm_layer = self._norm_layer
            downsample = None
            prev_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    norm_layer(planes * 4))
            layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                                 prev_dilation, norm_layer)]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(Bottleneck(self.inplanes, planes,
                                         dilation=self.dilation,
                                         norm_layer=norm_layer))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def resnet50(pretrained=False, replace_stride_with_dilation=None,
                 norm_layer=None, **kw):
        import torchvision_stub as _self  # resolved at call time
        return ResNet(
            getattr(_self, "LAYERS", (3, 4, 6, 3)),
            replace_stride_with_dilation=replace_stride_with_dilation,
            norm_layer=norm_layer or nn.BatchNorm2d)

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = dict(return_layers)
            layers = {}
            remaining = dict(orig)
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    return resnet50, IntermediateLayerGetter, box_area


# Experiment knob: parity/detection runs can shrink the backbone on BOTH
# frameworks identically (set torchvision_stub.LAYERS = (1,1,1,1) before
# buildCLTR; our side mirrors via cltr_config backbone_layers).
LAYERS = (3, 4, 6, 3)


def install():
    """Install a functional `torchvision` module tree into sys.modules.
    Idempotent; replaces any bare placeholder stub."""
    existing = sys.modules.get("torchvision")
    if existing is not None and hasattr(existing, "models") and hasattr(
            existing.models, "resnet50"):
        return existing
    resnet50, IntermediateLayerGetter, box_area = _build_modules()

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    models = types.ModuleType("torchvision.models")
    models.resnet50 = resnet50
    utils = types.ModuleType("torchvision.models._utils")
    utils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = utils
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.box_area = box_area
    misc_mod = types.ModuleType("torchvision.ops.misc")
    ops.boxes = boxes_mod
    ops.misc = misc_mod
    # transforms stand-in: the reference eval scripts import
    # `torchvision.transforms` / `transforms.functional as TF` at module
    # level but the accumulator classes under test never call them — a
    # ToTensor good enough for the preprocess() path is provided anyway.
    transforms = types.ModuleType("torchvision.transforms")

    class ToTensor:
        def __call__(self, pic):
            import numpy as _np

            import torch as _torch

            arr = _np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return _torch.from_numpy(arr.astype(_np.float32) / 255.0)

    transforms.ToTensor = ToTensor

    def _compose(fns, x):
        for f in fns:
            x = f(x)
        return x

    transforms.Compose = lambda fns: (lambda x: _compose(fns, x))
    tf_functional = types.ModuleType("torchvision.transforms.functional")
    transforms.functional = tf_functional
    tv.transforms = transforms
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tf_functional

    tv.models = models
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = utils
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    sys.modules["torchvision.ops.misc"] = misc_mod
    return tv
