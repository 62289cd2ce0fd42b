"""Faithful stand-ins for third-party modules the reference imports.

The reference code at /root/reference is pure torch, but imports torchvision
and kornia at module level — neither is baked into this image. This module
installs minimal, faithful reimplementations of ONLY the public third-party
building blocks the reference composes, so the REAL reference model code
(`trackertraincode.neuralnets.models` etc.) can be instantiated in-image for
cross-implementation parity tests:

 - `torchvision.models.mnasnet._InvertedResidual` (torchvision MNASNet block:
   1x1 expand -> BN/ReLU -> depthwise -> BN/ReLU -> 1x1 project -> BN,
   residual iff stride 1 and in_ch == out_ch), used by the reference
   LocalizerNet (`trackertraincode/neuralnets/models.py:35`).
 - `torchvision.models.resnet` BasicBlock / ResNet / _resnet / conv3x3 with
   torchvision's exact module naming (conv1, bn1, layer1.0..., downsample.0/1)
   so reference ResNetBackbone state dicts keep their key layout
   (`trackertraincode/backbones/resnet.py:31-104`).
 - `kornia.filters.kernels.get_pascal_kernel_2d` and
   `kornia.filters.blur_pool._blur_pool_by_kernel2d` (normalized binomial
   kernel; depthwise conv with zero padding (k-1)//2), used by the reference
   BlurPool2D (`trackertraincode/neuralnets/modelcomponents.py:187-205`).

These are reimplementations of the public upstream semantics, not copies of
anything under /root/reference. Call `install()` before importing
`trackertraincode`; it is a no-op for modules that are actually installed.
"""

from __future__ import annotations

import sys
import types
from typing import Callable, Optional

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_PATH = "/root/reference"


# ---------------------------------------------------------------- kornia ---


def get_pascal_kernel_1d(kernel_size: int, norm: bool = False) -> torch.Tensor:
    row = [1.0]
    for _ in range(kernel_size - 1):
        row = [a + b for a, b in zip([0.0] + row, row + [0.0])]
    k = torch.tensor(row, dtype=torch.float32)
    if norm:
        k = k / k.sum()
    return k


def get_pascal_kernel_2d(kernel_size, norm: bool = True) -> torch.Tensor:
    if isinstance(kernel_size, tuple):
        ky, kx = kernel_size
    else:
        ky = kx = int(kernel_size)
    a = get_pascal_kernel_1d(ky)
    b = get_pascal_kernel_1d(kx)
    k = a[:, None] * b[None, :]
    if norm:
        k = k / k.sum()
    return k


def _blur_pool_by_kernel2d(input: torch.Tensor, kernel: torch.Tensor, stride: int) -> torch.Tensor:
    # kernel: (C, 1, kh, kw); depthwise conv with zero padding (k-1)//2.
    padding = ((kernel.shape[-2] - 1) // 2, (kernel.shape[-1] - 1) // 2)
    return F.conv2d(input, kernel, padding=padding, stride=stride, groups=input.size(1))


# ------------------------------------------------------ torchvision mnasnet ---


class _InvertedResidual(nn.Module):
    """torchvision.models.mnasnet._InvertedResidual, public semantics."""

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        kernel_size: int,
        stride: int,
        expansion_factor: int,
        bn_momentum: float = 0.1,
    ) -> None:
        super().__init__()
        if stride not in (1, 2):
            raise ValueError(f"stride should be 1 or 2 instead of {stride}")
        if kernel_size not in (3, 5):
            raise ValueError(f"kernel_size should be 3 or 5 instead of {kernel_size}")
        mid_ch = in_ch * expansion_factor
        self.apply_residual = in_ch == out_ch and stride == 1
        self.layers = nn.Sequential(
            nn.Conv2d(in_ch, mid_ch, 1, bias=False),
            nn.BatchNorm2d(mid_ch, momentum=bn_momentum),
            nn.ReLU(inplace=True),
            nn.Conv2d(
                mid_ch, mid_ch, kernel_size, padding=kernel_size // 2, stride=stride,
                groups=mid_ch, bias=False,
            ),
            nn.BatchNorm2d(mid_ch, momentum=bn_momentum),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch, momentum=bn_momentum),
        )

    def forward(self, input: torch.Tensor) -> torch.Tensor:
        if self.apply_residual:
            return self.layers(input) + input
        return self.layers(input)


# ------------------------------------------------------ torchvision resnet ---


def conv3x3(in_planes: int, out_planes: int, stride: int = 1, groups: int = 1, dilation: int = 1) -> nn.Conv2d:
    return nn.Conv2d(
        in_planes, out_planes, kernel_size=3, stride=stride, padding=dilation,
        groups=groups, bias=False, dilation=dilation,
    )


def conv1x1(in_planes: int, out_planes: int, stride: int = 1) -> nn.Conv2d:
    return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion: int = 1

    def __init__(
        self,
        inplanes: int,
        planes: int,
        stride: int = 1,
        downsample: Optional[nn.Module] = None,
        groups: int = 1,
        base_width: int = 64,
        dilation: int = 1,
        norm_layer: Optional[Callable[..., nn.Module]] = None,
    ) -> None:
        super().__init__()
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if groups != 1 or base_width != 64:
            raise ValueError("BasicBlock only supports groups=1 and base_width=64")
        if dilation > 1:
            raise NotImplementedError("Dilation > 1 not supported in BasicBlock")
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = norm_layer(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = norm_layer(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        identity = x
        out = self.conv1(x)
        out = self.bn1(out)
        out = self.relu(out)
        out = self.conv2(out)
        out = self.bn2(out)
        if self.downsample is not None:
            identity = self.downsample(x)
        out = out + identity
        out = self.relu(out)
        return out


class ResNet(nn.Module):
    def __init__(
        self,
        block,
        layers,
        num_classes: int = 1000,
        zero_init_residual: bool = False,
        groups: int = 1,
        width_per_group: int = 64,
        replace_stride_with_dilation=None,
        norm_layer: Optional[Callable[..., nn.Module]] = None,
    ) -> None:
        super().__init__()
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.dilation = 1
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, self.inplanes, kernel_size=7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(self.inplanes)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2, dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2, dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2, dilate=replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
            elif isinstance(m, (nn.BatchNorm2d, nn.GroupNorm)):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)
        if zero_init_residual:
            for m in self.modules():
                if isinstance(m, BasicBlock) and m.bn2.weight is not None:
                    nn.init.constant_(m.bn2.weight, 0)

    def _make_layer(self, block, planes: int, blocks: int, stride: int = 1, dilate: bool = False):
        norm_layer = self._norm_layer
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                norm_layer(planes * block.expansion),
            )
        layers = [
            block(self.inplanes, planes, stride, downsample, self.groups, self.base_width,
                  previous_dilation, norm_layer)
        ]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(
                block(self.inplanes, planes, groups=self.groups, base_width=self.base_width,
                      dilation=self.dilation, norm_layer=norm_layer)
            )
        return nn.Sequential(*layers)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv1(x)
        x = self.bn1(x)
        x = self.relu(x)
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        x = self.fc(x)
        return x


def _resnet(block, layers, weights=None, progress: bool = True, **kwargs) -> ResNet:
    assert weights is None, "stub cannot download pretrained weights"
    return ResNet(block, layers, **kwargs)


def resnet18(weights=None, progress: bool = True, **kwargs) -> ResNet:
    return _resnet(BasicBlock, [2, 2, 2, 2], weights, progress, **kwargs)


class ResNet18_Weights:  # namespace placeholder; any access means a download
    DEFAULT = None


# ------------------------------------------- torchvision.transforms.functional ---


def tv_crop(img: torch.Tensor, top: int, left: int, height: int, width: int) -> torch.Tensor:
    """torchvision.transforms.functional.crop: out-of-bounds regions zero-padded."""
    h, w = img.shape[-2:]
    right, bottom = left + width, top + height
    if left < 0 or top < 0 or right > w or bottom > h:
        inner = img[..., max(int(top), 0) : bottom, max(int(left), 0) : right]
        pad_ltrb = [max(-int(left), 0), max(-int(top), 0), max(int(right - w), 0), max(int(bottom - h), 0)]
        return F.pad(inner, (pad_ltrb[0], pad_ltrb[2], pad_ltrb[1], pad_ltrb[3]), value=0.0)
    return img[..., top:bottom, left:right]


def tv_resize(img: torch.Tensor, size, interpolation=None, antialias: bool = True) -> torch.Tensor:
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    out = F.interpolate(img, size=tuple(int(s) for s in size), mode="bilinear",
                        align_corners=False, antialias=bool(antialias))
    return out[0] if squeeze else out


# ------------------------------------------------------- kornia.filters blur ---


def gaussian_blur2d(input: torch.Tensor, kernel_size, sigma, border_type: str = "reflect",
                    separable: bool = True) -> torch.Tensor:
    """kornia.filters.gaussian_blur2d: separable gaussian, padded per border_type."""
    ky, kx = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    sy, sx = (sigma, sigma) if not isinstance(sigma, (tuple, list)) else sigma

    def kern1d(k, s):
        x = torch.arange(k, dtype=torch.float32) - (k - 1) / 2.0
        g = torch.exp(-(x**2) / (2.0 * float(s) ** 2))
        return g / g.sum()

    B, C, H, W = input.shape
    mode = {"constant": "constant", "reflect": "reflect", "replicate": "replicate"}[border_type]
    x = F.pad(input, (kx // 2, kx // 2, ky // 2, ky // 2), mode=mode)
    kh = kern1d(ky, sy).view(1, 1, ky, 1).expand(C, 1, ky, 1)
    kw = kern1d(kx, sx).view(1, 1, 1, kx).expand(C, 1, 1, kx)
    x = F.conv2d(x, kh, groups=C)
    x = F.conv2d(x, kw, groups=C)
    return x


# ------------------------------------------------------------- torchmetrics ---


class Metric(nn.Module):
    """Single-process torchmetrics.Metric stand-in: add_state + update/compute."""

    def __init__(self, **kwargs):
        super().__init__()

    def add_state(self, name: str, default, dist_reduce_fx=None):
        setattr(self, name, default)

    def __call__(self, *args, **kwargs):
        return self.update(*args, **kwargs)


class MetricCollection(nn.Module):
    def __init__(self, metrics: dict):
        super().__init__()
        self.metrics = dict(metrics)

    def update(self, *args, **kwargs):
        for m in self.metrics.values():
            m.update(*args, **kwargs)

    def compute(self) -> dict:
        out = {}
        for name, m in self.metrics.items():
            r = m.compute()
            if isinstance(r, dict):
                out.update(r)
            else:
                out[name] = r
        return out


# ---------------------------------------------------------------- install ---


import contextlib


@contextlib.contextmanager
def patched_reference_bfm():
    """Fill the reference's DeformableHeadKeypoints buffers from our derived
    68-keypoint BFM subset.

    The reference's `bfm_noneck_v3.pkl` blob is git-LFS-missing in-image
    (`/root/reference/.MISSING_LARGE_BLOBS:2`), so the reference module cannot
    construct its keypoint model itself; the subset carries exactly the rows
    the reference would compute in `modelcomponents.py:59-68`.
    """
    import numpy as np
    import trackertraincode.neuralnets.modelcomponents as ref_mc

    from neuralnet_tracker_traincode_tpu.facemodel.bfm import BFMModel

    sub = BFMModel()
    orig = ref_mc.DeformableHeadKeypoints.__init__

    def patched(self, num_shape=40, num_expr=10):
        nn.Module.__init__(self)
        self.num_shape, self.num_expr = num_shape, num_expr
        self.num_eigvecs = num_shape + num_expr
        self.register_buffer("keypts", torch.from_numpy(np.asarray(sub.keypts)))
        self.register_buffer(
            "keyeigvecs", torch.from_numpy(np.asarray(sub.scaled_bases[: self.num_eigvecs]))
        )

    ref_mc.DeformableHeadKeypoints.__init__ = patched
    try:
        yield
    finally:
        ref_mc.DeformableHeadKeypoints.__init__ = orig


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install() -> None:
    """Install stub modules and put /root/reference on sys.path."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tvm = _module("torchvision.models")
        tv.models = tvm
        mnasnet = _module("torchvision.models.mnasnet")
        mnasnet._InvertedResidual = _InvertedResidual
        tvm.mnasnet = mnasnet
        resnet_mod = _module("torchvision.models.resnet")
        for obj in (BasicBlock, ResNet, conv3x3, conv1x1, _resnet, resnet18, ResNet18_Weights):
            setattr(resnet_mod, obj.__name__, obj)
        tvm.resnet = resnet_mod
        tvm.resnet18 = resnet18
        # efficientnet: import must succeed; instantiating one must not.
        eff = _module("torchvision.models.efficientnet")

        def _no_efficientnet(*a, **k):
            raise NotImplementedError("torchvision efficientnet is not stubbed")

        def _eff_getattr(name: str):
            if name.startswith("__"):
                raise AttributeError(name)
            return _no_efficientnet

        eff.__getattr__ = _eff_getattr
        tvm.efficientnet = eff

        # transforms.functional: crop/resize used by the reference torch warp path.
        tvt = _module("torchvision.transforms")
        tv.transforms = tvt

        class Compose:
            """torchvision.transforms.Compose public semantics."""

            def __init__(self, transforms):
                self.transforms = list(transforms)

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        tvt.Compose = Compose
        tvf = _module("torchvision.transforms.functional")
        tvf.crop = tv_crop
        tvf.resize = tv_resize
        tvt.functional = tvf

    if "pytorch_lightning" not in sys.modules:
        # Import-only stand-in so `trackertraincode.train` and the reference
        # training script can be imported for loss/criterion parity tests.
        # Nothing here runs a Lightning loop.
        pl = _module("pytorch_lightning")

        class LightningModule(nn.Module):
            def log(self, *a, **k):
                pass

            current_epoch = 0

        class Callback:
            pass

        class Trainer:
            def __init__(self, *a, **k):
                raise NotImplementedError("pytorch_lightning Trainer is not stubbed")

        pl.LightningModule = LightningModule
        pl.Callback = Callback
        pl.Trainer = Trainer
        cbs = _module("pytorch_lightning.callbacks")
        cbs.Callback = Callback

        class ModelCheckpoint(Callback):
            def __init__(self, *a, **k):
                pass

        cbs.ModelCheckpoint = ModelCheckpoint
        pl.callbacks = cbs

    if "torchmetrics" not in sys.modules:
        tm = _module("torchmetrics")
        tm.Metric = Metric
        tm.MetricCollection = MetricCollection

    if "strenum" not in sys.modules:
        import enum

        strenum = _module("strenum")
        strenum.StrEnum = enum.StrEnum

    if "kornia" not in sys.modules:
        kornia = _module("kornia")
        filters = _module("kornia.filters")
        kornia.filters = filters
        kernels = _module("kornia.filters.kernels")
        kernels.get_pascal_kernel_2d = get_pascal_kernel_2d
        kernels.get_pascal_kernel_1d = get_pascal_kernel_1d
        filters.kernels = kernels
        blur_pool = _module("kornia.filters.blur_pool")
        blur_pool._blur_pool_by_kernel2d = _blur_pool_by_kernel2d
        filters.blur_pool = blur_pool
        filters.gaussian_blur2d = gaussian_blur2d

        # kornia.augmentation: import-only dummies so the reference intensity
        # module can be imported; instantiating any of these raises. Crop/warp
        # parity tests never construct them.
        aug = _module("kornia.augmentation")
        kornia.augmentation = aug

        def _make_dummy(name):
            def _init(self, *a, **k):
                raise NotImplementedError(f"kornia.augmentation.{name} is not stubbed")

            return type(name, (object,), {"__init__": _init})

        for name in (
            "ColorJiggle ColorJitter RandomBoxBlur RandomPlasmaBrightness "
            "RandomPlasmaContrast RandomPlasmaShadow RandomGaussianBlur "
            "RandomSolarize RandomInvert RandomPosterize RandomGamma "
            "RandomEqualize AugmentationSequential RandomGaussianNoise "
            "RandomContrast RandomBrightness IntensityAugmentationBase2D"
        ).split():
            setattr(aug, name, _make_dummy(name))
