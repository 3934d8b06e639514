"""ResNet backbones (18/34/50/101/152) with the v1c deep stem — NHWC Flax
rebuild of reference ``furnace/base_model/resnet.py``.

Differences from the reference are structural, not behavioral:
  * feature layout NHWC (TPU-native) instead of NCHW;
  * the PSPNet/PSANet/DFN "dilation surgery" (reference
    model/pspnet/*/network.py:62-72 ``_nostride_dilate``) is expressed as
    constructor arguments (``layer_strides`` / ``layer_dilations``) instead of
    in-place module mutation — same receptive fields, static graph;
  * returns a tuple of the four stage feature maps
    (reference resnet.py:168-184).

Param tree mirrors torch naming (conv1/bn1/layer1..4/<i>/conv1..) so torch
checkpoints graft directly via utils/torch_convert.py.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import NormFactory, default_norm
from ..ops.maxpool import stem_pool
from ..ops.s2d import S2DConv, use_s2d
from ..utils.init import torch_default_kernel_init


def _conv(
    out_ch, ksize, stride=1, dilation=1, name=None, dtype=None
):
    pad = dilation * (ksize - 1) // 2
    return nn.Conv(
        out_ch,
        (ksize, ksize),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        kernel_init=torch_default_kernel_init,
        dtype=dtype,
        name=name,
    )


def _stem_conv(x, out_ch, ksize, stride, name, dtype):
    """Stem conv: dispatch the tiny-C stride-2 case to the exact
    space-to-depth formulation (ops/s2d.py) — same 'kernel' param path."""
    if (
        use_s2d(x.shape[-1], stride, ksize)
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        return S2DConv(
            out_ch,
            ksize,
            kernel_init=torch_default_kernel_init,
            dtype=dtype,
            name=name,
        )(x)
    return _conv(out_ch, ksize, stride, 1, name, dtype)(x)


class BasicBlock(nn.Module):
    """Two 3x3 convs (reference resnet.py:17-53). expansion = 1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1  # dilation of conv1 (the possibly-strided conv)
    has_downsample: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: self.norm(dtype=self.dtype, name=name)
        residual = x
        out = _conv(
            self.planes, 3, self.stride, self.first_dilation, "conv1", self.dtype
        )(x)
        out = norm("bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, "conv2", self.dtype)(out)
        out = norm("bn2")(out, use_running_average=not train)
        if self.has_downsample:
            residual = _conv(self.planes, 1, self.stride, 1, "downsample_conv",
                             self.dtype)(x)
            residual = norm("downsample_bn")(
                residual, use_running_average=not train
            )
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (reference resnet.py:56-103).
    expansion = 4; the stride and dilation live on the 3x3 conv2."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1  # dilation of conv2 in this block
    has_downsample: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: self.norm(dtype=self.dtype, name=name)
        residual = x
        out = _conv(self.planes, 1, 1, 1, "conv1", self.dtype)(x)
        out = norm("bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(
            self.planes, 3, self.stride, self.first_dilation, "conv2", self.dtype
        )(out)
        out = norm("bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, 1, "conv3", self.dtype)(out)
        out = norm("bn3")(out, use_running_average=not train)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, 1,
                             "downsample_conv", self.dtype)(x)
            residual = norm("downsample_bn")(
                residual, use_running_average=not train
            )
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Multi-stage feature extractor.

    ``layer_dilations[i] > 1`` converts stage i to stride-1 dilated convs with
    the reference's exact pattern: the first block's 3x3 conv gets
    ``dilation // 2`` (its stride-2 conv becomes stride 1) and every later
    block gets the full dilation — the static-graph equivalent of
    ``_nostride_dilate``.
    """

    block_cls: type
    layers: Sequence[int]
    deep_stem: bool = False
    stem_width: int = 32
    layer_strides: Sequence[int] = (1, 2, 2, 2)
    layer_dilations: Sequence[int] = (1, 1, 1, 1)
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None
    remat: bool = False  # jax.checkpoint each block (activation recompute)

    @nn.compact
    def __call__(
        self, x, train: bool = False, stem_features=None,
        stem_pooled=None,
    ) -> Tuple[jnp.ndarray, ...]:
        """stem_features: precomputed post-stem (post conv1/bn1/relu, pre
        maxpool) activations; stem_pooled: post-maxpool activations — the
        deploy-time fused-stem path (deploy/fused_stem.py) computes these
        jointly with other stems."""
        norm = lambda name: self.norm(dtype=self.dtype, name=name)
        if stem_pooled is not None:
            x = stem_pooled
        elif stem_features is not None:
            x = stem_features
        else:
            if self.deep_stem:
                # v1c stem: three 3x3 convs (reference resnet.py:110-126)
                x = _stem_conv(x, self.stem_width, 3, 2, "stem_conv1",
                               self.dtype)
                x = norm("stem_bn1")(x, use_running_average=not train)
                x = nn.relu(x)
                x = _conv(self.stem_width, 3, 1, 1, "stem_conv2",
                          self.dtype)(x)
                x = norm("stem_bn2")(x, use_running_average=not train)
                x = nn.relu(x)
                x = _conv(self.stem_width * 2, 3, 1, 1, "stem_conv3",
                          self.dtype)(x)
            else:
                x = _stem_conv(x, 64, 7, 2, "conv1", self.dtype)
            x = norm("bn1")(x, use_running_average=not train)
            x = nn.relu(x)
        if stem_pooled is None:
            x = stem_pool(x)

        inplanes = self.stem_width * 2 if self.deep_stem else 64
        planes = (64, 128, 256, 512)
        # trade FLOPs for HBM: recompute block activations in the backward
        # pass (jax.checkpoint; replaces torch.utils.checkpoint imports in the
        # reference networks)
        block_cls = (
            nn.remat(self.block_cls, static_argnums=(2,))
            if self.remat
            else self.block_cls
        )
        feats = []
        for li in range(4):
            stride = self.layer_strides[li]
            dilation = self.layer_dilations[li]
            first_dilation = max(dilation // 2, 1) if dilation > 1 else 1
            for bi in range(self.layers[li]):
                is_first = bi == 0
                # reference resnet.py:146-152 — projection shortcut when the
                # first block changes stride or channel count (a dilated
                # stage keeps its projection: channels still change).
                has_ds = is_first and (
                    stride != 1
                    or inplanes != planes[li] * self.block_cls.expansion
                )
                x = block_cls(
                    planes[li],
                    stride=stride if is_first else 1,
                    dilation=dilation,
                    first_dilation=first_dilation if is_first else dilation,
                    has_downsample=has_ds,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
                if is_first:
                    inplanes = planes[li] * self.block_cls.expansion
            feats.append(x)
        return tuple(feats)


def _make(block_cls, layers):
    def ctor(
        norm: NormFactory = default_norm,
        deep_stem: bool = False,
        stem_width: int = 64,
        layer_strides: Sequence[int] = (1, 2, 2, 2),
        layer_dilations: Sequence[int] = (1, 1, 1, 1),
        dtype=None,
        remat: bool = False,
    ) -> ResNet:
        return ResNet(
            block_cls=block_cls,
            layers=layers,
            deep_stem=deep_stem,
            stem_width=stem_width,
            layer_strides=tuple(layer_strides),
            layer_dilations=tuple(layer_dilations),
            norm=norm,
            dtype=dtype,
            remat=remat,
        )

    return ctor


resnet18 = _make(BasicBlock, (2, 2, 2, 2))
resnet34 = _make(BasicBlock, (3, 4, 6, 3))
resnet50 = _make(Bottleneck, (3, 4, 6, 3))
resnet101 = _make(Bottleneck, (3, 4, 23, 3))
resnet152 = _make(Bottleneck, (3, 8, 36, 3))

# output channels of the four stages
def stage_channels(block_cls) -> Tuple[int, ...]:
    e = block_cls.expansion
    return (64 * e, 128 * e, 256 * e, 512 * e)
