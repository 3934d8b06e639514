"""Xception39 backbone — NHWC Flax rebuild of reference
``furnace/base_model/xception.py``.

Three stages of [4, 8, 4] blocks with mid-channels [16, 32, 64]; each block is
three separable convs (expansion 4) with an optional separable projection
shortcut on the strided first block (reference xception.py:29-63).  The
Xception separable conv has NO BatchNorm after the depthwise conv
(xception.py:10-26) — unlike the seg_oprs variant.

Returns the three stage feature maps (channels 64, 128, 256) at strides
8/16/32 (stem conv /2, maxpool /2, each stage /2).
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (
    ConvBnRelu,
    SeparableConvBnRelu,
    NormFactory,
    default_norm,
)
from ..ops.maxpool import stem_pool


class XceptionBlock(nn.Module):
    mid_channels: int
    has_proj: bool
    stride: int
    dilation: int = 1
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.has_proj:
            shortcut = SeparableConvBnRelu(
                self.mid_channels * self.expansion,
                3,
                self.stride,
                1,
                has_relu=False,
                depthwise_bn=False,
                norm=self.norm,
                dtype=self.dtype,
                name="proj",
            )(x, train)
        r = SeparableConvBnRelu(
            self.mid_channels,
            3,
            self.stride,
            self.dilation,
            self.dilation,
            has_relu=True,
            depthwise_bn=False,
            norm=self.norm,
            dtype=self.dtype,
            name="sep1",
        )(x, train)
        r = SeparableConvBnRelu(
            self.mid_channels,
            3,
            1,
            1,
            has_relu=True,
            depthwise_bn=False,
            norm=self.norm,
            dtype=self.dtype,
            name="sep2",
        )(r, train)
        r = SeparableConvBnRelu(
            self.mid_channels * self.expansion,
            3,
            1,
            1,
            has_relu=False,
            depthwise_bn=False,
            norm=self.norm,
            dtype=self.dtype,
            name="sep3",
        )(r, train)
        return nn.relu(shortcut + r)


class Xception(nn.Module):
    layers: Sequence[int]
    channels: Sequence[int]
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x, train: bool = False, stem_features=None, stem_pooled=None
    ) -> Tuple[jnp.ndarray, ...]:
        if stem_pooled is not None:
            x = stem_pooled  # precomputed post-maxpool activations
        else:
            if stem_features is not None:
                x = stem_features  # precomputed post-conv1 activations
            else:
                x = ConvBnRelu(
                    8, 3, 2, 1, norm=self.norm, dtype=self.dtype, name="conv1"
                )(x, train)
            x = stem_pool(x)

        feats = []
        for li, (blocks, mid) in enumerate(zip(self.layers, self.channels)):
            for bi in range(blocks):
                x = XceptionBlock(
                    mid,
                    has_proj=bi == 0,  # first block of each stage strides
                    stride=2 if bi == 0 else 1,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
            feats.append(x)
        return tuple(feats)


def xception39(
    norm: NormFactory = default_norm, dtype=None, **kwargs
) -> Xception:
    return Xception(
        layers=(4, 8, 4), channels=(16, 32, 64), norm=norm, dtype=dtype, **kwargs
    )
