"""Composite conv blocks — the TPU/NHWC counterparts of the reference's
``furnace/seg_opr/seg_oprs.py`` building blocks.

Every block is a Flax module taking a ``norm`` factory (a zero-arg callable
returning a norm module, usually ``functools.partial(BatchNorm, ...)``) —
the functional analog of the reference's injectable ``norm_layer``.  All
blocks take ``train: bool`` and thread it to BN.

XLA fuses the BN affine + ReLU into the preceding convolution's epilogue, so
ConvBnRelu compiles to a single MXU conv with a fused vector epilogue — the
reason we do not hand-write a conv kernel.
"""

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm
from .s2d import S2DConv, use_s2d
from ..utils.init import (
    kaiming_normal_init,
    torch_default_bias_init,
    torch_default_kernel_init,
)

NormFactory = Callable[..., nn.Module]

# Blocks take a ``norm`` factory called as norm(dtype=..., name=...), usually
# ``BatchNorm`` itself or ``functools.partial(BatchNorm, axis_name="data")``.
default_norm = BatchNorm


class ConvBnRelu(nn.Module):
    """Conv2d -> BN -> ReLU (reference seg_oprs.py:24-46)."""

    out_planes: int
    ksize: int
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    groups: int = 1
    has_bn: bool = True
    has_relu: bool = True
    has_bias: bool = False
    norm: NormFactory = default_norm
    kernel_init: Callable = kaiming_normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        bias_init = torch_default_bias_init(in_ch // self.groups * self.ksize**2)
        if (
            use_s2d(in_ch, self.stride, self.ksize)
            and self.pad == self.ksize // 2
            and self.dilation == 1
            and self.groups == 1
            and not self.has_bias
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            # tiny-C strided stem: exact space-to-depth reformulation
            x = S2DConv(
                self.out_planes,
                self.ksize,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.out_planes,
                (self.ksize, self.ksize),
                strides=(self.stride, self.stride),
                padding=[(self.pad, self.pad)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=self.has_bias,
                kernel_init=self.kernel_init,
                bias_init=bias_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.has_bn:
            x = self.norm(dtype=self.dtype, name="bn")(
                x, use_running_average=not train
            )
        if self.has_relu:
            x = nn.relu(x)
        return x


class DeConvBnRelu(nn.Module):
    """ConvTranspose2d -> BN -> ReLU (reference seg_oprs.py:49-73)."""

    out_planes: int
    ksize: int
    stride: int = 1
    pad: int = 0
    has_bn: bool = True
    has_relu: bool = True
    has_bias: bool = False
    norm: NormFactory = default_norm
    kernel_init: Callable = kaiming_normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(padding=p) trims p from each spatial edge;
        # flax expresses the same thing with negative-equivalent padding via
        # the 'VALID' transpose then slicing.  We use flax ConvTranspose with
        # explicit padding math: out = (in-1)*s - 2p + k (+ output_padding).
        x = nn.ConvTranspose(
            self.out_planes,
            (self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(self.ksize - 1 - self.pad, self.ksize - 1 - self.pad)] * 2,
            use_bias=self.has_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.has_bn:
            x = self.norm(dtype=self.dtype, name="bn")(
                x, use_running_average=not train
            )
        if self.has_relu:
            x = nn.relu(x)
        return x


class SeparableConvBnRelu(nn.Module):
    """Depthwise conv [-> BN] -> pointwise ConvBnRelu.

    ``depthwise_bn=True`` matches reference seg_oprs.py:76-94 (used by DFN-era
    blocks); ``False`` matches the Xception39 variant that has no BN after the
    depthwise conv (reference base_model/xception.py:10-26).
    """

    out_channels: int
    ksize: int = 1
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    has_relu: bool = True
    depthwise_bn: bool = True
    norm: NormFactory = default_norm
    kernel_init: Callable = kaiming_normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=in_ch,
            use_bias=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        if self.depthwise_bn:
            x = self.norm(dtype=self.dtype, name="bn")(
                x, use_running_average=not train
            )
        x = ConvBnRelu(
            self.out_channels,
            1,
            1,
            0,
            has_bn=True,
            has_relu=self.has_relu,
            has_bias=False,
            norm=self.norm,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="pointwise",
        )(x, train)
        return x


class GlobalAvgPool2d(nn.Module):
    """Global average pooling keeping a 1x1 spatial map
    (reference seg_oprs.py:97-107)."""

    @nn.compact
    def __call__(self, x):
        return jnp.mean(x, axis=(1, 2), keepdims=True)


class SELayer(nn.Module):
    """Squeeze-and-excite gate; returns the (B,1,1,out) gate
    (reference seg_oprs.py:110-126)."""

    out_planes: int
    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN inside; kept for interface uniformity
        in_ch = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(
            self.out_planes // self.reduction,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(in_ch),
            dtype=self.dtype,
            name="fc1",
        )(y)
        y = nn.relu(y)
        y = nn.Dense(
            self.out_planes,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(self.out_planes // self.reduction),
            dtype=self.dtype,
            name="fc2",
        )(y)
        y = nn.sigmoid(y)
        return y[:, None, None, :]


class ChannelAttention(nn.Module):
    """DFN channel-attention block: concat -> SE -> x1*att + x2
    (reference seg_oprs.py:130-140)."""

    out_planes: int
    reduction: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        del train  # no BN inside; kept for interface uniformity
        fm = jnp.concatenate([x1, x2], axis=-1)
        att = SELayer(
            self.out_planes, self.reduction, dtype=self.dtype, name="se"
        )(fm)
        return x1 * att + x2


class BNRefine(nn.Module):
    """CBR -> conv -> (+x) [-> relu] (reference seg_oprs.py:143-162)."""

    out_planes: int
    ksize: int
    has_bias: bool = False
    has_relu: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = ConvBnRelu(
            self.out_planes,
            self.ksize,
            1,
            self.ksize // 2,
            has_bias=self.has_bias,
            norm=self.norm,
            dtype=self.dtype,
            name="cbr",
        )(x, train)
        t = nn.Conv(
            self.out_planes,
            (self.ksize, self.ksize),
            padding=[(self.ksize // 2, self.ksize // 2)] * 2,
            use_bias=self.has_bias,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="conv_refine",
        )(t)
        out = t + x
        if self.has_relu:
            out = nn.relu(out)
        return out


class RefineResidual(nn.Module):
    """1x1 conv -> [CBR -> conv, residual add] [-> relu]
    (reference seg_oprs.py:165-188)."""

    out_planes: int
    ksize: int
    has_bias: bool = False
    has_relu: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_planes,
            (1, 1),
            use_bias=self.has_bias,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="conv_1x1",
        )(x)
        t = ConvBnRelu(
            self.out_planes,
            self.ksize,
            1,
            self.ksize // 2,
            has_bias=self.has_bias,
            norm=self.norm,
            dtype=self.dtype,
            name="cbr",
        )(x, train)
        t = nn.Conv(
            self.out_planes,
            (self.ksize, self.ksize),
            padding=[(self.ksize // 2, self.ksize // 2)] * 2,
            use_bias=self.has_bias,
            kernel_init=kaiming_normal_init(),
            dtype=self.dtype,
            name="conv_refine",
        )(t)
        out = t + x
        if self.has_relu:
            out = nn.relu(out)
        return out


class AttentionRefinement(nn.Module):
    """BiSeNet ARM: 3x3 CBR -> global-pool 1x1 CBR(sigmoid) channel gate
    (reference seg_oprs.py:192-212)."""

    out_planes: int
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = ConvBnRelu(
            self.out_planes,
            3,
            1,
            1,
            norm=self.norm,
            dtype=self.dtype,
            name="conv_3x3",
        )(x, train)
        se = jnp.mean(fm, axis=(1, 2), keepdims=True)
        se = ConvBnRelu(
            self.out_planes,
            1,
            1,
            0,
            has_relu=False,
            norm=self.norm,
            dtype=self.dtype,
            name="channel_attention",
        )(se, train)
        se = nn.sigmoid(se)
        return fm * se


class FeatureFusion(nn.Module):
    """BiSeNet FFM: concat -> 1x1 CBR -> SE-style gate -> fm + fm*gate
    (reference seg_oprs.py:215-238)."""

    out_planes: int
    reduction: int = 1
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        fm = jnp.concatenate([x1, x2], axis=-1)
        fm = ConvBnRelu(
            self.out_planes,
            1,
            1,
            0,
            norm=self.norm,
            dtype=self.dtype,
            name="conv_1x1",
        )(fm, train)
        se = jnp.mean(fm, axis=(1, 2), keepdims=True)
        se = ConvBnRelu(
            self.out_planes // self.reduction,
            1,
            1,
            0,
            has_bn=False,
            has_relu=True,
            norm=self.norm,
            dtype=self.dtype,
            name="ca1",
        )(se, train)
        se = ConvBnRelu(
            self.out_planes,
            1,
            1,
            0,
            has_bn=False,
            has_relu=False,
            norm=self.norm,
            dtype=self.dtype,
            name="ca2",
        )(se, train)
        se = nn.sigmoid(se)
        return fm + fm * se
