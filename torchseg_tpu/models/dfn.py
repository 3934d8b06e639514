"""DFN (Discriminative Feature Network) — rebuild of reference
model/dfn/{cityscapes,voc}.dfn.R101_v1c/network.py.

Two branches over a (non-dilated) ResNet-101 v1c:
  * smooth branch (network.py:100-117): global context + top-down pass of
    RefineResidual -> ChannelAttention -> RefineResidual -> DFNHead at
    x32/16/8/4, with x2 upsampling between stages;
  * border branch (network.py:119-134): bottom-up pass of RefineResidual(21ch)
    with upsampled summation and 1-channel DFNHead(x4) outputs, trained
    against Canny-edge aux labels with the sigmoid focal loss.

Train mode returns {'smooth': [4 x C-class logits], 'border': [4 x 1ch
logits]}; eval returns log_softmax of the last smooth head (:152).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (
    ConvBnRelu,
    RefineResidual,
    ChannelAttention,
    NormFactory,
    default_norm,
)
from ..ops.resize import resize_bilinear_align_corners, upsample_by_scale
from ..utils.init import kaiming_normal_init, torch_default_bias_init


class DFNHead(nn.Module):
    """RefineResidual(out*9) -> 1x1 conv -> x-scale upsample
    (network.py:157-172)."""

    out_planes: int
    scale: int
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RefineResidual(self.out_planes * 9, 3, has_relu=False,
                           norm=self.norm, dtype=self.dtype, name="rrb")(
            x, train
        )
        x = nn.Conv(
            self.out_planes,
            (1, 1),
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            bias_init=torch_default_bias_init(self.out_planes * 9),
            dtype=self.dtype,
            name="conv",
        )(x)
        return upsample_by_scale(x, self.scale, dtype=jnp.float32)


class DFN(nn.Module):
    num_classes: int
    backbone: nn.Module  # resnet101 v1c, standard strides
    smooth_inner: int = 512
    border_inner: int = 21
    # emit RAW (un-upsampled) smooth-head logits in train mode — the fused
    # upsample+CE loss owns the x32/x16/x8/x4 upsamples (see
    # models/pspnet.py).  The x4 1-channel border heads stay as-is (tiny).
    train_raw_logits: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, context_blocks=None):
        """context_blocks: optional precomputed backbone stage features in
        forward order (int8-through serving, deploy/int8_serve.py) — DFN's
        decoder reads the VALUES of all four stages, so the serving path
        dequantizes every stage (dequant_all)."""
        blocks = list(
            context_blocks if context_blocks is not None
            else self.backbone(x, train)
        )  # [÷4, ÷8, ÷16, ÷32]
        top_down = blocks[::-1]  # [÷32(2048), ÷16(1024), ÷8(512), ÷4(256)]

        gc = jnp.mean(top_down[0], axis=(1, 2), keepdims=True)
        gc = ConvBnRelu(self.smooth_inner, 1, 1, 0, norm=self.norm,
                        dtype=self.dtype, name="global_context")(gc, train)
        gc = resize_bilinear_align_corners(gc, top_down[0].shape[1:3])

        # ---- smooth branch (top-down) ----
        last_fm = gc
        smooth_out = []
        for i, fm in enumerate(top_down):
            fm = RefineResidual(self.smooth_inner, 3, has_relu=True,
                                norm=self.norm, dtype=self.dtype,
                                name=f"smooth_pre_rrb{i}")(fm, train)
            fm = ChannelAttention(self.smooth_inner, 1, dtype=self.dtype,
                                  name=f"cab{i}")(fm, last_fm)
            fm = RefineResidual(self.smooth_inner, 3, has_relu=True,
                                norm=self.norm, dtype=self.dtype,
                                name=f"smooth_aft_rrb{i}")(fm, train)
            head_scale = (1 if train and self.train_raw_logits
                          else 2 ** (5 - i))
            smooth_out.append(
                DFNHead(self.num_classes, head_scale, norm=self.norm,
                        dtype=self.dtype, name=f"smooth_head{i}")(fm, train)
            )
            if i != 3:
                last_fm = upsample_by_scale(fm, 2)

        if not train:
            return jax.nn.log_softmax(
                smooth_out[-1].astype(jnp.float32), axis=-1
            )

        # ---- border branch (bottom-up, reference network.py:119-134) ----
        last_fm = None
        border_out = []
        for i, fm in enumerate(blocks):
            fm = RefineResidual(self.border_inner, 3, has_relu=True,
                                norm=self.norm, dtype=self.dtype,
                                name=f"border_pre_rrb{i}")(fm, train)
            if last_fm is not None:
                fm = upsample_by_scale(fm, 2**i)
                last_fm = last_fm + fm
                last_fm = RefineResidual(
                    self.border_inner, 3, has_relu=True, norm=self.norm,
                    dtype=self.dtype, name=f"border_aft_rrb{i}"
                )(last_fm, train)
            else:
                last_fm = fm
            border_out.append(
                DFNHead(1, 4, norm=self.norm, dtype=self.dtype,
                        name=f"border_head{i}")(last_fm, train)
            )

        return {"smooth": smooth_out, "border": border_out}
