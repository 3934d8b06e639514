"""FCN-32s — rebuild of reference model/fcn/voc.fcn32s.R101_v1c/network.py.

Head: C/4 3x3 CBR -> dropout(0.1) -> 1x1 conv, x32 bilinear upsample; aux head
on stage-3 features at x16 (network.py:33-47).  Inference returns raw logits
(the reference FCN does not apply log_softmax; the evaluator's exp() is then
monotonic and argmax-safe).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import ConvBnRelu, NormFactory, default_norm
from ..ops.resize import upsample_by_scale
from ..utils.init import kaiming_normal_init, torch_default_bias_init


class FCNHead(nn.Module):
    out_planes: int
    norm: NormFactory = default_norm
    kernel_init_mode: str = "fan_out"  # FCN train.py:57 uses fan_out
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // 4
        x = ConvBnRelu(
            inter,
            3,
            1,
            1,
            norm=self.norm,
            kernel_init=kaiming_normal_init(self.kernel_init_mode),
            dtype=self.dtype,
            name="cbr",
        )(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(
            self.out_planes,
            (1, 1),
            use_bias=True,
            kernel_init=kaiming_normal_init(self.kernel_init_mode),
            bias_init=torch_default_bias_init(inter),
            dtype=self.dtype,
            name="conv1x1",
        )(x)
        return x


class FCN(nn.Module):
    """Returns {'main': x32 logits, 'aux': x16 logits} in train mode, and the
    main logits in eval mode."""

    num_classes: int
    backbone: nn.Module
    # emit RAW /32 and /16 head logits in train mode — the fused
    # upsample+CE loss owns the x32/x16 upsample (see models/pspnet.py)
    train_raw_logits: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, context_blocks=None):
        """context_blocks: optional precomputed backbone stage features
        (int8-through serving, deploy/int8_serve.py)."""
        blocks = (context_blocks if context_blocks is not None
                  else self.backbone(x, train))
        fm = FCNHead(
            self.num_classes, norm=self.norm, dtype=self.dtype, name="head"
        )(blocks[-1], train)
        if not train:
            return upsample_by_scale(fm, 32, dtype=jnp.float32)
        aux = FCNHead(
            self.num_classes, norm=self.norm, dtype=self.dtype, name="aux_head"
        )(blocks[-2], train)
        if self.train_raw_logits:
            return {"main": fm, "aux": aux}
        pred = upsample_by_scale(fm, 32, dtype=jnp.float32)
        aux_pred = upsample_by_scale(aux, 16, dtype=jnp.float32)
        return {"main": pred, "aux": aux_pred}
