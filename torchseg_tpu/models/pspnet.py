"""PSPNet — rebuild of reference model/pspnet/ade.pspnet.{R50,R101}_v1c/network.py.

Dilated ResNet (output stride 8 via layer3/4 dilation 2/4), PyramidPooling head
(pools {1,2,3,6} -> 1x1 CBR 512 -> align-corners upsample -> concat -> 3x3 CBR
512 -> dropout 0.1 -> 1x1), aux head on stage 3; both outputs x8 upsampled and
log_softmax'ed (network.py:40-58) — the reference applies the criterion to the
log-softmax outputs (its CE re-applies log_softmax; we reproduce that quirk in
the loss wiring, see ops/losses.py docstring).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import ConvBnRelu, NormFactory, default_norm
from ..ops.pool import adaptive_avg_pool
from ..ops.resize import resize_bilinear_align_corners, upsample_by_scale
from ..utils.init import kaiming_normal_init, torch_default_bias_init


class PyramidPooling(nn.Module):
    """PPM (reference network.py:75-109)."""

    out_planes: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool(x, s)
            p = ConvBnRelu(512, 1, 1, 0, norm=self.norm, dtype=self.dtype,
                           name=f"ppm{i}_cbr")(p, train)
            p = resize_bilinear_align_corners(p, hw, dtype=jnp.float32).astype(
                x.dtype
            )
            outs.append(p)
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBnRelu(512, 3, 1, 1, norm=self.norm, dtype=self.dtype,
                       name="conv6_cbr")(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(
            self.out_planes,
            (1, 1),
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            bias_init=torch_default_bias_init(512),
            dtype=self.dtype,
            name="conv6_out",
        )(x)
        return x


class AuxHead(nn.Module):
    """3x3 CBR (same width) -> dropout -> 1x1 (reference network.py:29-35)."""

    out_planes: int
    mid: int
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(self.mid, 3, 1, 1, norm=self.norm, dtype=self.dtype,
                       name="cbr")(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(
            self.out_planes,
            (1, 1),
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            bias_init=torch_default_bias_init(self.mid),
            dtype=self.dtype,
            name="out",
        )(x)
        return x


class PSPNet(nn.Module):
    num_classes: int
    backbone: nn.Module  # must be a dilated (os=8) resnet
    # emit RAW /8 head logits in train mode — the fused upsample+CE loss
    # (ops/losses.cross_entropy_with_ignore_upsampled, pre_log_softmax=True
    # for the reference's double-softmax quirk) then owns the x8 upsample
    # and the in-network log_softmax.  Params and eval are identical.
    train_raw_logits: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, context_blocks=None):
        """context_blocks: optional precomputed backbone stage features in
        forward order — the int8-through serving path
        (deploy/int8_serve.py) computes the dilated backbone outside and
        reuses this flax head in bf16."""
        blocks = (context_blocks if context_blocks is not None
                  else self.backbone(x, train))
        psp = PyramidPooling(self.num_classes, norm=self.norm,
                             dtype=self.dtype, name="psp_layer")(
            blocks[-1], train
        )
        if not train:
            psp = upsample_by_scale(psp, 8, dtype=jnp.float32)
            return jax.nn.log_softmax(psp, axis=-1)
        aux = AuxHead(self.num_classes, blocks[-2].shape[-1], norm=self.norm,
                      dtype=self.dtype, name="aux_layer")(blocks[-2], train)
        if not self.train_raw_logits:
            psp = upsample_by_scale(psp, 8, dtype=jnp.float32)
            psp = jax.nn.log_softmax(psp, axis=-1)
            aux = upsample_by_scale(aux, 8, dtype=jnp.float32)
            aux = jax.nn.log_softmax(aux, axis=-1)
        return {"main": psp, "aux": aux}
