"""BiSeNet — rebuild of reference model/bisenet/*/network.py (all 5 variants).

Architecture (network.py:18-111): a SpatialPath (÷8, 128ch), a context path
(ResNet-18/101 or Xception39) whose reversed stage features feed a
global-context vector plus two AttentionRefinement arms with top-down x2
upsampling + refine convs, fused with the spatial path by a FeatureFusion
module; three heads (2 aux + main).

Variant table (verified against the five reference network.py files):
                  conv_ch  aux_mid  main_mid  head_scales       eval heads
  R18             128      256      64        (16, 8, 8)        main
  R101 (v1c)      128      256      256       (16, 8, 8)        main
  X39             128      128      64        (16, 8, 8)        main
  R18.speed       128      128      64        (2, 1, 1)         main only, ÷8 logits
  X39.speed       128      128      64        (2, 1, 1)         main only, ÷8 logits

Train mode returns the three head logits (aux0, aux1, main) for the OHEM
criterion; eval mode returns log_softmax(main) like the reference (:111).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (
    ConvBnRelu,
    AttentionRefinement,
    FeatureFusion,
    NormFactory,
    default_norm,
)
from ..ops.resize import resize_bilinear_align_corners, upsample_by_scale
from ..utils.init import kaiming_normal_init, torch_default_bias_init


class SpatialPath(nn.Module):
    """7x7/2 -> 3x3/2 -> 3x3/2 -> 1x1, 128ch out (network.py:114-137)."""

    out_planes: int = 128
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, stem_features=None):
        inner = 64
        if stem_features is not None:
            x = stem_features  # deploy-time fused stem (deploy/fused_stem.py)
        else:
            x = ConvBnRelu(inner, 7, 2, 3, norm=self.norm, dtype=self.dtype,
                           name="conv_7x7")(x, train)
        x = ConvBnRelu(inner, 3, 2, 1, norm=self.norm, dtype=self.dtype,
                       name="conv_3x3_1")(x, train)
        x = ConvBnRelu(inner, 3, 2, 1, norm=self.norm, dtype=self.dtype,
                       name="conv_3x3_2")(x, train)
        x = ConvBnRelu(self.out_planes, 1, 1, 0, norm=self.norm,
                       dtype=self.dtype, name="conv_1x1")(x, train)
        return x


class BiSeNetHead(nn.Module):
    """3x3 CBR (mid) -> 1x1 conv -> optional x-scale bilinear upsample
    (network.py:140-168)."""

    out_planes: int
    scale: int
    mid: int
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = ConvBnRelu(self.mid, 3, 1, 1, norm=self.norm, dtype=self.dtype,
                        name="conv_3x3")(x, train)
        out = nn.Conv(
            self.out_planes,
            (1, 1),
            use_bias=True,
            kernel_init=kaiming_normal_init(),
            bias_init=torch_default_bias_init(self.mid),
            dtype=self.dtype,
            name="conv_1x1",
        )(fm)
        if self.scale > 1:
            out = upsample_by_scale(out, self.scale, dtype=jnp.float32)
        return out


class BiSeNet(nn.Module):
    num_classes: int
    backbone: nn.Module
    conv_channel: int = 128
    aux_mid: int = 256
    main_mid: int = 64
    head_scales: Sequence[int] = (16, 8, 8)
    # emit RAW (un-upsampled) head logits in train mode — the fused
    # upsample+OHEM loss (ops/losses.prob_ohem_cross_entropy_upsampled)
    # then owns the x-scale upsample, so the full-res f32 score tensors
    # never hit HBM.  Params and eval behavior are identical either way.
    train_raw_logits: bool = False
    norm: NormFactory = default_norm
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, stem_outs=None,
                 spatial_out=None, context_blocks=None,
                 raw_logits: bool = False):
        """stem_outs: optional (spatial_stem, backbone_stem) activations from
        the deploy-time fused stem — both 7x7/2 convs of the R18 variant run
        as ONE conv over the shared input (deploy/fused_stem.py).
        spatial_out: optional fully precomputed SpatialPath output (÷8,
        128ch) — the no-split serving path computes the whole spatial branch
        outside with channel-extended kernels (deploy/fused_stem.py).
        context_blocks: optional precomputed backbone stage features in
        FORWARD stage order (÷4.., ÷32 last, as the backbone returns them) —
        the int8-through serving path (deploy/int8_serve.py) computes the
        backbone outside and reuses this flax decoder in bf16.
        raw_logits (eval only): return the main head's logits BEFORE the
        final upsample/log_softmax — the deploy epilogue fuses
        upsample+argmax in one Pallas kernel (ops/pallas/upsample_argmax.py),
        so the full-res score tensor never touches HBM."""
        cc = self.conv_channel
        sp_stem, bb_stem, bb_pooled = (
            stem_outs if stem_outs is not None else (None, None, None)
        )
        if spatial_out is None:
            spatial_out = SpatialPath(128, norm=self.norm, dtype=self.dtype,
                                      name="spatial_path")(
                x, train, stem_features=sp_stem
            )

        if context_blocks is None:
            context_blocks = self.backbone(
                x, train, stem_features=bb_stem, stem_pooled=bb_pooled
            )
        context_blocks = list(context_blocks)
        context_blocks.reverse()  # [÷32, ÷16, ÷8, (÷4)]

        gc = jnp.mean(context_blocks[0], axis=(1, 2), keepdims=True)
        gc = ConvBnRelu(cc, 1, 1, 0, norm=self.norm, dtype=self.dtype,
                        name="global_context")(gc, train)
        gc = resize_bilinear_align_corners(gc, context_blocks[0].shape[1:3])

        last_fm = gc
        pred_out = []
        for i in range(2):
            fm = AttentionRefinement(cc, norm=self.norm, dtype=self.dtype,
                                     name=f"arm{i}")(context_blocks[i], train)
            fm = fm + last_fm
            last_fm = resize_bilinear_align_corners(
                fm, context_blocks[i + 1].shape[1:3]
            )
            last_fm = ConvBnRelu(cc, 3, 1, 1, norm=self.norm, dtype=self.dtype,
                                 name=f"refine{i}")(last_fm, train)
            pred_out.append(last_fm)
        context_out = last_fm

        concate_fm = FeatureFusion(cc * 2, 1, norm=self.norm, dtype=self.dtype,
                                   name="ffm")(spatial_out, context_out, train)
        pred_out.append(concate_fm)

        if train:
            outs = []
            for i, (mid, scale) in enumerate(
                zip(
                    (self.aux_mid, self.aux_mid, self.main_mid),
                    self.head_scales,
                )
            ):
                outs.append(
                    BiSeNetHead(
                        self.num_classes,
                        1 if self.train_raw_logits else scale,
                        mid,
                        norm=self.norm,
                        dtype=self.dtype,
                        name=f"head{i}",
                    )(pred_out[i], train)
                )
            return {"aux0": outs[0], "aux1": outs[1], "main": outs[2]}

        main = BiSeNetHead(
            self.num_classes,
            1 if raw_logits else self.head_scales[2],
            self.main_mid,
            norm=self.norm,
            dtype=self.dtype,
            name="head2",
        )(pred_out[2], train)
        if raw_logits:
            return main
        return jax.nn.log_softmax(main.astype(jnp.float32), axis=-1)
