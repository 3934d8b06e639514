"""Model zoo — factory functions mirroring the reference's 12 experiment
networks (SURVEY.md §2.2), parameterized by norm factory and dtype.
"""

from typing import Optional

from .resnet import (
    ResNet,
    BasicBlock,
    Bottleneck,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from .xception import Xception, xception39
from .fcn import FCN
from .bisenet import BiSeNet
from .pspnet import PSPNet
from .psanet import PSANet
from .dfn import DFN
from ..ops.blocks import default_norm

_DILATED = dict(layer_strides=(1, 2, 1, 1), layer_dilations=(1, 1, 2, 4))


def fcn32s_r101(num_classes=21, norm=default_norm, dtype=None, remat=False,
                train_raw_logits=False):
    bb = resnet101(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                   remat=remat)
    return FCN(num_classes, bb, train_raw_logits=train_raw_logits,
               norm=norm, dtype=dtype)


def pspnet_r50(num_classes=150, norm=default_norm, dtype=None, remat=False,
               train_raw_logits=False):
    bb = resnet50(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                  remat=remat, **_DILATED)
    return PSPNet(num_classes, bb, train_raw_logits=train_raw_logits,
                  norm=norm, dtype=dtype)


def pspnet_r101(num_classes=150, norm=default_norm, dtype=None, remat=False,
                train_raw_logits=False):
    bb = resnet101(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                   remat=remat, **_DILATED)
    return PSPNet(num_classes, bb, train_raw_logits=train_raw_logits,
                  norm=norm, dtype=dtype)


def psanet_r50(num_classes=150, norm=default_norm, dtype=None,
               att_channels=3600, remat=False, train_raw_logits=False):
    bb = resnet50(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                  remat=remat, **_DILATED)
    return PSANet(num_classes, bb, att_channels=att_channels,
                  train_raw_logits=train_raw_logits, norm=norm,
                  dtype=dtype)


def psanet_r101(num_classes=150, norm=default_norm, dtype=None,
                att_channels=3600, remat=False, train_raw_logits=False):
    bb = resnet101(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                   remat=remat, **_DILATED)
    return PSANet(num_classes, bb, att_channels=att_channels,
                  train_raw_logits=train_raw_logits, norm=norm,
                  dtype=dtype)


def bisenet_r18(num_classes=19, norm=default_norm, dtype=None, speed=False,
                remat=False, train_raw_logits=False):
    bb = resnet18(norm=norm, deep_stem=False, dtype=dtype, remat=remat)
    return BiSeNet(
        num_classes, bb,
        conv_channel=128,
        aux_mid=128 if speed else 256,
        main_mid=64,
        head_scales=(2, 1, 1) if speed else (16, 8, 8),
        train_raw_logits=train_raw_logits,
        norm=norm, dtype=dtype,
    )


def bisenet_r101(num_classes=19, norm=default_norm, dtype=None, remat=False,
                 train_raw_logits=False):
    bb = resnet101(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                   remat=remat)
    return BiSeNet(
        num_classes, bb,
        conv_channel=128, aux_mid=256, main_mid=256,
        head_scales=(16, 8, 8), train_raw_logits=train_raw_logits,
        norm=norm, dtype=dtype,
    )


def bisenet_x39(num_classes=19, norm=default_norm, dtype=None, speed=False,
                remat=False, train_raw_logits=False):
    del remat  # xception39 is small; no checkpointing needed
    bb = xception39(norm=norm, dtype=dtype)
    return BiSeNet(
        num_classes, bb,
        conv_channel=128, aux_mid=128, main_mid=64,
        head_scales=(2, 1, 1) if speed else (16, 8, 8),
        train_raw_logits=train_raw_logits,
        norm=norm, dtype=dtype,
    )


def dfn_r101(num_classes=19, norm=default_norm, dtype=None, remat=False,
             train_raw_logits=False):
    bb = resnet101(norm=norm, deep_stem=True, stem_width=64, dtype=dtype,
                   remat=remat)
    return DFN(num_classes, bb, train_raw_logits=train_raw_logits,
               norm=norm, dtype=dtype)


MODEL_REGISTRY = {
    "fcn32s_r101": fcn32s_r101,
    "pspnet_r50": pspnet_r50,
    "pspnet_r101": pspnet_r101,
    "psanet_r50": psanet_r50,
    "psanet_r101": psanet_r101,
    "bisenet_r18": bisenet_r18,
    "bisenet_r101": bisenet_r101,
    "bisenet_x39": bisenet_x39,
    "dfn_r101": dfn_r101,
}
