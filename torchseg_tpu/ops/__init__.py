from .resize import resize_bilinear_align_corners, upsample_by_scale
from .norm import BatchNorm
from .blocks import (
    ConvBnRelu,
    DeConvBnRelu,
    SeparableConvBnRelu,
    GlobalAvgPool2d,
    SELayer,
    ChannelAttention,
    BNRefine,
    RefineResidual,
    AttentionRefinement,
    FeatureFusion,
)
from .losses import (
    cross_entropy_with_ignore,
    prob_ohem_cross_entropy,
    sigmoid_focal_loss_border,
    one_hot,
)
from .metrics import hist_info, compute_score, ConfusionAccumulator
