from .export import (
    build_serving_fn,
    export_serving,
    load_artifact,
    make_prepare_graph,
    save_artifact,
)
from .fused_stem import (
    fold_bn_affine,
    make_bisenet_fused_infer,
    prepare_s2d_input,
)
from .int8_serve import (
    build_int8_backbone_package,
    build_int8_bisenet_r101_package,
    make_int8_bisenet_r101_infer,
    make_int8_pspnet_infer,
    prepare_u8_input,
    build_int8_package,
    build_int8_serving_for_experiment,
    calibrate_channelwise,
    load_int8_package,
    make_int8_through_infer,
    prepare_s2d_input_u8,
    save_int8_package,
)
