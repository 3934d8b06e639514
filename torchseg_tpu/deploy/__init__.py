from .fused_stem import make_bisenet_fused_infer, fold_bn_affine
