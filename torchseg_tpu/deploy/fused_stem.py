"""Deploy-time graph specialization for BiSeNet-R18 inference.

Both the SpatialPath and the ResNet-18 context path start with a 7x7/2 conv
over the SAME input.  Measured on v5e at 1024x2048 the stem conv is
input-formatting-bound: one conv emitting 128 channels costs the same as one
emitting 64 (2.24 vs 2.17 ms).  This module builds the serving function that

  * folds eval-mode BN into per-channel affines,
  * concatenates the two stem kernels into one (7,7,3,128) conv
    (channel-padded to 8 like ops/s2d.conv_stride2_cpad),
  * runs conv + affine + ReLU once, splits the halves,
  * feeds them into the regular model via the ``stem_outs`` argument.

Numerically identical to ``model.apply`` (verified in tests/test_deploy.py);
parameters are read from the standard variables pytree, so any trained or
grafted checkpoint works unchanged.
"""

import jax
import jax.numpy as jnp


def fold_bn_affine(bn_params, bn_stats, eps: float = 1e-5):
    """Eval-mode BN -> (a, b) with y = x * a + b."""
    inv = jax.lax.rsqrt(bn_stats["var"] + eps)
    a = inv * bn_params["scale"]
    b = bn_params["bias"] - bn_stats["mean"] * a
    return a, b


def _fused_stem(variables, x, eps: float = 1e-5):
    """One conv for both 7x7/2 stems; returns (spatial_stem, backbone_stem)
    post-BN+ReLU activations at ÷2 resolution."""
    p = variables["params"]
    s = variables["batch_stats"]
    k_sp = p["spatial_path"]["conv_7x7"]["conv"]["kernel"]
    k_bb = p["backbone"]["conv1"]["kernel"]
    a_sp, b_sp = fold_bn_affine(
        p["spatial_path"]["conv_7x7"]["bn"], s["spatial_path"]["conv_7x7"]["bn"],
        eps,
    )
    a_bb, b_bb = fold_bn_affine(p["backbone"]["bn1"], s["backbone"]["bn1"], eps)

    dtype = x.dtype
    kernel = jnp.concatenate([k_sp, k_bb], axis=-1).astype(dtype)
    a = jnp.concatenate([a_sp, a_bb]).astype(dtype)
    b = jnp.concatenate([b_sp, b_bb]).astype(dtype)

    cin = kernel.shape[2]
    if cin < 8:  # channel-pad (see ops/s2d.conv_stride2_cpad)
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, 8 - cin), (0, 0)))
        if x.shape[-1] == cin:
            # serving fast path: feed x already zero-padded to 8 channels
            # (like NHWC vs NCHW, an input-format choice) to skip an
            # in-graph 0.8 ms pad+relayout of the full-res input.
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 8 - cin)))
        else:
            assert x.shape[-1] == 8, x.shape
    out = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jnp.maximum(out * a + b, 0)
    n = k_sp.shape[-1]
    return out[..., :n], out[..., n:]


def make_bisenet_fused_infer(model, variables, bn_eps: float = 1e-5,
                             argmax: bool = False):
    """Jitted serving fn(x_nhwc) for a classic-stem (R18) BiSeNet: fused
    stems + the standard eval forward."""

    @jax.jit
    def infer(x):
        stem_outs = _fused_stem(variables, x, bn_eps)
        scores = model.apply(variables, x, train=False, stem_outs=stem_outs)
        if argmax:
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return infer
