"""Deploy-time graph specialization for classic-stem BiSeNet inference
(R18 and X39).

Both the SpatialPath and the context path start with a stride-2 conv
over the SAME input (X39's 3x3 stem embeds centered in the 7x7 window).  Measured on v5e at 1024x2048 the stem conv is
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


def _stem_weights(variables, eps: float):
    """Collect both stems' (kernel, affine) pairs, embedding a smaller
    backbone stem kernel (Xception39's 3x3/2, models/xception.py) in the
    center of the 7x7 window — numerically identical because both convs
    stride 2 and the centered zero-padding reproduces the smaller conv's
    pad-1 footprint."""
    p = variables["params"]
    s = variables["batch_stats"]
    k_sp = p["spatial_path"]["conv_7x7"]["conv"]["kernel"]
    a_sp, b_sp = fold_bn_affine(
        p["spatial_path"]["conv_7x7"]["bn"],
        s["spatial_path"]["conv_7x7"]["bn"], eps,
    )
    bb = p["backbone"]["conv1"]
    if isinstance(bb, dict) and "conv" in bb:  # ConvBnRelu stem (xception)
        k_bb = bb["conv"]["kernel"]
        a_bb, b_bb = fold_bn_affine(
            bb["bn"], s["backbone"]["conv1"]["bn"], eps
        )
    else:  # plain conv + separate bn1 (resnet classic stem)
        k_bb = bb["kernel"]
        a_bb, b_bb = fold_bn_affine(
            p["backbone"]["bn1"], s["backbone"]["bn1"], eps
        )
    ks = k_sp.shape[0]
    kb = k_bb.shape[0]
    if kb < ks:
        m = (ks - kb) // 2
        k_bb = jnp.pad(k_bb, ((m, m), (m, m), (0, 0), (0, 0)))
    return k_sp, a_sp, b_sp, k_bb, a_bb, b_bb


def _fused_stem(variables, x, eps: float = 1e-5):
    """One conv for both /2 stems; returns (spatial_stem, backbone_stem)
    post-BN+ReLU activations at ÷2 resolution."""
    k_sp, a_sp, b_sp, k_bb, a_bb, b_bb = _stem_weights(variables, eps)

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
    return out[..., :n], out[..., n:], None


def prepare_s2d_input(img: "np_or_jnp", dtype=jnp.bfloat16):
    """Serving input format 's2d': (1, H, W, 3) -> (1, H/2, W/2, 12) with the
    2x2 space-to-depth (a, b, c) channel order of ops/s2d.conv_stride2_s2d.
    Host-side prep, like an NCHW->NHWC conversion."""
    import numpy as np

    x = np.asarray(img)
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    return jnp.asarray(xs, dtype)


def _fused_stem_s2d(variables, xs, eps: float = 1e-5, pool: bool = False):
    """Both stems as ONE 4x4 stride-1 conv over s2d input (see ops/s2d.py
    for the exact kernel transform).  Measured on v5e: the s2d-input conv
    needs no im2col relayout (1.18 ms vs 1.2 + 0.8 ms), but the s2d
    transpose must happen outside the graph (XLA pins it to a conv-hostile
    layout otherwise) — hence the input-format contract."""
    k_sp, a_sp, b_sp, k_bb, a_bb, b_bb = _stem_weights(variables, eps)

    dtype = xs.dtype
    kernel = jnp.concatenate([k_sp, k_bb], axis=-1).astype(dtype)  # 7,7,3,128
    a = jnp.concatenate([a_sp, a_bb]).astype(dtype)
    b = jnp.concatenate([b_sp, b_bb]).astype(dtype)

    c = kernel.shape[2]
    cout = kernel.shape[3]
    # kernel s2d transform (d = (7//2) % 2 = 1): pad to 8x8 at top/left,
    # regroup to (4, 4, 4c, cout); conv stride 1 with pad (2, 1)
    wpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    wk = wpad.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
    wk = wk.reshape(4, 4, 4 * c, cout)
    out = jax.lax.conv_general_dilated(
        xs, wk, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jnp.maximum(out * a + b, 0)
    n = k_sp.shape[-1]
    if pool:
        # pool the backbone half here so each stem half has exactly one
        # consumer layout downstream
        from flax import linen as nn

        bb = nn.max_pool(out[..., n:], (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)])
        return out[..., :n], None, bb
    return out[..., :n], out[..., n:], None


def make_bisenet_fused_infer(model, variables, bn_eps: float = 1e-5,
                             argmax=False,
                             input_format: str = "nhwc"):
    """Jitted serving fn for a classic-stem (R18) BiSeNet: fused stems + the
    standard eval forward.

    input_format: 'nhwc' takes (1,H,W,3|8); 's2d' takes the pre-s2d'ed
    (1,H/2,W/2,12) tensor from ``prepare_s2d_input`` (fastest on v5e).
    argmax: False returns log-softmax scores; True argmaxes them; 'tiled'
    (the production full-res path) runs the main head WITHOUT the in-model
    x-scale upsample and produces the full-res prediction with the
    row-tiled lax.map epilogue (ops/resize.tiled_upsample_argmax — the
    full-res score tensor never exists whole in HBM; 168 -> 203 FPS on
    v5e); 'fused' uses the Pallas kernel instead
    (ops/pallas/upsample_argmax.py — compile-stalls at production sizes on
    the current libtpu, kept for future toolchains).
    argmax(log_softmax(upsample(x))) == argmax of either epilogue because
    log_softmax is monotone per pixel and the upsample is the same
    align-corners bilinear."""
    scale = model.head_scales[2]
    if argmax in ("fused", "tiled") and scale <= 1:
        raise ValueError(
            f"argmax='{argmax}' targets full-res heads (head_scales[2] > "
            "1); the .speed variants already emit /8 logits — use "
            "argmax=True"
        )

    @jax.jit
    def infer(x):
        raw = argmax in ("fused", "tiled")
        if input_format == "s2d":
            stem_outs = _fused_stem_s2d(variables, x, bn_eps)
            b, h2, w2, _ = x.shape
            dummy = jnp.zeros((b, h2 * 2, w2 * 2, 3), x.dtype)
            scores = model.apply(
                variables, dummy, train=False, stem_outs=stem_outs,
                raw_logits=raw,
            )
        else:
            stem_outs = _fused_stem(variables, x, bn_eps)
            scores = model.apply(
                variables, x, train=False, stem_outs=stem_outs,
                raw_logits=raw,
            )
        if argmax == "tiled":
            from ..ops.resize import tiled_upsample_argmax

            h, w = scores.shape[1:3]
            return tiled_upsample_argmax(scores, (h * scale, w * scale))
        if argmax == "fused":
            from ..ops.pallas.upsample_argmax import fused_upsample_argmax

            h, w = scores.shape[1:3]
            return fused_upsample_argmax(scores, (h * scale, w * scale))
        if argmax:
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return infer
