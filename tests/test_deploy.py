"""Deploy-time fused stem == standard eval forward, bit-for-bit in f32."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from torchseg_tpu.deploy.fused_stem import make_bisenet_fused_infer
from torchseg_tpu.experiments.registry import build_model, get_experiment


def test_fused_stem_matches_plain():
    cfg = get_experiment("cityscapes.bisenet.R18.speed")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    # non-trivial BN stats so folding is actually exercised
    variables = jax.tree.map(lambda a: a, variables)
    stats = jax.tree.map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 128, 3))
    plain = model.apply(variables, x, train=False)
    fused = make_bisenet_fused_infer(model, variables, cfg.bn_eps)(x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=1e-4, atol=1e-5
    )


def test_s2d_input_format_matches_plain():
    cfg = get_experiment("cityscapes.bisenet.R18.speed")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 128, 3))
    plain = model.apply(variables, x, train=False)

    from torchseg_tpu.deploy.fused_stem import prepare_s2d_input

    xs = prepare_s2d_input(np.asarray(x), dtype=jnp.float32)
    fused = make_bisenet_fused_infer(
        model, variables, cfg.bn_eps, input_format="s2d"
    )(xs)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=1e-4, atol=1e-5
    )


def test_fused_infer_argmax_wrapper():
    cfg = get_experiment("cityscapes.bisenet.R18.speed")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 128, 3))
    scores = model.apply(variables, x, train=False)
    pred = make_bisenet_fused_infer(model, variables, cfg.bn_eps,
                                    argmax=True)(x)
    assert pred.dtype == jnp.int32
    np.testing.assert_array_equal(
        np.asarray(pred), np.asarray(jnp.argmax(scores, axis=-1))
    )


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_fused_stem_x39_matches_plain():
    """X39's 3x3/2 ConvBnRelu stem center-embedded in the fused 7x7 conv
    must match (both input formats).  Tolerance is looser than the R18
    test: embedding the 3x3 in a 7x7 window changes the f32 accumulation
    order, and the synthetic BN stats blow activations up to ~1e5."""
    from torchseg_tpu.deploy.fused_stem import prepare_s2d_input

    cfg = get_experiment("cityscapes.bisenet.X39.speed")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    stats = jax.tree.map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 128, 3))
    plain = model.apply(variables, x, train=False)
    fused = make_bisenet_fused_infer(model, variables, cfg.bn_eps)(x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=1e-3, atol=1e-4
    )
    xs = prepare_s2d_input(np.asarray(x), dtype=jnp.float32)
    fused_s2d = make_bisenet_fused_infer(
        model, variables, cfg.bn_eps, input_format="s2d"
    )(xs)
    np.testing.assert_allclose(
        np.asarray(fused_s2d), np.asarray(plain), rtol=1e-3, atol=1e-4
    )


def test_tiled_upsample_argmax_equals_plain_epilogue():
    """ops/resize.tiled_upsample_argmax (the production full-res epilogue,
    203 FPS on v5e vs 168 plain) must reproduce argmax(upsample(raw))
    exactly — same interpolation matrices, row-chunked evaluation."""
    from torchseg_tpu.ops.resize import (
        resize_bilinear_align_corners,
        tiled_upsample_argmax,
    )

    raw = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 24, 19))
    up = resize_bilinear_align_corners(raw, (128, 192), dtype=jnp.float32)
    ref = np.asarray(jnp.argmax(up, axis=-1))
    got = np.asarray(tiled_upsample_argmax(raw, (128, 192), row_tile=32))
    assert (got == ref).mean() > 0.9995  # fp-tie pixels only
    assert got.shape == (2, 128, 192)


def test_tiled_upsample_argmax_non_divisor_height():
    """Prime-ish output heights (1081p etc.) must keep the full row tile by
    padding up and slicing, not degenerate to rt=1 (advisor round-3): the
    result still matches the materialized epilogue."""
    from torchseg_tpu.ops.resize import (
        resize_bilinear_align_corners,
        tiled_upsample_argmax,
    )

    raw = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 24, 7))
    oh, ow = 131, 96  # 131 prime: old fallback would loop 131 chunks
    up = resize_bilinear_align_corners(raw, (oh, ow), dtype=jnp.float32)
    ref = np.asarray(jnp.argmax(up, axis=-1))
    got = np.asarray(tiled_upsample_argmax(raw, (oh, ow), row_tile=32))
    assert got.shape == (1, oh, ow)
    assert (got == ref).mean() > 0.9995


def test_fused_infer_tiled_argmax_full_model():
    """The 'tiled' serving mode end to end on the full-res R18 model: must
    equal the plain scores' argmax."""
    cfg = get_experiment("cityscapes.bisenet.R18")  # non-speed: x8 head
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 128, 3))
    plain = model.apply(variables, x, train=False)
    ref = np.asarray(jnp.argmax(plain, axis=-1))
    pred = np.asarray(
        make_bisenet_fused_infer(model, variables, cfg.bn_eps,
                                 argmax="tiled")(x)
    )
    assert pred.shape == ref.shape
    assert (pred == ref).mean() > 0.999


def test_tiled_argmax_rejected_for_speed_heads():

    cfg = get_experiment("cityscapes.bisenet.R18.speed")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    with pytest.raises(ValueError, match="full-res heads"):
        make_bisenet_fused_infer(model, variables, cfg.bn_eps,
                                 argmax="tiled")
