"""Pallas kernel parity tests (interpret mode on CPU): focal loss fwd/bwd
against a pure-JAX oracle implementing the documented CUDA math, and the BN
kernels against numpy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchseg_tpu.ops.pallas.focal_loss import (
    sigmoid_focal_loss_multiclass,
    SigmoidFocalLossMulti,
)
from torchseg_tpu.ops.pallas.bn_kernel import (
    channel_sum_sumsq,
    fused_scale_bias_act,
)


def _oracle_losses(x, t, gamma, alpha):
    n, c = x.shape
    d = np.arange(c)[None, :]
    tt = t[:, None]
    c1 = (tt == d + 1).astype(np.float32)
    c2 = ((tt >= 0) & (tt != d + 1)).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-x))
    term1 = (1 - p) ** gamma * np.log(np.maximum(p, 1e-38))
    log1mp = np.log1p(np.exp(-np.abs(x))) - x * (x >= 0) + 0 * x
    # stable log(1-p) = -x*(x>=0) - log(1+exp(x-2x(x>=0)))
    log1mp = -x * (x >= 0) - np.log1p(np.exp(x - 2 * x * (x >= 0)))
    term2 = p**gamma * log1mp
    return -(c1 * term1 * alpha) - (c2 * term2 * (1 - alpha))


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_focal_forward_matches_oracle():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(64, 8)) * 3).astype(np.float32)
    t = rng.integers(-1, 9, size=(64,)).astype(np.int32)
    got = np.asarray(sigmoid_focal_loss_multiclass(jnp.asarray(x), jnp.asarray(t)))
    want = _oracle_losses(x, t, 2.0, 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_focal_backward_matches_autodiff_oracle():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(32, 8)) * 2).astype(np.float32)
    t = rng.integers(0, 9, size=(32,)).astype(np.int32)

    def pallas_loss(x):
        return jnp.sum(
            sigmoid_focal_loss_multiclass(x, jnp.asarray(t)) * 1.7
        )

    def oracle_loss(x):
        c = x.shape[1]
        d = jnp.arange(c)[None, :]
        tt = jnp.asarray(t)[:, None]
        c1 = (tt == d + 1).astype(jnp.float32)
        c2 = ((tt >= 0) & (tt != d + 1)).astype(jnp.float32)
        p = jax.nn.sigmoid(x)
        term1 = (1 - p) ** 2.0 * jnp.log(jnp.maximum(p, 1e-38))
        xpos = (x >= 0).astype(jnp.float32)
        log1mp = -x * xpos - jnp.log1p(jnp.exp(x - 2 * x * xpos))
        term2 = p**2.0 * log1mp
        return jnp.sum((-(c1 * term1 * 0.25) - (c2 * term2 * 0.75)) * 1.7)

    g_pallas = jax.grad(pallas_loss)(jnp.asarray(x))
    g_oracle = jax.grad(oracle_loss)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_oracle), rtol=1e-3, atol=1e-5
    )


def test_focal_module_normalization():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    t = np.array([0] * 8 + [1] * 4 + [2] * 4, np.int32)
    loss = float(SigmoidFocalLossMulti(jnp.asarray(x), jnp.asarray(t)))
    losses = _oracle_losses(x, t, 2.0, 0.25)
    assert loss == pytest.approx(losses.sum() / 8.0, rel=1e-4)


def test_channel_sum_sumsq():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    got = np.asarray(channel_sum_sumsq(jnp.asarray(x)))
    flat = x.reshape(-1, 16)
    np.testing.assert_allclose(got[0], flat.sum(0), rtol=1e-4)
    np.testing.assert_allclose(got[1], (flat**2).sum(0), rtol=1e-4)


def test_fused_scale_bias_act():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    a = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    got = np.asarray(fused_scale_bias_act(jnp.asarray(x), a, b, act="relu"))
    want = np.maximum(x * a + b, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_upsample_argmax():
    from torchseg_tpu.ops.pallas.upsample_argmax import fused_upsample_argmax
    from torchseg_tpu.ops.resize import resize_bilinear_align_corners

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 16, 24, 19)).astype(np.float32)
    got = np.asarray(fused_upsample_argmax(jnp.asarray(x), (128, 192), tile=64))
    want = np.asarray(
        jnp.argmax(
            resize_bilinear_align_corners(jnp.asarray(x), (128, 192)), axis=-1
        )
    )
    assert got.shape == (2, 128, 192)
    # bilinear ties are measure-zero with random input; require exact match
    assert (got == want).mean() > 0.999


def test_stem_conv7x7_s2_matches_xla():
    from torchseg_tpu.ops.pallas.stem_conv import stem_conv7x7_s2

    rng = np.random.default_rng(12)
    h, w, cout = 32, 64, 128
    x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    kernel = (rng.normal(size=(7, 7, 3, cout)) * 0.05).astype(np.float32)
    a = rng.normal(size=(cout,)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    want = np.maximum(np.asarray(want) * a + b, 0)

    y1, y2 = stem_conv7x7_s2(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(a), jnp.asarray(b),
        split=64, out_dtype=jnp.float32,
    )
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert got.shape == want.shape == (1, h // 2, w // 2, cout)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_deploy_fused_argmax_epilogue_matches_reference_path():
    """make_bisenet_fused_infer(argmax='fused') must predict the same classes
    as the standard eval forward (log_softmax of the upsampled head)."""
    import jax

    from torchseg_tpu import models
    from torchseg_tpu.deploy.fused_stem import make_bisenet_fused_infer

    model = models.bisenet_r18(num_classes=19)  # non-speed: x8 main head
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 64, 128, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=True,
    )
    want = np.asarray(
        jnp.argmax(model.apply(variables, jnp.asarray(x), train=False),
                   axis=-1)
    )
    infer = make_bisenet_fused_infer(model, variables, argmax="fused")
    got = np.asarray(infer(jnp.asarray(x)))
    assert got.shape == want.shape
    assert (got == want).mean() > 0.999  # bilinear ties are measure-zero


def test_deploy_fused_argmax_rejects_speed_heads():
    import jax

    from torchseg_tpu import models
    from torchseg_tpu.deploy.fused_stem import make_bisenet_fused_infer

    model = models.bisenet_r18(num_classes=19, speed=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 128, 3)), train=True,
    )
    with pytest.raises(ValueError, match="fused"):
        make_bisenet_fused_infer(model, variables, argmax="fused")
