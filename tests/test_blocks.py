"""Shape/behavior smoke tests for the composite conv blocks."""

import numpy as np
import jax
import jax.numpy as jnp

from torchseg_tpu.ops.blocks import (
    ConvBnRelu,
    SeparableConvBnRelu,
    SELayer,
    ChannelAttention,
    BNRefine,
    RefineResidual,
    AttentionRefinement,
    FeatureFusion,
)

KEY = jax.random.PRNGKey(0)


def _init_apply(mod, *xs, train=False):
    variables = mod.init(KEY, *xs, train=train)
    if train:
        out, _ = mod.apply(variables, *xs, train=True, mutable=["batch_stats"])
    else:
        out = mod.apply(variables, *xs, train=False)
    return out, variables


def test_conv_bn_relu_shapes():
    x = jnp.ones((2, 16, 16, 8))
    out, _ = _init_apply(ConvBnRelu(32, 3, 2, 1), x)
    assert out.shape == (2, 8, 8, 32)
    assert (np.asarray(out) >= 0).all()  # relu applied

    out, _ = _init_apply(ConvBnRelu(16, 7, 2, 3), jnp.ones((1, 33, 65, 3)))
    # torch: floor((33+6-7)/2)+1 = 17, floor((65+6-7)/2)+1 = 33
    assert out.shape == (1, 17, 33, 16)


def test_separable_variants():
    x = jnp.ones((2, 16, 16, 8))
    out, v = _init_apply(SeparableConvBnRelu(16, 3, 2, 1), x)
    assert out.shape == (2, 8, 8, 16)
    assert "bn" in v["params"]  # depthwise BN present (seg_oprs variant)

    out, v = _init_apply(SeparableConvBnRelu(16, 3, 2, 1, depthwise_bn=False), x)
    assert out.shape == (2, 8, 8, 16)
    assert "bn" not in v["params"]  # xception variant has no depthwise BN


def test_se_layer_gate():
    x = jnp.ones((2, 8, 8, 32))
    out, _ = _init_apply(SELayer(32, reduction=16), x)
    assert out.shape == (2, 1, 1, 32)
    assert ((np.asarray(out) > 0) & (np.asarray(out) < 1)).all()


def test_channel_attention():
    x1 = jnp.ones((2, 8, 8, 16))
    x2 = jnp.ones((2, 8, 8, 16)) * 2
    out, _ = _init_apply(ChannelAttention(16, reduction=1), x1, x2)
    assert out.shape == (2, 8, 8, 16)


def test_refine_blocks():
    x = jnp.ones((2, 8, 8, 16))
    out, _ = _init_apply(BNRefine(16, 3), x)
    assert out.shape == (2, 8, 8, 16)
    out, _ = _init_apply(RefineResidual(32, 3, has_relu=True), x)
    assert out.shape == (2, 8, 8, 32)


def test_bisenet_blocks():
    x = jnp.ones((2, 8, 8, 64))
    out, _ = _init_apply(AttentionRefinement(32), x)
    assert out.shape == (2, 8, 8, 32)
    a = jnp.ones((2, 8, 8, 128))
    b = jnp.ones((2, 8, 8, 128))
    out, _ = _init_apply(FeatureFusion(256), a, b)
    assert out.shape == (2, 8, 8, 256)


def test_train_mode_updates_stats():
    x = jax.random.normal(KEY, (2, 8, 8, 8))
    mod = ConvBnRelu(16, 3, 1, 1)
    variables = mod.init(KEY, x, train=False)
    _, upd = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn"]["mean"]
    after = upd["batch_stats"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
