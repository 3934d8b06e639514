"""GluonCV weight reader (utils/gluon_convert.py — the role of the
reference's furnace/tools/gluon2pytorch.py:34-42): .params container
parsing, the gamma/beta rename, and end-to-end grafting into a Flax
backbone."""

import numpy as np
import pytest

from torchseg_tpu.utils.gluon_convert import (
    gluon_to_torch_state_dict,
    graft_gluon_backbone,
    load_gluon_params,
    parse_mxnet_params,
    save_mxnet_params,
)


def test_params_container_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    params = {
        "conv1.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32),
        "bn1.gamma": rng.normal(size=(8,)).astype(np.float32),
        "bn1.running_mean": rng.normal(size=(8,)).astype(np.float32),
        "fc.bias": rng.normal(size=(10,)).astype(np.float64),
        "scalar_like": np.asarray([3], np.int64),
    }
    path = save_mxnet_params(str(tmp_path / "m.params"), params)
    back = load_gluon_params(path)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k])
        assert back[k].dtype == params[k].dtype


def test_params_container_rejects_garbage(tmp_path):
    p = tmp_path / "bad.params"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="header magic"):
        load_gluon_params(str(p))


def test_gluon_rename_matches_reference():
    """gamma->weight, beta->bias, arg:/aux: prefixes stripped; everything
    else untouched (gluon2pytorch.py:34-42)."""
    g = {
        "arg:bn1.gamma": np.ones(4, np.float32),
        "aux:bn1.running_mean": np.zeros(4, np.float32),
        "layer1.0.bn2.beta": np.ones(8, np.float32),
        "conv1.weight": np.ones((4, 3, 3, 3), np.float32),
    }
    sd = gluon_to_torch_state_dict(g)
    assert set(sd) == {
        "bn1.weight", "bn1.running_mean", "layer1.0.bn2.bias",
        "conv1.weight",
    }


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_graft_gluon_backbone_end_to_end():
    """A gluon-named deep-stem tensor set must land in the right Flax
    leaves with the OIHW->HWIO transpose, through the same non-strict
    graft the torch path uses."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu import models

    model = models.pspnet_r50(num_classes=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), train=True,
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    bb = params["backbone"]

    rng = np.random.default_rng(1)
    # v1c deep stem conv + one BN, gluon-named
    w_shape = np.transpose(
        np.asarray(bb["stem_conv1"]["kernel"]), (3, 2, 0, 1)
    ).shape
    w = rng.normal(size=w_shape).astype(np.float32)
    gamma = rng.normal(size=bb["stem_bn1"]["scale"].shape).astype(np.float32)
    rmean = rng.normal(
        size=stats["backbone"]["stem_bn1"]["mean"].shape).astype(np.float32)
    gluon = {
        "conv1.0.weight": w,
        "conv1.1.gamma": gamma,
        "conv1.1.running_mean": rmean,
    }
    new_params, new_stats = graft_gluon_backbone(gluon, params, stats)
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["stem_conv1"]["kernel"]),
        np.transpose(w, (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["stem_bn1"]["scale"]), gamma)
    np.testing.assert_array_equal(
        np.asarray(new_stats["backbone"]["stem_bn1"]["mean"]), rmean)
    # untouched leaves stay
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["stem_conv2"]["kernel"]),
        np.asarray(bb["stem_conv2"]["kernel"]),
    )


def test_graft_gluon_from_params_file(tmp_path):
    """File leg: .params on disk -> graft (the exact reference workflow,
    model zoo .params in, our checkpoint format out)."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu import models

    model = models.bisenet_r18(num_classes=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), train=True,
    )
    params = variables["params"]
    kshape = np.transpose(
        np.asarray(params["backbone"]["conv1"]["kernel"]), (3, 2, 0, 1)
    ).shape
    w = np.random.default_rng(3).normal(size=kshape).astype(np.float32)
    path = save_mxnet_params(str(tmp_path / "r18.params"),
                             {"conv1.weight": w})
    new_params = graft_gluon_backbone(path, params)
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone"]["conv1"]["kernel"]),
        np.transpose(w, (2, 3, 1, 0)),
    )
