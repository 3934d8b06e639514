"""AOT serving-artifact export (deploy/export.py).

The reference has no export path (serving = re-import network.py +
torch.load); these pin the jax.export artifact contract instead:
self-contained (weights as constants), uint8-in/labels-out with the
normalize embedded, platform-stamped, and bit-exact across
serialize → deserialize.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchseg_tpu.deploy.export import (
    GRAPH_FILE,
    META_FILE,
    build_serving_fn,
    export_serving,
    load_artifact,
    main as export_main,
    save_artifact,
)
from torchseg_tpu.experiments.registry import build_model, get_experiment

SHAPE = (1, 64, 128, 3)


def _model_and_vars(dtype=jnp.bfloat16):
    cfg = get_experiment("cityscapes.bisenet.R18.speed")
    model = build_model(cfg, axis_name=None, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            variables,
        )
    return cfg, model, variables


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_artifact_roundtrip_bitexact(tmp_path):
    """serialize → deserialize → call == the live jitted forward, and the
    artifact carries no reference to the model/variables objects."""
    cfg, model, variables = _model_and_vars()
    fn = build_serving_fn(
        model, variables, image_mean=cfg.image_mean,
        image_std=cfg.image_std, output="labels",
    )
    exported = export_serving(
        fn, (jax.ShapeDtypeStruct(SHAPE, jnp.uint8),), platforms=("cpu",)
    )
    path = save_artifact(str(tmp_path / "art"), exported,
                         {"experiment": cfg.name})
    infer, meta = load_artifact(path)

    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, SHAPE).astype(np.uint8)
    )
    got = np.asarray(infer(img))
    want = np.asarray(jax.jit(fn)(img))
    # .speed heads emit /8-resolution logits → labels at (1, H/8, W/8)
    assert got.shape == (1, SHAPE[1] // 8, SHAPE[2] // 8)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, want)
    assert meta["experiment"] == cfg.name
    assert meta["platforms"] == ["cpu"]


def test_artifact_scores_output_matches_apply():
    """output='scores' == model.apply on the normalized image (the
    preprocessing inside the graph is the datasets' normalize)."""
    cfg, model, variables = _model_and_vars(dtype=jnp.float32)
    fn = build_serving_fn(
        model, variables, image_mean=cfg.image_mean,
        image_std=cfg.image_std, output="scores", dtype=jnp.float32,
    )
    img_np = np.random.default_rng(1).integers(0, 255, SHAPE)
    img = jnp.asarray(img_np.astype(np.uint8))
    got = np.asarray(jax.jit(fn)(img))
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    x = jnp.asarray((img_np.astype(np.float32) / 255.0 - mean) / std)
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_cross_platform_lowering_includes_tpu(tmp_path):
    """TPU lowering from a CPU host works and is stamped in the platform
    list (the serving site gets a platform check at call time)."""
    cfg, model, variables = _model_and_vars()
    fn = build_serving_fn(
        model, variables, image_mean=cfg.image_mean,
        image_std=cfg.image_std,
    )
    exported = export_serving(
        fn, (jax.ShapeDtypeStruct(SHAPE, jnp.uint8),),
        platforms=("tpu", "cpu"),
    )
    assert set(exported.platforms) == {"tpu", "cpu"}
    path = save_artifact(str(tmp_path / "art"), exported)
    infer, meta = load_artifact(path)
    # still runs on the cpu backend (platform dispatch inside the graph)
    img = jnp.zeros(SHAPE, jnp.uint8)
    assert np.asarray(infer(img)).shape == (1, SHAPE[1] // 8, SHAPE[2] // 8)
    assert meta["platforms"] == ["tpu", "cpu"]


def test_export_cli_and_meta(tmp_path):
    out = str(tmp_path / "cli.art")
    got = export_main([
        "-e", "cityscapes.bisenet.R18.speed", "-o", out,
        "--input-size", "1x64x128x3", "--platforms", "cpu", "--check",
    ])
    assert got == out
    assert os.path.exists(os.path.join(out, GRAPH_FILE))
    with open(os.path.join(out, META_FILE)) as f:
        meta = json.load(f)
    assert meta["format"] == "torchseg-tpu-serving/1"
    assert meta["input_dtype"] == "uint8"
    assert meta["output"] == "labels"
    assert meta["input_shape"] == [1, 64, 128, 3]
    assert meta["n_params"] > 1e6
    assert meta["weights_source"] == "random-init"


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_export_embeds_checkpoint_weights(tmp_path):
    """--checkpoint: the embedded weights are the checkpoint's, not the
    random init (two artifacts from different params disagree)."""
    from torchseg_tpu.engine.checkpoint import save_checkpoint
    from torchseg_tpu.engine.trainer import TrainState

    cfg, model, variables = _model_and_vars(dtype=jnp.float32)
    # a differently-seeded set of params, saved as a checkpoint
    rngs = {"params": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(8)}
    other = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    snap = tmp_path / "snapshot"
    snap.mkdir()
    ckpt = save_checkpoint(str(snap), TrainState.create(other), epoch=0)

    out_rand = str(tmp_path / "rand.art")
    out_ckpt = str(tmp_path / "ckpt.art")
    common = ["-e", "cityscapes.bisenet.R18.speed", "--f32",
              "--input-size", "1x64x128x3", "--platforms", "cpu",
              "--scores"]
    export_main(common + ["-o", out_rand])
    export_main(common + ["-o", out_ckpt, "--checkpoint", ckpt])

    img = jnp.asarray(
        np.random.default_rng(2).integers(0, 255, SHAPE).astype(np.uint8)
    )
    a, _ = load_artifact(out_rand)
    b, meta = load_artifact(out_ckpt)
    assert meta["weights_source"] == ckpt
    sa, sb = np.asarray(a(img)), np.asarray(b(img))
    assert not np.allclose(sa, sb), "checkpoint weights were not embedded"
    # and the ckpt artifact matches a live forward with those weights
    fn = build_serving_fn(
        model, {"params": other["params"],
                "batch_stats": other["batch_stats"]},
        image_mean=cfg.image_mean, image_std=cfg.image_std,
        output="scores", dtype=jnp.float32,
    )
    np.testing.assert_allclose(sb, np.asarray(jax.jit(fn)(img)),
                               rtol=2e-5, atol=2e-5)


def test_prepare_graph_matches_numpy_prep():
    """The exported jax prepare twin == the host numpy prep, bit for bit,
    for both input formats (s2d classic-stem, pad deep-stem)."""
    from torchseg_tpu.deploy.export import make_prepare_graph
    from torchseg_tpu.deploy.int8_serve import (
        prepare_s2d_input_u8,
        prepare_u8_input,
    )

    mean = (0.485, 0.456, 0.406)
    img = np.random.default_rng(3).integers(
        0, 255, (1, 64, 128, 3)).astype(np.uint8)

    want = np.asarray(prepare_s2d_input_u8(img, image_mean=mean))
    got = np.asarray(jax.jit(make_prepare_graph(
        {"format": "s2d", "pads": [[2, 1], [2, 1]], "image_mean": mean}
    ))(img))
    np.testing.assert_array_equal(got, want)

    want = np.asarray(prepare_u8_input(img, pad=3, image_mean=mean))
    got = np.asarray(jax.jit(make_prepare_graph(
        {"format": "pad", "pad": 3, "image_mean": mean}
    ))(img))
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError, match="format"):
        make_prepare_graph({"format": "nope", "image_mean": mean})


def test_int8_through_artifact_uint8_contract(tmp_path):
    """--int8-through artifact: uint8 image in (prepare graph runs as its
    own dispatch), labels out, ≥99% agreement with the live graph (the
    CLI --check enforces it); meta carries the mode + prepare flag."""
    out = str(tmp_path / "i8.art")
    export_main([
        "-e", "cityscapes.bisenet.R18.speed", "-o", out,
        "--input-size", "1x64x128x3", "--int8-through",
        "--platforms", "cpu", "--calib-size", "1x64x128x3", "--check",
    ])
    assert os.path.exists(os.path.join(out, "prepare.bin"))
    with open(os.path.join(out, META_FILE)) as f:
        meta = json.load(f)
    # auto decoder resolves to int8 on classic-stem R18 (round-4 chip A/B)
    assert meta["serve_mode"] == "int8-through+dec"
    assert meta["has_prepare"] is True
    assert meta["input_dtype"] == "uint8"

    infer, _ = load_artifact(out)
    img = jnp.asarray(np.random.default_rng(4).integers(
        0, 255, (1, 64, 128, 3)).astype(np.uint8))
    labels = np.asarray(infer(img))
    assert labels.shape == (1, 8, 16) and labels.dtype == np.int32
    assert labels.min() >= 0 and labels.max() < 19


def test_int8_through_export_rejects_scores(tmp_path):
    with pytest.raises(SystemExit, match="labels"):
        export_main([
            "-e", "cityscapes.bisenet.R18.speed",
            "-o", str(tmp_path / "x"), "--int8-through", "--scores",
            "--platforms", "cpu",
        ])


def test_build_serving_fn_rejects_bad_output():
    cfg, model, variables = _model_and_vars()
    with pytest.raises(ValueError, match="output"):
        build_serving_fn(model, variables, image_mean=cfg.image_mean,
                         image_std=cfg.image_std, output="probs")
