"""Int8-through serving (deploy/int8_serve.py): the uint8-input, int8-
activation BiSeNet-R18 graph must agree with the float graph — weight
quantization is the only error source by construction (integer-exact input,
BN/ReLU/requant folded into conv epilogues, exact int8 maxpool)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchseg_tpu import models
from torchseg_tpu.deploy.int8_serve import (
    _quant_w,
    build_int8_package,
    make_int8_through_infer,
    prepare_s2d_input_u8,
)
from torchseg_tpu.deploy.quantize import calibrate

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _normalize(u8):
    return (u8.astype(np.float32) / 255.0 - MEAN) / STD


def _setup(seed=0, hw=(64, 128), factory=None):
    model = (factory or models.bisenet_r18)(num_classes=19, speed=True)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (1, *hw, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        xf, train=True,
    )
    return model, variables, img, xf


def test_quant_w_roundtrip_error_bound():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(3, 3, 16, 8)).astype(np.float32)
    wq, s = _quant_w(w)
    err = np.abs(wq.astype(np.float32) * s - w)
    # symmetric per-channel: error <= scale/2 = absmax/254 per channel
    assert (err <= np.abs(w).max(axis=(0, 1, 2)) / 254 + 1e-7).all()


def test_int8_through_matches_float_graph():
    model, variables, img, xf = _setup()
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    # weight-quantization-only error: scores track the float graph closely
    denom = max(np.std(ref), 1e-6)
    rel = np.abs(got - ref).mean() / denom
    assert rel < 0.15, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.90, agree


@pytest.mark.slow  # interpret-mode Pallas chain: whole-graph emulation
def test_int8_through_pallas_chain_matches_xla_arm():
    """stem_mode='pallas' (v3 stem -> quad spatial path -> fused L1 ->
    fused L2 kernels) vs the XLA bf16-stem arm: the conv/L1/L2 kernels
    are bit-identical, the stem within +-1 code on f32-summation ties —
    end-to-end argmax agreement must be near-exact (chip-size exactness
    is rechecked in DESIGN.md's round-5 tables)."""
    from jax.experimental.pallas import tpu as pltpu

    from torchseg_tpu.deploy import int8_serve as _i8

    model, variables, img, xf = _setup()
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)

    infer_x, run_x = make_int8_through_infer(
        model, variables, pkg, argmax=True, stem_mode="bf16")
    ref = np.asarray(infer_x(run_x, xs))

    old_l3, old_l4 = _i8._L3_ENABLE, _i8._L4_ENABLE
    _i8._L3_ENABLE = _i8._L4_ENABLE = True
    try:
        infer_p, run_p = make_int8_through_infer(
            model, variables, pkg, argmax=True, stem_mode="pallas")
    finally:
        _i8._L3_ENABLE, _i8._L4_ENABLE = old_l3, old_l4
    # the fused-kernel package rows must actually be packed (the chain
    # engages at this geometry: h2=32, w2=64 passes every shape gate)
    assert "l1q" in run_p and "l2q" in run_p and "sp1q" in run_p
    assert "l3q" in run_p  # stage 3 rides the same chain
    # l4q is packed but its shape gate REJECTS this geometry (h16=4):
    # the graph must fall back to the XLA blocks and still agree
    assert "l4q" in run_p
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(infer_p(run_p, xs))
    assert got.shape == ref.shape
    agree = (got == ref).mean()
    assert agree > 0.97, agree


@pytest.mark.parametrize("kw", [
    {"maxpool_via": "bf16"},
    {"spatial_carry": "bf16"},
    {"maxpool_via": "bf16", "spatial_carry": "bf16"},
])
def test_int8_through_carrier_variants_bit_exact(kw):
    """The bf16-carried forms store the SAME int8 codes as bf16 (exactly
    representable; conv accumulates exactly in f32 below 2^24), so the
    scores must be bit-identical to the s8-carried graph — the variants
    exist purely to trade XLA s8 layout copies against bandwidth
    (round-4 chip A/B, docs/DESIGN.md)."""
    model, variables, img, xf = _setup()
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD,
                             decoder="int8")
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    base_infer, base_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False)
    base = np.asarray(base_infer(base_pkg, xs), np.float32)
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, **kw)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    np.testing.assert_array_equal(got, base)


def test_int8_through_tiled_argmax_full_res():
    """argmax='tiled' (int8 body + row-tiled full-res epilogue) must equal
    the argmax of the same int8 graph's in-model-upsampled scores — the
    epilogue only reorders the (monotone) upsample+argmax."""
    model, variables, img, xf = _setup(
        seed=7, factory=lambda **kw: models.bisenet_r18(
            **{k: v for k, v in kw.items() if k != "speed"})
    )
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    scores_fn, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    ref = np.asarray(jnp.argmax(scores_fn(run_pkg, xs), axis=-1))
    tiled_fn, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax="tiled", dtype=jnp.float32
    )
    pred = np.asarray(tiled_fn(run_pkg, xs))
    assert pred.shape == ref.shape == (1, 64, 128)
    assert (pred == ref).mean() > 0.999


def test_int8_through_tiled_rejected_for_speed_heads():
    model, variables, img, xf = _setup(seed=8)  # speed head: /8 logits
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    with pytest.raises(ValueError, match="full-res heads"):
        make_int8_through_infer(model, variables, pkg, argmax="tiled")


def test_int8_through_argmax_mode():
    model, variables, img, xf = _setup(seed=5)
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=True, dtype=jnp.float32
    )
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    pred = np.asarray(infer(run_pkg, xs))
    assert pred.dtype == np.int32
    assert pred.shape == (1, 8, 16)  # /8 logits of the speed head
    assert (pred >= 0).all() and (pred < 19).all()


def test_int8_through_x39_matches_float_graph():
    """Xception39 body: int8 depthwise -> per-channel requant folded into
    the quantized pointwise kernels."""
    from torchseg_tpu.deploy.int8_serve import calibrate_channelwise

    model, variables, img, xf = _setup(seed=2, factory=models.bisenet_x39)
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    assert pkg["kind"] == "x39"
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.2, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.85, agree


def test_int8_decoder_matches_float_graph():
    """decoder='int8' (ARM/refine/FFM/head int8-through) must track the
    float graph: requantization at the calibrated glue points adds at most
    ~0.5 LSB per hop on top of the body's weight-quantization error."""
    model, variables, img, xf = _setup(seed=11)
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats, image_mean=MEAN,
                             image_std=STD, decoder="int8")
    assert "dec" in pkg
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.2, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.88, agree
    # and against the bf16-decoder int8 graph (same body): the decoder
    # conversion itself must add only sub-LSB logit error (argmax can
    # still flip on the near-tie pixels random weights produce, so the
    # invariant is logit-space closeness, measured 0.018 on this seed)
    pkg_b = build_int8_package(variables, stats,
                               image_mean=MEAN, image_std=STD)
    infer_b, run_b = make_int8_through_infer(
        model, variables, pkg_b, argmax=False, dtype=jnp.float32
    )
    base = np.asarray(infer_b(run_b, xs), np.float32)
    rel_dec = np.abs(got - base).mean() / max(np.std(base), 1e-6)
    assert rel_dec < 0.05, rel_dec


def test_int8_decoder_x39():
    from torchseg_tpu.deploy.int8_serve import calibrate_channelwise

    model, variables, img, xf = _setup(seed=12, factory=models.bisenet_x39)
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_package(variables, stats, image_mean=MEAN,
                             image_std=STD, decoder="int8")
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.25, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.85, agree


def test_int8_decoder_tiled_full_res():
    """Int8 decoder composes with the row-tiled full-res epilogue; the
    prediction equals the argmax of the same graph's upsampled scores."""
    model, variables, img, xf = _setup(
        seed=13, factory=lambda **kw: models.bisenet_r18(
            **{k: v for k, v in kw.items() if k != "speed"})
    )
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats, image_mean=MEAN,
                             image_std=STD, decoder="int8")
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    scores_fn, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    ref = np.asarray(jnp.argmax(scores_fn(run_pkg, xs), axis=-1))
    tiled_fn, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax="tiled", dtype=jnp.float32
    )
    pred = np.asarray(tiled_fn(run_pkg, xs))
    assert pred.shape == ref.shape == (1, 64, 128)
    assert (pred == ref).mean() > 0.999


def test_int8_package_decoder_arg_validation():
    model, variables, img, xf = _setup(seed=14)
    with pytest.raises(ValueError, match="decoder"):
        build_int8_package(variables, {}, image_mean=MEAN, image_std=STD,
                           decoder="fp8")


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_package_rejects_unsupported_backbone():
    model = models.bisenet_r101(num_classes=19)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )
    with pytest.raises(ValueError, match="matches neither"):
        build_int8_package(variables, {}, image_mean=MEAN, image_std=STD)


def test_x39_per_tensor_stats_is_actionable():
    """The separable mid scales NEED channel vectors; a scalar-stats table
    must fail with the pointer to calibrate_channelwise."""
    from torchseg_tpu.deploy.quantize import calibrate as scalar_calibrate

    model, variables, img, xf = _setup(seed=3, factory=models.bisenet_x39)
    stats = scalar_calibrate(model, variables, [xf])
    with pytest.raises(ValueError, match="calibrate_channelwise"):
        build_int8_package(variables, stats, image_mean=MEAN, image_std=STD)


def test_missing_calibration_key_is_actionable():
    model, variables, _, _ = _setup(seed=7)
    with pytest.raises(KeyError, match="calibration stats missing"):
        build_int8_package(variables, {"bogus": 1.0},
                           image_mean=MEAN, image_std=STD)


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_speed_cli_int8_through(capsys):
    from torchseg_tpu.tools.speed import main as speed_main

    res = speed_main(["-e", "cityscapes.bisenet.R18.speed",
                      "--input-size", "1x64x128x3",
                      "--chain", "1", "--reps", "1", "--int8-through"])
    assert res["fps"] > 0
    # the auto decoder default resolves to the int8 decoder on
    # classic-stem BiSeNet, and the printed tag reflects the EFFECTIVE
    # decoder (round-4 advisor fix in tools/speed.py)
    assert "[int8-through+dec]" in capsys.readouterr().out
    res = speed_main(["-e", "cityscapes.bisenet.X39.speed",
                      "--input-size", "1x64x128x3",
                      "--chain", "1", "--reps", "1", "--int8-through"])
    assert res["fps"] > 0


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_speed_cli_int8_decoder(capsys):
    from torchseg_tpu.tools.speed import main as speed_main

    res = speed_main(["-e", "cityscapes.bisenet.R18.speed",
                      "--input-size", "1x64x128x3",
                      "--chain", "1", "--reps", "1",
                      "--int8-through", "--int8-decoder"])
    assert res["fps"] > 0
    assert "[int8-through+dec]" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="classic-stem"):
        speed_main(["-e", "ade.pspnet.R50_v1c",
                    "--input-size", "1x64x128x3",
                    "--chain", "1", "--reps", "1",
                    "--int8-through", "--int8-decoder"])


def test_int8_package_save_load_roundtrip(tmp_path):
    """Serving hosts load the prebuilt package instead of re-calibrating:
    save -> load -> infer must match the freshly-built package exactly."""
    from torchseg_tpu.deploy.int8_serve import (
        load_int8_package,
        save_int8_package,
    )

    model, variables, img, xf = _setup(seed=9)
    stats = calibrate(model, variables, [xf])
    pkg = build_int8_package(variables, stats,
                             image_mean=MEAN, image_std=STD)
    path = save_int8_package(str(tmp_path / "r18.int8pkg"), pkg)
    pkg2 = load_int8_package(path)
    assert pkg2["kind"] == pkg["kind"]
    assert pkg2["stem"]["n_sp"] == pkg["stem"]["n_sp"]

    infer1, run1 = make_int8_through_infer(model, variables, pkg,
                                           argmax=True, dtype=jnp.float32)
    infer2, run2 = make_int8_through_infer(model, variables, pkg2,
                                           argmax=True, dtype=jnp.float32)
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    np.testing.assert_array_equal(np.asarray(infer1(run1, xs)),
                                  np.asarray(infer2(run2, xs)))


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_through_pspnet_matches_float_graph():
    """The dilated Bottleneck backbone (deep stem, os8) int8-through +
    bf16 PPM head must track the float PSPNet graph."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_backbone_package,
        calibrate_channelwise,
        make_int8_pspnet_infer,
        prepare_u8_input,
    )

    model = models.pspnet_r50(num_classes=21)
    rng = np.random.default_rng(13)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_backbone_package(variables, stats, depth=50,
                                     image_mean=MEAN, image_std=STD)
    assert pkg["kind"] == "bottleneck50"
    infer, run_pkg = make_int8_pspnet_infer(model, variables, pkg,
                                            argmax=False, dtype=jnp.float32)
    xs = prepare_u8_input(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.25, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.85, agree


def test_int8_backbone_rejects_classic_stem():
    from torchseg_tpu.deploy.int8_serve import build_int8_backbone_package
    from torchseg_tpu.models.resnet import resnet18

    bb = resnet18()  # classic stem
    x = jnp.zeros((1, 64, 64, 3))
    v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="deep-stem"):
        build_int8_backbone_package(
            {"params": {"backbone": v["params"]},
             "batch_stats": {"backbone": v["batch_stats"]}},
            {}, depth=50, image_mean=MEAN, image_std=STD)


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_through_psanet_matches_float_graph():
    """PSANet over the same int8 Bottleneck body (PSA head bf16 via the
    context_blocks passthrough)."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_backbone_package,
        calibrate_channelwise,
        make_int8_pspnet_infer,
        prepare_u8_input,
    )

    # att grid matched to the 64x128 test input (/8 = 8x16 = 128 positions)
    model = models.psanet_r50(num_classes=21, att_channels=128)
    rng = np.random.default_rng(17)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_backbone_package(variables, stats, depth=50,
                                     image_mean=MEAN, image_std=STD)
    infer, run_pkg = make_int8_pspnet_infer(model, variables, pkg,
                                            argmax=False, dtype=jnp.float32)
    xs = prepare_u8_input(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.3, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.8, agree


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_through_dfn_matches_float_graph():
    """DFN over the int8 NON-dilated R101 body: the dual-branch decoder
    reads every stage's values, so all four dequantize (dequant_all)."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_backbone_package,
        calibrate_channelwise,
        make_int8_pspnet_infer,
        prepare_u8_input,
    )

    model = models.dfn_r101(num_classes=19)
    rng = np.random.default_rng(23)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_backbone_package(
        variables, stats, depth=101, image_mean=MEAN, image_std=STD,
        strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
    )
    infer, run_pkg = make_int8_pspnet_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32,
        dequant_all=True,
    )
    xs = prepare_u8_input(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.3, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.8, agree


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_through_fcn_matches_float_graph():
    """FCN-32s over the int8 standard-stride R101 body."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_backbone_package,
        calibrate_channelwise,
        make_int8_pspnet_infer,
        prepare_u8_input,
    )

    model = models.fcn32s_r101(num_classes=21)
    rng = np.random.default_rng(29)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_backbone_package(
        variables, stats, depth=101, image_mean=MEAN, image_std=STD,
        strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
    )
    infer, run_pkg = make_int8_pspnet_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32,
        dequant_all=True,
    )
    xs = prepare_u8_input(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.8, agree


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_through_bisenet_r101_matches_float_graph():
    """BiSeNet-R101: int8 spatial path + int8 deep-stem Bottleneck body +
    bf16 decoder — the last zoo combination."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_bisenet_r101_package,
        calibrate_channelwise,
        make_int8_bisenet_r101_infer,
        prepare_u8_input,
    )

    model = models.bisenet_r101(num_classes=19)
    rng = np.random.default_rng(31)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(9), "dropout": jax.random.PRNGKey(10)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_bisenet_r101_package(variables, stats,
                                          image_mean=MEAN, image_std=STD)
    infer, run_pkg = make_int8_bisenet_r101_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    xs = prepare_u8_input(img, pad=3, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.3, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.8, agree


def test_int8_decoder_x39_matches_float_graph():
    """decoder='int8' also covers the X39 body (same ARM/refine/FFM/head
    decoder params; separable body packs via _sep_pack)."""
    from torchseg_tpu.deploy.int8_serve import calibrate_channelwise

    model, variables, img, xf = _setup(
        seed=15, factory=models.bisenet_x39)
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_package(variables, stats, image_mean=MEAN,
                             image_std=STD, decoder="int8")
    assert "dec" in pkg
    infer, run_pkg = make_int8_through_infer(
        model, variables, pkg, argmax=False, dtype=jnp.float32
    )
    xs = prepare_s2d_input_u8(img, image_mean=MEAN)
    got = np.asarray(infer(run_pkg, xs), np.float32)
    ref = np.asarray(model.apply(variables, xf, train=False), np.float32)
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.std(ref), 1e-6)
    assert rel < 0.25, rel
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.85, agree


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_package_save_load_roundtrip_bottleneck(tmp_path):
    """Round-trip the recursive statics split/merge on a Bottleneck
    package ('layers' tuple + per-block 'stride'/'dilation' ints) — the
    serializer-rewrite cases the classic-stem test doesn't reach."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_backbone_package,
        calibrate_channelwise,
        load_int8_package,
        make_int8_pspnet_infer,
        prepare_u8_input,
        save_int8_package,
    )

    model = models.pspnet_r50(num_classes=21)
    rng = np.random.default_rng(41)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_backbone_package(variables, stats, depth=50,
                                      image_mean=MEAN, image_std=STD)
    pkg2 = load_int8_package(
        save_int8_package(str(tmp_path / "r50.int8pkg"), pkg))
    assert pkg2["kind"] == pkg["kind"]
    assert pkg2["layers"] == pkg["layers"]
    assert all(isinstance(i, int) for i in pkg2["layers"])

    infer1, run1 = make_int8_pspnet_infer(model, variables, pkg,
                                          argmax=True, dtype=jnp.float32)
    infer2, run2 = make_int8_pspnet_infer(model, variables, pkg2,
                                          argmax=True, dtype=jnp.float32)
    xs = prepare_u8_input(img, image_mean=MEAN)
    np.testing.assert_array_equal(np.asarray(infer1(run1, xs)),
                                  np.asarray(infer2(run2, xs)))


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_int8_package_save_load_roundtrip_bisenet_r101(tmp_path):
    """Round-trip the nested 'bb' subtree of the bisenet_r101 package."""
    from torchseg_tpu.deploy.int8_serve import (
        build_int8_bisenet_r101_package,
        calibrate_channelwise,
        load_int8_package,
        make_int8_bisenet_r101_infer,
        prepare_u8_input,
        save_int8_package,
    )

    model = models.bisenet_r101(num_classes=19)
    rng = np.random.default_rng(43)
    img = rng.integers(0, 255, (1, 64, 128, 3)).astype(np.uint8)
    xf = jnp.asarray(_normalize(img))
    variables = model.init(
        {"params": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        xf, train=True,
    )
    stats = calibrate_channelwise(model, variables, [xf])
    pkg = build_int8_bisenet_r101_package(variables, stats,
                                          image_mean=MEAN, image_std=STD)
    pkg2 = load_int8_package(
        save_int8_package(str(tmp_path / "br101.int8pkg"), pkg))
    assert pkg2["bb"]["kind"] == pkg["bb"]["kind"]
    assert pkg2["bb"]["layers"] == pkg["bb"]["layers"]

    infer1, run1 = make_int8_bisenet_r101_infer(model, variables, pkg,
                                                argmax=True,
                                                dtype=jnp.float32)
    infer2, run2 = make_int8_bisenet_r101_infer(model, variables, pkg2,
                                                argmax=True,
                                                dtype=jnp.float32)
    xs = prepare_u8_input(img, pad=3, image_mean=MEAN)
    np.testing.assert_array_equal(np.asarray(infer1(run1, xs)),
                                  np.asarray(infer2(run2, xs)))


def test_int8_package_load_rejects_legacy_format(tmp_path):
    """A blob without the v2 format tag must fail loudly, not KeyError
    deep inside the builder."""
    from flax import serialization

    from torchseg_tpu.deploy.int8_serve import load_int8_package

    path = tmp_path / "legacy.int8pkg"
    legacy = {"statics": {"kind": "classic", "n_sp": 2},
              "arrays": {"stem": {"w": np.zeros((4, 4, 12, 64), np.int8)}}}
    path.write_bytes(serialization.msgpack_serialize(legacy))
    with pytest.raises(ValueError, match="unsupported .int8pkg format"):
        load_int8_package(str(path))
