"""Full-model numeric forward parity vs the ACTUAL reference networks.

Each test imports the reference experiment's ``network.py`` from
``/root/reference/model/...`` (torch, CPU, eval mode, plain ``nn.BatchNorm2d``)
as an *oracle*, fills every parameter and BN running stat with well-conditioned
random values, converts the state_dict with ``convert_model_state_dict``, and
asserts that our Flax model produces the same eval-mode logits to 1e-4.

This pins the entire graft mapping *numerically* (not just by shape): a
misrouted FFM ca1/ca2, swapped ARM index, or wrong DFN RRB would fail here.
It is the dataset-free half of the <=0.3-mIoU parity protocol (BASELINE.md).
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from torchseg_tpu import models
from torchseg_tpu.utils.torch_convert import (
    _to_numpy_state_dict,
    graft_full_checkpoint,
)

pytestmark = pytest.mark.slow  # heavy tier: see TESTING.md

REF = "/root/reference"
FURNACE = REF + "/furnace"


def load_ref_network(exp_dir: str, num_classes: int):
    """Import /root/reference/model/<exp_dir>/network.py with a stubbed
    ``config`` module (the real config.py requires a TorchSeg-rooted cwd and
    dataset paths; the networks only read num_classes/bn_eps/bn_momentum and
    FCN's aux_loss_ratio)."""
    if FURNACE not in sys.path:
        sys.path.insert(0, FURNACE)
    cfg = types.SimpleNamespace(
        num_classes=num_classes, bn_eps=1e-5, bn_momentum=0.1,
        aux_loss_ratio=0.5,
    )
    cfg_mod = types.ModuleType("config")
    cfg_mod.config = cfg
    prev = sys.modules.get("config")
    sys.modules["config"] = cfg_mod
    try:
        name = "refnet_" + exp_dir.replace("/", "_").replace(".", "_")
        spec = importlib.util.spec_from_file_location(
            name, f"{REF}/model/{exp_dir}/network.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if prev is None:
            sys.modules.pop("config", None)
        else:
            sys.modules["config"] = prev
    return mod


def randomize_(model: nn.Module, seed: int = 0):
    """Fill EVERY float leaf (conv/linear weights, BN gamma/beta AND running
    stats) with random but well-conditioned values so activations stay O(1)
    through 100+ layers and any mapping error shows in the output."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for k, v in model.state_dict().items():
            if not v.is_floating_point():
                continue
            if v.ndim >= 2:  # conv (OIHW) / linear (OI) weights
                fan_in = v[0].numel()
                v.copy_(torch.randn(v.shape, generator=g) / math.sqrt(fan_in))
            elif k.endswith("running_var"):
                v.copy_(0.5 + torch.rand(v.shape, generator=g))
            elif k.endswith(".weight"):  # BN gamma: positive-ish O(1)
                v.copy_(1.0 + 0.3 * torch.randn(v.shape, generator=g))
            else:  # biases, running_mean
                v.copy_(0.3 * torch.randn(v.shape, generator=g))


def assert_forward_parity(tmodel, fmodel, family, hw, seed=0, tol=1e-4):
    tmodel = tmodel.eval()
    randomize_(tmodel, seed)
    sd = _to_numpy_state_dict(dict(tmodel.state_dict()))

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, *hw, 3)).astype(np.float32)

    variables = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False
    )
    variables = dict(variables)
    grafted = graft_full_checkpoint(sd, variables, family)
    got = np.asarray(
        fmodel.apply(
            {"params": grafted["params"],
             "batch_stats": grafted["batch_stats"]},
            jnp.asarray(x),
            train=False,
        )
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_bisenet_r18_forward_parity():
    ref = load_ref_network("bisenet/cityscapes.bisenet.R18", 19)
    t = ref.BiSeNet(19, None, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.bisenet_r18(19), "bisenet", (96, 96))


def test_bisenet_r18_speed_forward_parity():
    ref = load_ref_network("bisenet/cityscapes.bisenet.R18.speed", 19)
    # speed ctor: (out_planes, is_training, criterion, ohem_criterion);
    # eval mode keeps only the main head with /8 logits (scale 1)
    t = ref.BiSeNet(19, None, None, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(
        t, models.bisenet_r18(19, speed=True), "bisenet", (96, 96)
    )


def test_bisenet_r101_forward_parity():
    ref = load_ref_network("bisenet/cityscapes.bisenet.R101", 19)
    t = ref.BiSeNet(19, None, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.bisenet_r101(19), "bisenet", (96, 96))


def test_bisenet_x39_forward_parity():
    ref = load_ref_network("bisenet/cityscapes.bisenet.X39", 19)
    t = ref.BiSeNet(19, None, None, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.bisenet_x39(19), "bisenet_x39", (96, 96))


def test_bisenet_x39_speed_forward_parity():
    ref = load_ref_network("bisenet/cityscapes.bisenet.X39.speed", 19)
    t = ref.BiSeNet(19, None, None, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(
        t, models.bisenet_x39(19, speed=True), "bisenet_x39", (96, 96)
    )


def test_fcn_forward_parity():
    ref = load_ref_network("fcn/voc.fcn32s.R101_v1c", 21)
    t = ref.FCN(21, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.fcn32s_r101(21), "fcn", (64, 64))


def test_pspnet_forward_parity():
    ref = load_ref_network("pspnet/ade.pspnet.R50_v1c", 150)
    t = ref.PSPNet(150, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.pspnet_r50(150), "pspnet", (96, 96))


def test_dfn_forward_parity():
    ref = load_ref_network("dfn/cityscapes.dfn.R101_v1c", 19)
    t = ref.DFN(19, None, None, 0.1, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.dfn_r101(19), "dfn", (64, 64))


@pytest.mark.slow
def test_psanet_forward_parity():
    """The reference PSA attention is hardcoded to 3600 = 60x60 feature maps
    (network.py:90-105 bmm shapes), so parity requires a 480x480 input through
    the dilated ResNet-50 — the single most expensive test in the suite."""
    ref = load_ref_network("psanet/ade.psanet.R50_v1c", 150)
    t = ref.PSPNet(150, None, norm_layer=nn.BatchNorm2d)  # class named PSPNet
    assert_forward_parity(
        t, models.psanet_r50(150, att_channels=3600), "psanet", (480, 480),
        tol=5e-4,
    )


def test_pspnet_r101_forward_parity():
    ref = load_ref_network("pspnet/ade.pspnet.R101_v1c", 150)
    t = ref.PSPNet(150, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(t, models.pspnet_r101(150), "pspnet", (96, 96))


@pytest.mark.slow
def test_psanet_r101_forward_parity():
    ref = load_ref_network("psanet/ade.psanet.R101_v1c", 150)
    t = ref.PSPNet(150, None, norm_layer=nn.BatchNorm2d)
    assert_forward_parity(
        t, models.psanet_r101(150, att_channels=3600), "psanet", (480, 480),
        tol=5e-4,
    )
