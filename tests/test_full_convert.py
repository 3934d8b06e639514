"""Full-model checkpoint key mapping: representative reference state_dict
keys (derived from the reference network module structure, SURVEY §2.2) must
land on existing leaves of our param trees with the right shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchseg_tpu import models
from torchseg_tpu.utils.torch_convert import (
    convert_model_state_dict,
    map_model_key,
    _flatten,
)

pytestmark = pytest.mark.slow  # heavy tier: see TESTING.md

KEY = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _tree(model, hw=(64, 64)):
    v = model.init(KEY, jnp.zeros((1, *hw, 3)), train=True)
    return (
        _flatten(jax.tree.map(np.asarray, v["params"])),
        _flatten(jax.tree.map(np.asarray, v["batch_stats"])),
    )


def _check(family, model, torch_keys_shapes, hw=(64, 64)):
    """Synthesize a torch sd with the given shapes, convert, and require
    every leaf to exist in our tree with a matching shape."""
    params, stats = _tree(model, hw)
    sd = {k: np.zeros(s, np.float32) for k, s in torch_keys_shapes.items()}
    got_p, got_s = convert_model_state_dict(sd, family)
    for path, v in _flatten(got_p).items():
        assert path in params, (family, path)
        assert params[path].shape == v.shape, (family, path, params[path].shape,
                                               v.shape)
    for path, v in _flatten(got_s).items():
        assert path in stats, (family, path)
        assert stats[path].shape == v.shape, (family, path)
    # everything mapped (no silent skips)
    n_mapped = len(_flatten(got_p)) + len(_flatten(got_s))
    assert n_mapped == len(torch_keys_shapes), (
        family, n_mapped, len(torch_keys_shapes),
        [k for k in torch_keys_shapes if map_model_key(k, family) is None],
    )


def test_bisenet_r18_mapping():
    m = models.bisenet_r18(num_classes=19)
    keys = {
        "context_path.conv1.weight": (64, 3, 7, 7),
        "context_path.bn1.weight": (64,),
        "context_path.layer2.0.downsample.0.weight": (128, 64, 1, 1),
        "context_path.layer2.0.downsample.1.running_var": (128,),
        "context_path.layer4.1.conv2.weight": (512, 512, 3, 3),
        "spatial_path.conv_7x7.conv.weight": (64, 3, 7, 7),
        "spatial_path.conv_3x3_1.bn.running_mean": (64,),
        "spatial_path.conv_1x1.conv.weight": (128, 64, 1, 1),
        "global_context.1.conv.weight": (128, 512, 1, 1),
        "global_context.1.bn.bias": (128,),
        "arms.0.conv_3x3.conv.weight": (128, 512, 3, 3),
        "arms.1.channel_attention.1.conv.weight": (128, 128, 1, 1),
        "arms.1.channel_attention.1.bn.running_var": (128,),
        "refines.0.conv.weight": (128, 128, 3, 3),
        "refines.1.bn.weight": (128,),
        "heads.0.conv_3x3.conv.weight": (256, 128, 3, 3),
        "heads.0.conv_1x1.weight": (19, 256, 1, 1),
        "heads.0.conv_1x1.bias": (19,),
        "heads.2.conv_3x3.conv.weight": (64, 256, 3, 3),
        "heads.2.conv_1x1.weight": (19, 64, 1, 1),
        "ffm.conv_1x1.conv.weight": (256, 256, 1, 1),
        "ffm.conv_1x1.bn.running_mean": (256,),
        "ffm.channel_attention.1.conv.weight": (256, 256, 1, 1),
        "ffm.channel_attention.2.conv.weight": (256, 256, 1, 1),
    }
    _check("bisenet", m, keys)


def test_bisenet_x39_mapping():
    m = models.bisenet_x39(num_classes=19)
    keys = {
        "context_path.conv1.conv.weight": (8, 3, 3, 3),
        "context_path.conv1.bn.running_mean": (8,),
        "context_path.layer1.0.proj.conv1.weight": (8, 1, 3, 3),
        "context_path.layer1.0.proj.point_wise_cbr.conv.weight": (64, 8, 1, 1),
        "context_path.layer2.3.residual_branch.0.conv1.weight": (128, 1, 3, 3),
        "context_path.layer2.3.residual_branch.0.point_wise_cbr.bn.weight":
            (32,),
        "context_path.layer3.0.residual_branch.2.point_wise_cbr.conv.weight":
            (256, 64, 1, 1),
        "spatial_path.conv_7x7.conv.weight": (64, 3, 7, 7),
        "heads.2.conv_1x1.weight": (19, 64, 1, 1),
    }
    _check("bisenet_x39", m, keys)


def test_fcn_mapping():
    m = models.fcn32s_r101(num_classes=21)
    keys = {
        "backbone.conv1.0.weight": (64, 3, 3, 3),      # v1c deep stem
        "backbone.conv1.1.running_mean": (64,),
        "backbone.conv1.6.weight": (128, 64, 3, 3),
        "backbone.layer1.0.conv3.weight": (256, 64, 1, 1),
        "head.cbr.conv.weight": (512, 2048, 3, 3),
        "head.cbr.bn.running_var": (512,),
        "head.conv1x1.weight": (21, 512, 1, 1),
        "head.conv1x1.bias": (21,),
        "aux_head.cbr.conv.weight": (256, 1024, 3, 3),
        "aux_head.conv1x1.weight": (21, 256, 1, 1),
    }
    _check("fcn", m, keys)


def test_pspnet_mapping():
    m = models.pspnet_r50(num_classes=150)
    keys = {
        "backbone.layer4.2.bn3.weight": (2048,),
        "psp_layer.ppm.0.psp/cbr.conv.weight": (512, 2048, 1, 1),
        "psp_layer.ppm.3.psp/cbr.bn.running_mean": (512,),
        "psp_layer.conv6.0.conv.weight": (512, 4096, 3, 3),
        "psp_layer.conv6.0.bn.bias": (512,),
        "psp_layer.conv6.2.weight": (150, 512, 1, 1),
        "psp_layer.conv6.2.bias": (150,),
        "aux_layer.0.conv.weight": (1024, 1024, 3, 3),
        "aux_layer.2.weight": (150, 1024, 1, 1),
        "aux_layer.2.bias": (150,),
    }
    _check("pspnet", m, keys, hw=(96, 96))


def test_psanet_mapping():
    m = models.psanet_r50(num_classes=150, att_channels=144)
    keys = {
        "psa_layer.collect_reduction.conv.weight": (512, 2048, 1, 1),
        "psa_layer.collect_attention.0.conv.weight": (512, 512, 1, 1),
        "psa_layer.collect_attention.0.bn.running_var": (512,),
        "psa_layer.collect_attention.1.conv.weight": (144, 512, 1, 1),
        "psa_layer.distribute_attention.1.conv.weight": (144, 512, 1, 1),
        "psa_layer.proj.conv.weight": (2048, 1024, 1, 1),
        "psa_layer.conv6.0.conv.weight": (512, 4096, 3, 3),
        "psa_layer.conv6.2.weight": (150, 512, 1, 1),
        "aux_layer.0.conv.weight": (1024, 1024, 3, 3),
    }
    _check("psanet", m, keys, hw=(96, 96))


def test_dfn_mapping():
    m = models.dfn_r101(num_classes=19)
    keys = {
        "global_context.1.conv.weight": (512, 2048, 1, 1),
        "smooth_pre_rrbs.0.conv_1x1.weight": (512, 2048, 1, 1),
        "smooth_pre_rrbs.3.cbr.conv.weight": (512, 512, 3, 3),
        "smooth_pre_rrbs.3.cbr.bn.running_mean": (512,),
        "smooth_aft_rrbs.1.conv_refine.weight": (512, 512, 3, 3),
        "cabs.0.channel_attention.fc.0.weight": (512, 1024),
        "cabs.0.channel_attention.fc.0.bias": (512,),
        "cabs.0.channel_attention.fc.2.weight": (512, 512),
        "smooth_heads.0.rrb.conv_1x1.weight": (171, 512, 1, 1),
        "smooth_heads.0.conv.weight": (19, 171, 1, 1),
        "smooth_heads.0.conv.bias": (19,),
        "border_pre_rrbs.0.conv_1x1.weight": (21, 256, 1, 1),
        "border_aft_rrbs.1.cbr.conv.weight": (21, 21, 3, 3),
        "border_heads.3.conv.weight": (1, 9, 1, 1),
        "border_heads.3.conv.bias": (1,),
    }
    _check("dfn", m, keys)


def test_num_batches_tracked_skipped():
    assert map_model_key(
        "ffm.conv_1x1.bn.num_batches_tracked", "bisenet"
    ) is None
    assert map_model_key(
        "context_path.layer1.0.bn1.num_batches_tracked", "bisenet"
    ) is None


def test_xception_separable_forward_parity():
    """Depthwise-conv transpose convention: a torch separable block (depthwise
    conv + pointwise conv + BN, xception structure) converted to our
    SeparableConvBnRelu must match numerically."""
    import torch

    from torchseg_tpu.ops.blocks import SeparableConvBnRelu
    from torchseg_tpu.utils.torch_convert import (
        convert_model_state_dict,
        graft,
    )

    cin, cout = 8, 16
    torch.manual_seed(0)
    dw = torch.nn.Conv2d(cin, cin, 3, 2, 1, groups=cin, bias=False)
    pw = torch.nn.Conv2d(cin, cout, 1, bias=False)
    bn = torch.nn.BatchNorm2d(cout).eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.normal_()
        bn.bias.normal_()

    # state dict keyed like xception layer1.0.residual_branch.0.*
    sd = {
        "context_path.layer1.0.residual_branch.0.conv1.weight":
            dw.weight.detach().numpy(),
        "context_path.layer1.0.residual_branch.0.point_wise_cbr.conv.weight":
            pw.weight.detach().numpy(),
    }
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        sd[
            "context_path.layer1.0.residual_branch.0.point_wise_cbr.bn."
            + leaf
        ] = getattr(bn, leaf).detach().numpy()
    src_p, src_s = convert_model_state_dict(sd, "bisenet_x39")
    sub_p = src_p["backbone"]["layer1_0"]["sep1"]
    sub_s = src_s["backbone"]["layer1_0"]["sep1"]

    mod = SeparableConvBnRelu(cout, 3, 2, 1, has_relu=False,
                              depthwise_bn=False)
    x = np.random.default_rng(0).normal(size=(1, 10, 12, cin)).astype(
        np.float32
    )
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = graft(jax.tree.map(np.asarray, variables["params"]), sub_p)
    stats = graft(jax.tree.map(np.asarray, variables["batch_stats"]), sub_s)
    got = np.asarray(
        mod.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    with torch.no_grad():
        want = bn(pw(dw(torch.from_numpy(x).permute(0, 3, 1, 2))))
        want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_model_family_covers_registry():
    """Every registry model must resolve to a rules family (the eval CLI's
    --torch-checkpoint path; 'fcn32s_r101' used to KeyError)."""
    from torchseg_tpu.models import MODEL_REGISTRY
    from torchseg_tpu.utils.torch_convert import _MODEL_RULES, model_family

    for name in MODEL_REGISTRY:
        fam = model_family(name)
        assert fam in _MODEL_RULES, (name, fam)
    assert model_family("fcn32s_r101") == "fcn"
    assert model_family("bisenet_x39") == "bisenet_x39"
    with pytest.raises(KeyError):
        model_family("segformer_b0")
