"""Checkpoint-grafting parity: a torch ResNet (built in-test from the standard
architecture) and our Flax ResNet must produce identical eval-mode features
after converting the torch state_dict."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from torchseg_tpu.models.resnet import ResNet, BasicBlock
from torchseg_tpu.utils.torch_convert import (
    convert_resnet_state_dict,
    graft,
    _to_numpy_state_dict,
)


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + r)


class TorchMiniResNet(nn.Module):
    """resnet18-shaped with 1 block per layer (keys match torch resnet)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, 2))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.normal(size=m.running_mean.shape).astype("f"))
            )
            m.running_var.copy_(
                torch.from_numpy(
                    (rng.random(m.running_var.shape) + 0.5).astype("f")
                )
            )
            m.weight.data.copy_(
                torch.from_numpy(rng.normal(size=m.weight.shape).astype("f"))
            )
            m.bias.data.copy_(
                torch.from_numpy(rng.normal(size=m.bias.shape).astype("f"))
            )


def test_forward_parity_after_conversion():
    rng = np.random.default_rng(0)
    tmodel = TorchMiniResNet().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    sd = _to_numpy_state_dict(
        {k: v for k, v in tmodel.state_dict().items()}
    )
    src_params, src_stats = convert_resnet_state_dict(sd)

    fmodel = ResNet(block_cls=BasicBlock, layers=(1, 1, 1, 1))
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = graft(jax.tree.map(np.asarray, variables["params"]), src_params)
    stats = graft(
        jax.tree.map(np.asarray, variables["batch_stats"]), src_stats
    )

    feats = fmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))

    for f, tf in zip(feats, tfeats):
        np.testing.assert_allclose(
            np.asarray(f),
            tf.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4,
            atol=1e-4,
        )


def test_deep_stem_key_map():
    from torchseg_tpu.utils.torch_convert import resnet_key_map

    assert resnet_key_map("conv1.0.weight") == (("stem_conv1",), "conv")
    assert resnet_key_map("conv1.1.running_mean") == (("stem_bn1",), "bn_stat")
    assert resnet_key_map("conv1.3.weight") == (("stem_conv2",), "conv")
    assert resnet_key_map("conv1.6.weight") == (("stem_conv3",), "conv")
    assert resnet_key_map("layer3.5.downsample.1.weight") == (
        ("layer3_5", "downsample_bn"),
        "bn_param",
    )
    assert resnet_key_map("fc.weight") == ((), "skip")
    assert resnet_key_map("layer1.0.bn1.num_batches_tracked")[1] == "skip"
