"""Eval-CLI integration: the --torch-checkpoint mIoU-parity protocol path
(load reference .pth -> convert_model_state_dict -> graft -> evaluate) end
to end with the ACTUAL reference FCN as the checkpoint source — the exact
workflow round 3 runs against trained reference checkpoints."""

import numpy as np
import torch
import torch.nn as nn

from torchseg_tpu.eval import main

from test_ref_forward_parity import load_ref_network, randomize_
import pytest

pytestmark = pytest.mark.slow  # heavy tier: see TESTING.md


def test_eval_torch_checkpoint_fcn(tmp_path):
    ref = load_ref_network("fcn/voc.fcn32s.R101_v1c", 21)
    t = ref.FCN(21, None, norm_layer=nn.BatchNorm2d).eval()
    randomize_(t, seed=4)
    ckpt = tmp_path / "epoch-60.pth"
    torch.save({"model": t.state_dict()}, str(ckpt))

    results = main([
        "-e", "voc.fcn32s.R101_v1c", "--synthetic", "1",
        "--torch-checkpoint", str(ckpt), "--log-dir", str(tmp_path / "log"),
    ])
    assert len(results) == 1
    tag, miou = results[0]
    assert tag == "torch"
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
    # the val log was written
    logs = list((tmp_path / "log" / "voc.fcn32s.R101_v1c").glob("val_*.log"))
    assert logs and "torch ckpt" in logs[0].read_text()


def test_eval_torch_checkpoint_bisenet_msf(tmp_path, monkeypatch):
    """The flagship mIoU-parity workflow (BiSeNet-R18, msf sliding protocol)
    on a synthetic reference .pth: .pth -> graft_full_checkpoint -> msf
    sliding eval -> mIoU, with the experiment's protocol shrunk to test
    scale.  Together with the ss-protocol FCN test above, every leg of the
    runbook (docs/REPRODUCE.md §5) is pinned without real data."""
    import dataclasses

    import torchseg_tpu.eval as eval_mod

    orig = eval_mod.get_experiment

    def small(name):
        return dataclasses.replace(
            orig(name), eval_base_size=48, eval_crop_size=48,
            eval_ms_scale_array=(0.75, 1.0),
        )

    monkeypatch.setattr(eval_mod, "get_experiment", small)

    ref = load_ref_network("bisenet/cityscapes.bisenet.R18", 19)
    t = ref.BiSeNet(19, None, None, norm_layer=nn.BatchNorm2d).eval()
    randomize_(t, seed=11)
    ckpt = tmp_path / "epoch-80.pth"
    torch.save({"model": t.state_dict()}, str(ckpt))

    results = main([
        "-e", "cityscapes.bisenet.R18", "--synthetic", "1", "--msf",
        "--torch-checkpoint", str(ckpt), "--log-dir", str(tmp_path / "log"),
    ])
    assert len(results) == 1
    tag, miou = results[0]
    assert tag == "torch"
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
