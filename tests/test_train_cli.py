"""Train-CLI integration on the CPU mesh: the --device-augment paths that
the round-1 advisor flagged (speed experiments' gt downsampling, the DFN
aux-label incompatibility) plus the accumulation flag, end to end through
``train.main``."""

import os

import numpy as np
import pytest

from torchseg_tpu.train import main


def _args(exp, tmp_path, extra=()):
    return [
        "-e", exp, "--synthetic", "--epochs", "1", "--iters", "1",
        "--batch-size", "8", "--crop", "64", "64", "--num-workers", "2",
        "--log-dir", str(tmp_path), *extra,
    ]


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_speed_experiment_device_augment_trains(tmp_path):
    """gt_down_sampling=8 experiments must train under --device-augment:
    labels arrive at /8 matching the heads' /8 logits (used to shape-error
    in prob_ohem_cross_entropy)."""
    state = main(_args("cityscapes.bisenet.R18.speed", tmp_path,
                       ["--device-augment"]))
    assert int(state.step) == 1
    snap = tmp_path / "cityscapes.bisenet.R18.speed" / "snapshot"
    assert (snap / "epoch-0.ckpt").exists()


def test_dfn_device_augment_rejected(tmp_path):
    with pytest.raises(SystemExit, match="device-augment"):
        main(_args("cityscapes.dfn.R101_v1c", tmp_path, ["--device-augment"]))
