"""File-based end-to-end rehearsal — the real-data runbook through REAL
file IO: build a tiny on-disk fake Cityscapes (PNG files in the official
layout), derive manifests with tools/make_manifest, train via the train CLI,
then evaluate (ss + msf + --submit + -p + -s) via the eval CLI.

This is the dress rehearsal for the mIoU-parity runs (REPRODUCE.md §5): the
moment real datasets/weights land, the same commands run unchanged.
Reference manifest convention: furnace/datasets/BaseDataset.py:101-108;
on-disk layout: the standard cityscapes leftImg8bit/gtFine tree.
"""

import dataclasses
import os

import cv2
import numpy as np
import pytest

from torchseg_tpu import eval as eval_mod
from torchseg_tpu.data.cityscapes import Cityscapes
from torchseg_tpu.tools.make_manifest import main as make_manifest
from torchseg_tpu.train import main as train_main

pytestmark = pytest.mark.slow  # heavy tier: see TESTING.md

HW = (64, 128)
EXP = "cityscapes.bisenet.R18"


def _build_fake_cityscapes(root, split, n, seed):
    rng = np.random.default_rng(seed)
    stems = []
    img_dir = root / "leftImg8bit" / split / "faketown"
    gt_dir = root / "gtFine" / split / "faketown"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    for i in range(n):
        stem = f"faketown_{i:06d}_000019"
        img = rng.integers(0, 255, (*HW, 3)).astype(np.uint8)
        gt = rng.integers(0, 19, HW).astype(np.uint8)
        gt[:4, :4] = 255  # ignore region exercises the mask path
        assert cv2.imwrite(str(img_dir / f"{stem}_leftImg8bit.png"), img)
        assert cv2.imwrite(
            str(gt_dir / f"{stem}_gtFine_labelTrainIds.png"), gt
        )
        stems.append(stem)
    return stems


@pytest.fixture()
def small_eval_protocol(monkeypatch):
    """Shrink the experiment's eval protocol to the fake-image scale; the
    command surface stays identical to the real run."""
    orig = eval_mod.get_experiment

    def small(name):
        return dataclasses.replace(
            orig(name), eval_base_size=64, eval_crop_size=64,
            eval_scale_array=(1.0,), eval_ms_scale_array=(0.5, 1.0),
        )

    monkeypatch.setattr(eval_mod, "get_experiment", small)


def test_runbook_manifest_train_eval_submit(tmp_path, small_eval_protocol):
    root = tmp_path / "cityscapes"
    _build_fake_cityscapes(root, "train", 4, seed=0)
    stems = _build_fake_cityscapes(root, "val", 2, seed=1)

    # 1. manifests from the on-disk layout (tools/make_manifest)
    train_txt = str(tmp_path / "train.txt")
    val_txt = str(tmp_path / "val.txt")
    make_manifest(["cityscapes", str(root), "--split", "train",
                   "--out", train_txt])
    make_manifest(["cityscapes", str(root), "--split", "val",
                   "--out", val_txt])
    lines = open(train_txt).read().strip().split("\n")
    assert len(lines) == 4
    img_rel, gt_rel = lines[0].split("\t")
    assert os.path.exists(os.path.join(root, img_rel))
    assert os.path.exists(os.path.join(root, gt_rel))
    assert "labelTrainIds" in gt_rel  # prefers train-id gt when present

    # 2. train through real file IO
    log_dir = tmp_path / "log"
    state = train_main([
        "-e", EXP, "--img-root", str(root), "--gt-root", str(root),
        "--train-source", train_txt, "--epochs", "1", "--iters", "2",
        "--batch-size", "8", "--crop", "64", "64", "--num-workers", "2",
        "--log-dir", str(log_dir),
    ])
    assert int(state.step) == 2
    snap = log_dir / EXP / "snapshot"
    assert (snap / "epoch-0.ckpt").exists()
    assert (snap / "epoch-last.ckpt").exists()

    # 3. single-scale eval + submission remap + prediction dump + composites
    submit = tmp_path / "submit"
    preds = tmp_path / "preds"
    shows = tmp_path / "shows"
    results = eval_mod.main([
        "-e", EXP, "--img-root", str(root), "--gt-root", str(root),
        "--eval-source", val_txt, "--snapshot-dir", str(snap),
        "--epochs", "0", "--log-dir", str(log_dir),
        "--submit", str(submit), "-p", str(preds), "-s", str(shows),
    ])
    assert len(results) == 1
    epoch, miou = results[0]
    assert epoch == 0 and np.isfinite(miou) and 0.0 <= miou <= 1.0

    # submission PNGs: train ids remapped to official label ids, submission
    # filename convention (stem without the _gtFine suffix)
    sub_files = sorted(os.listdir(submit))
    assert len(sub_files) == 2
    for f in sub_files:
        out = cv2.imread(str(submit / f), cv2.IMREAD_GRAYSCALE)
        assert out.shape == HW
        assert set(np.unique(out)) <= set(Cityscapes.trans_labels)
    # transform_label strips the last filename component (the reference's
    # submission-name convention, cityscapes.py:46-47): fn derives from the
    # gt basename "<stem>_gtFine_labelTrainIds" -> "<stem>_gtFine.png"
    assert sub_files[0] == stems[0] + "_gtFine.png"

    assert len(os.listdir(preds)) == 2
    assert len(os.listdir(shows)) == 2

    # val log written + linked
    exp_log = log_dir / EXP
    val_logs = list(exp_log.glob("val_2*.log"))
    assert val_logs and "mIoU" in val_logs[0].read_text()
    assert (exp_log / "val_last.log").exists()
    # per-class table has the real class names
    assert "sidewalk" in val_logs[0].read_text()

    # 4. msf protocol over the same files
    results_msf = eval_mod.main([
        "-e", EXP, "--img-root", str(root), "--gt-root", str(root),
        "--eval-source", val_txt, "--snapshot-dir", str(snap),
        "--epochs", "0", "--log-dir", str(log_dir), "--msf",
    ])
    assert len(results_msf) == 1
    assert np.isfinite(results_msf[0][1])
