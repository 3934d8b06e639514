"""Data pipeline tests: transforms, manifest dataset IO, loader batching,
DFN border labels."""

import os
import tempfile

import cv2
import numpy as np
import pytest

from torchseg_tpu.data import transforms as T
from torchseg_tpu.data.base import ManifestDataset, SyntheticDataset
from torchseg_tpu.data.cityscapes import Cityscapes
from torchseg_tpu.data.preprocess import SegTrainPre, ADETrainPre, DFNTrainPre
from torchseg_tpu.data.loader import TrainLoader


def test_pad_image_to_shape_margins():
    img = np.ones((5, 8, 3), np.float32)
    out, margin = T.pad_image_to_shape(img, (9, 8), 0)
    assert out.shape == (9, 8, 3)
    assert list(margin) == [2, 2, 0, 0]
    out, margin = T.pad_image_to_shape(img, (5, 11), 0)
    assert out.shape == (5, 11, 3)
    assert list(margin) == [0, 0, 1, 2]


def test_pad_to_multiples():
    img = np.zeros((33, 65), np.uint8)
    out, _ = T.pad_image_size_to_multiples_of(img, 32, 0)
    assert out.shape == (64, 96)


def test_normalize():
    img = np.full((2, 2, 3), 255, np.uint8)
    out = T.normalize(img, np.array([0.5, 0.5, 0.5]), np.array([0.25, 1, 1]))
    np.testing.assert_allclose(out[..., 0], 2.0)
    np.testing.assert_allclose(out[..., 1], 0.5)


def test_random_scale_interp():
    rng = np.random.default_rng(0)
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1).repeat(3, axis=2)
    gt = np.arange(16, dtype=np.uint8).reshape(4, 4)
    img2, gt2, s = T.random_scale(rng, img, gt, [2.0])
    assert s == 2.0 and img2.shape[:2] == (8, 8) and gt2.shape == (8, 8)
    # nearest keeps original label values only
    assert set(np.unique(gt2)) <= set(range(16))


def test_seg_train_pre_shapes():
    pre = SegTrainPre(
        np.array([0.485, 0.456, 0.406]),
        np.array([0.229, 0.224, 0.225]),
        crop_size=32,
        train_scale_array=[0.75, 1, 1.5],
    )
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).integers(0, 255, (41, 53, 3)).astype(np.uint8)
    gt = np.random.default_rng(2).integers(0, 19, (41, 53)).astype(np.uint8)
    p_img, p_gt, extra = pre(rng, img, gt)
    assert p_img.shape == (32, 32, 3) and p_img.dtype == np.float32
    assert p_gt.shape == (32, 32) and p_gt.dtype == np.int32
    assert extra is None


def test_ade_pre_shifts_labels():
    pre = ADETrainPre(np.zeros(3), np.ones(3), crop_size=64)  # forces padding
    rng = np.random.default_rng(0)
    img = np.zeros((32, 32, 3), np.uint8)
    gt = np.ones((32, 32), np.uint8)  # class 1 -> 0 after shift
    p_img, p_gt, _ = pre(rng, img, gt)
    vals = set(np.unique(p_gt))
    assert vals == {-1, 0}  # padded 0 -> -1 (ignore), class 1 -> 0


def test_dfn_pre_aux_label():
    pre = DFNTrainPre(np.zeros(3), np.ones(3), crop_size=32)
    rng = np.random.default_rng(0)
    img = np.zeros((32, 32, 3), np.uint8)
    gt = np.zeros((32, 32), np.uint8)
    gt[:, 16:] = 5  # a vertical boundary
    _, p_gt, extra = pre(rng, img, gt)
    aux = extra["aux_label"]
    assert aux.shape == (32, 32)
    assert set(np.unique(aux)) <= {0, 1}
    assert aux.sum() > 0  # the edge was detected and dilated


def test_manifest_dataset_roundtrip(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (10, 12, 3)).astype(np.uint8)
    gt = np.random.default_rng(1).integers(0, 19, (10, 12)).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "img0.png"), img)
    cv2.imwrite(str(tmp_path / "gt0.png"), gt)
    manifest = tmp_path / "train.txt"
    manifest.write_text("img0.png\tgt0.png\n")
    ds = Cityscapes(
        {
            "img_root": str(tmp_path),
            "gt_root": str(tmp_path),
            "train_source": str(manifest),
            "eval_source": str(manifest),
        },
        "train",
        preprocess=None,
    )
    item = ds[0]
    assert item["image"].shape == (10, 12, 3)
    # BGR file read reversed to RGB
    np.testing.assert_array_equal(item["image"][..., 0], img[..., 2])
    np.testing.assert_array_equal(item["label"], gt)
    assert item["fn"] == "gt0"


def test_oversampled_length():
    ds = SyntheticDataset(num_items=7)
    loader = TrainLoader(ds, batch_size=4, num_workers=2)
    assert len(loader) == 1  # 7 // 4, drop_last


def test_loader_batches():
    pre = SegTrainPre(np.zeros(3), np.ones(3), crop_size=16)
    ds = SyntheticDataset(num_items=16, image_hw=(24, 24), preprocess=pre)
    loader = TrainLoader(ds, batch_size=8, num_workers=4, seed=1)
    loader.set_epoch(0)
    batches = list(iter(loader))
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (8, 16, 16, 3)
    assert b["label"].shape == (8, 16, 16)
    # different epochs shuffle differently
    loader.set_epoch(1)
    b2 = next(iter(loader))
    assert not np.array_equal(b["image"], b2["image"])


def test_cityscapes_transform_label():
    pred = np.array([[0, 1], [18, 5]])
    label, name = Cityscapes.transform_label(pred, "frankfurt_000000_000294_x.png")
    np.testing.assert_array_equal(label, [[7, 8], [33, 17]])
    assert name == "frankfurt_000000_000294.png"


def test_labelid_trainid_roundtrip():
    lid = np.array([[7, 8, 0], [33, 26, 99]], np.uint8)
    tid = Cityscapes.labelid_to_trainid(lid)
    np.testing.assert_array_equal(tid, [[0, 1, 255], [18, 13, 255]])


def test_make_manifest_cityscapes(tmp_path):
    from torchseg_tpu.tools.make_manifest import main as mk

    root = tmp_path / "cs"
    img = root / "leftImg8bit" / "val" / "frankfurt"
    gt = root / "gtFine" / "val" / "frankfurt"
    img.mkdir(parents=True)
    gt.mkdir(parents=True)
    stem = "frankfurt_000000_000294"
    cv2.imwrite(str(img / f"{stem}_leftImg8bit.png"),
                np.zeros((4, 4, 3), np.uint8))
    cv2.imwrite(str(gt / f"{stem}_gtFine_labelTrainIds.png"),
                np.zeros((4, 4), np.uint8))
    out = tmp_path / "val.txt"
    mk(["cityscapes", str(root), "--split", "val", "--out", str(out)])
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 1
    a, b = lines[0].split("\t")
    assert a.endswith("_leftImg8bit.png") and "labelTrainIds" in b


def test_loader_early_exit_no_leak():
    import threading

    pre = SegTrainPre(np.zeros(3), np.ones(3), crop_size=16)
    ds = SyntheticDataset(num_items=64, image_hw=(24, 24), preprocess=pre)
    loader = TrainLoader(ds, batch_size=4, num_workers=2, prefetch=1)
    loader.set_epoch(0)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # consumer bails early
    import time as _t

    for _ in range(50):  # producer should exit promptly via the stop flag
        if threading.active_count() <= before:
            break
        _t.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_camvid_pcontext_metadata():
    from torchseg_tpu.data import CamVid, PascalContext

    assert len(CamVid.get_class_names()) == 11
    assert len(CamVid.get_class_colors()) == 11
    gt = np.array([[0, 11], [5, 11]], np.uint8)
    np.testing.assert_array_equal(
        CamVid.remap_void(gt), [[0, 255], [5, 255]]
    )
    assert len(PascalContext.get_class_names()) == 59
    assert len(PascalContext.get_class_colors()) == 60


def test_native_preprocess_matches_cv2():
    """SegTrainPre native path vs cv2 path with identical rng streams."""
    from torchseg_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    kw = dict(crop_size=32, train_scale_array=[0.75, 1.0, 1.5])
    pre_nat = SegTrainPre(mean, std, use_native=True, **kw)
    pre_cv = SegTrainPre(mean, std, use_native=False, **kw)
    assert pre_nat._native is not None and pre_cv._native is None

    img = np.random.default_rng(1).integers(0, 255, (41, 53, 3)).astype(np.uint8)
    gt = np.random.default_rng(2).integers(0, 19, (41, 53)).astype(np.uint8)
    for seed in range(4):
        a_img, a_gt, _ = pre_nat(np.random.default_rng(seed), img, gt)
        b_img, b_gt, _ = pre_cv(np.random.default_rng(seed), img, gt)
        assert a_img.shape == b_img.shape == (32, 32, 3)
        # resize rounding: native vs cv2 fixed-point differ by <=1 uint8 ulp
        np.testing.assert_allclose(a_img, b_img, atol=2.5 / 255 / std.min())
        agree = (a_gt == b_gt).mean()
        assert agree > 0.97, agree  # nearest-neighbor boundary rounding


def test_ade_palette_matches_reference_color150():
    """The embedded ADE palette must equal the reference's color150.mat
    (channel-flipped, [0,0,0] prepended — ade.py:34-41)."""
    import scipy.io as sio

    from torchseg_tpu.data.ade import ADE

    mat = sio.loadmat("/root/reference/furnace/datasets/ade/color150.mat")
    want = mat["colors"][:, ::-1].astype(int).tolist()
    got = ADE.get_class_colors()
    assert got[0] == [0, 0, 0]
    assert got[1:] == want
    assert len(got) == 151


def test_prefetch_to_device_preserves_order_and_shards():
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.data.loader import prefetch_to_device
    from torchseg_tpu.engine.trainer import make_data_mesh

    mesh = make_data_mesh(jax.devices()[:4])
    batches = [
        {"image": np.full((8, 4, 4, 3), i, np.float32),
         "label": np.full((8, 4, 4), i, np.int32),
         "fn": [f"f{i}"] * 8}
        for i in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), mesh))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert set(b) == {"image", "label"}  # non-arrays filtered
        assert float(b["image"][0, 0, 0, 0]) == i  # order preserved
        assert len(b["image"].sharding.device_set) == 4
