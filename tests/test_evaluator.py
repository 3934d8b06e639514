"""Evaluator mechanics tests with deterministic pixelwise stand-in models:
the crop-grid assembly, pad/unpad margins, flip TTA combination, and the
multi-scale sum must reproduce pixelwise-computable results."""

import numpy as np
import jax.numpy as jnp
import pytest

from torchseg_tpu.engine.evaluator import Evaluator
from torchseg_tpu.data.base import SyntheticDataset

MEAN = np.zeros(3, np.float32)
STD = np.ones(3, np.float32)


def _pixelwise_apply(variables, x):
    """scores per pixel: c0 = gray, c1 = -gray, c2 = 0.2 (constant)."""
    gray = jnp.mean(x, axis=-1)
    return jnp.stack([gray, -gray, jnp.full_like(gray, 0.2)], axis=-1)


def _pixelwise_argmax(img):
    gray = normalize_gray(img)
    scores = np.stack([gray, -gray, np.full_like(gray, 0.2)], axis=-1)
    return scores.argmax(-1)


def normalize_gray(img):
    return (img.astype(np.float32) / 255.0).mean(-1)


def test_whole_eval_pixelwise():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (33, 47, 3)).astype(np.uint8)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    pred = ev.whole_eval(img)
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_whole_eval_with_padding_margins():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (30, 40, 3)).astype(np.uint8)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    pred = ev.whole_eval(img, output_size=(30, 40), input_size=(48, 48))
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_sliding_eval_small_image_single_crop():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (20, 28, 3)).astype(np.uint8)
    ev = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD, multi_scales=[1.0], crop_size=32
    )
    pred = ev.sliding_eval(img)
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_sliding_eval_crop_grid():
    """Image larger than crop: overlapping-sum assembly must preserve the
    pixelwise argmax (positive exp-scores scale by coverage count only)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (50, 90, 3)).astype(np.uint8)
    ev = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD, multi_scales=[1.0],
        crop_size=32, stride_rate=5 / 6, max_batch=4,
    )
    pred = ev.sliding_eval(img)
    np.testing.assert_array_equal(pred, _pixelwise_argmax(img))


def test_flip_tta_formula():
    """For a position-dependent model, flip TTA must equal
    exp(f(x) + flip(f(flip(x))))."""

    def positional_apply(variables, x):
        b, h, w, _ = x.shape
        col = jnp.tile(
            jnp.arange(w, dtype=jnp.float32)[None, None, :, None], (b, h, 1, 2)
        )
        # class 0 prefers left, class 1 prefers right
        return jnp.stack([-col[..., 0], col[..., 1] - w + 1], axis=-1)

    img = np.zeros((4, 6, 3), np.uint8)
    ev = Evaluator(positional_apply, {}, 2, MEAN, STD, is_flip=True)
    score = ev._forward(
        ev.process_image(img)[None].astype(np.float32)
    )[0]
    # manual: f(x)[c0] = -col ; flipped input col' = w-1-col =>
    # f(flip x)[c0] = -col, flip back => -(w-1-col)
    col = np.arange(6, dtype=np.float32)[None, :].repeat(4, 0)
    want_c0 = np.exp(-col + -(5 - col))
    np.testing.assert_allclose(score[..., 0], want_c0, rtol=1e-5)


def test_multi_scale_runs():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    ev = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD,
        multi_scales=[0.5, 1.0, 1.5], crop_size=48,
    )
    pred = ev.sliding_eval(img)
    assert pred.shape == (40, 60)
    # multi-scale of a pixelwise model still matches on most pixels
    agree = (pred == _pixelwise_argmax(img)).mean()
    assert agree > 0.9


def test_run_dataset_whole():
    ds = SyntheticDataset(num_items=4, image_hw=(24, 24), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    acc = ev.run_dataset(ds, mode="whole", process_index=0, process_count=1)
    assert acc.hist.sum() == 4 * 24 * 24
    iou, miou, _, acc_pix = acc.scores()
    assert iou.shape == (3,)


def test_multidevice_eval_matches_single():
    import jax

    ds = SyntheticDataset(num_items=6, image_hw=(24, 24), num_classes=3)
    ev1 = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    acc1 = ev1.run_dataset(ds, mode="whole", process_index=0, process_count=1)
    evn = Evaluator(
        _pixelwise_apply, {}, 3, MEAN, STD, devices=jax.devices()[:4]
    )
    accn = evn.run_dataset(ds, mode="whole", process_index=0, process_count=1)
    np.testing.assert_array_equal(acc1.hist, accn.hist)
    assert acc1.labeled == accn.labeled and acc1.correct == accn.correct


def test_device_score_resize_matches_cv2():
    """jax.image.resize 'linear' (used for on-device score resize) must match
    cv2.INTER_LINEAR (the reference's score resize, evaluator.py:249-253)."""
    import cv2
    import jax

    rng = np.random.default_rng(11)
    score = rng.normal(size=(13, 17, 5)).astype(np.float32)
    want = cv2.resize(score, (40, 30), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(
        jax.image.resize(jnp.asarray(score), (30, 40, 5), method="linear")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_run_dataset_saves_predictions(tmp_path):
    import os

    ds = SyntheticDataset(num_items=2, image_hw=(16, 16), num_classes=3)
    ev = Evaluator(_pixelwise_apply, {}, 3, MEAN, STD)
    ev.run_dataset(ds, mode="whole", save_pred_dir=str(tmp_path),
                   process_index=0, process_count=1)
    files = sorted(os.listdir(tmp_path))
    assert files == ["0.png", "1.png"]
    import cv2

    pred = cv2.imread(str(tmp_path / "0.png"), cv2.IMREAD_GRAYSCALE)
    assert pred.shape == (16, 16)
