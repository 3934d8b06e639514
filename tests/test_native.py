"""Native C++ augmentation kernels vs cv2/numpy oracles."""

import cv2
import numpy as np
import pytest

from torchseg_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_resize_bilinear_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    got = native.resize_bilinear(img, 64, 96)
    want = cv2.resize(img, (96, 64), interpolation=cv2.INTER_LINEAR)
    # cv2 interpolates in 11-bit fixed point; ours in double — values may
    # differ by at most 1 ulp of uint8
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.2


def test_resize_nearest_matches_cv2():
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 19, (37, 53)).astype(np.uint8)
    got = native.resize_nearest(gt, 20, 30)
    want = cv2.resize(gt, (30, 20), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(got, want)


def test_hflip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
    np.testing.assert_array_equal(native.hflip(img), img[:, ::-1])


def test_crop_normalize_pad():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    # window hanging off the top-left: 8 rows/cols of pad
    got = native.crop_normalize_pad(img, mean, std, 16, 16, -8, -8, 0.5)
    assert got.shape == (16, 16, 3)
    np.testing.assert_allclose(got[:8, :, :], 0.5)
    want = (img[:8, :8].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got[8:, 8:], want, rtol=1e-5)


def test_crop_pad_labels():
    gt = np.arange(16, dtype=np.int32).reshape(4, 4)
    got = native.crop_pad_labels(gt, 4, 4, 2, 2, 255)
    assert got[0, 0] == 10  # gt[2,2]
    assert got[2, 2] == 255  # out of bounds -> pad
