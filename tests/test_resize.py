"""resize_bilinear_align_corners must match torch F.interpolate
(mode='bilinear', align_corners=True) — torch (CPU) is the independent oracle
for the semantics TorchSeg relies on in every head upsample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from torchseg_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample_by_scale,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((8, 8), (16, 16)),
        ((7, 13), (56, 104)),
        ((1, 1), (32, 64)),  # global-context broadcast case
        ((16, 32), (8, 16)),  # downsample
        ((5, 5), (5, 5)),  # identity
        ((4, 6), (4, 17)),  # width-only
    ],
)
def test_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)

    got = np.asarray(resize_bilinear_align_corners(x, out_hw))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scale_factor():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 9, 4)).astype(np.float32)
    got = np.asarray(upsample_by_scale(x, 8))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(xt, scale_factor=8, mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hwc_rank3():
    x = np.arange(24, dtype=np.float32).reshape(4, 3, 2)
    got = np.asarray(resize_bilinear_align_corners(x, (8, 6)))
    assert got.shape == (8, 6, 2)
