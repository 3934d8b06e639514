"""Device-side augmentation vs the host cv2 pipeline with identical
deterministic parameters."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from torchseg_tpu.data.device_augment import (
    AugmentParams,
    augment_sample,
    make_device_augment,
)
from torchseg_tpu.data.transforms import (
    normalize,
    random_crop_pad_to_shape,
)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _host_pipeline(img, gt, flip, scale, oy, ox, crop):
    if flip:
        img, gt = img[:, ::-1], gt[:, ::-1]
    sh, sw = int(img.shape[0] * scale), int(img.shape[1] * scale)
    img = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_LINEAR)
    gt = cv2.resize(gt, (sw, sh), interpolation=cv2.INTER_NEAREST)
    imgf = normalize(img, MEAN, STD)
    p_img, _ = random_crop_pad_to_shape(imgf, (oy, ox), crop, 0)
    p_gt, _ = random_crop_pad_to_shape(gt, (oy, ox), crop, 255)
    return p_img, p_gt


def _run_case(flip, scale, oy, ox, crop=(32, 32), hw=(40, 56)):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
    gt = rng.integers(0, 19, hw).astype(np.uint8)

    params = AugmentParams(
        flip=jnp.asarray(flip),
        scale=jnp.asarray(scale, jnp.float32),
        off_y=jnp.asarray(oy, jnp.int32),
        off_x=jnp.asarray(ox, jnp.int32),
    )
    d_img, d_gt = augment_sample(
        jnp.asarray(img), jnp.asarray(gt), params, crop, MEAN, STD
    )
    h_img, h_gt = _host_pipeline(img, gt, flip, scale, oy, ox, crop)
    return np.asarray(d_img), np.asarray(d_gt), h_img, h_gt.astype(np.int32)


def test_identity_scale_no_flip():
    d_img, d_gt, h_img, h_gt = _run_case(False, 1.0, 3, 7)
    np.testing.assert_allclose(d_img, h_img, atol=3e-2)  # cv2 fixed-point
    np.testing.assert_array_equal(d_gt, h_gt)


def test_flip():
    d_img, d_gt, h_img, h_gt = _run_case(True, 1.0, 0, 0)
    np.testing.assert_allclose(d_img, h_img, atol=3e-2)
    np.testing.assert_array_equal(d_gt, h_gt)


def test_upscale_crop():
    d_img, d_gt, h_img, h_gt = _run_case(False, 1.5, 5, 9)
    np.testing.assert_allclose(d_img, h_img, atol=5e-2)
    assert (d_gt == h_gt).mean() > 0.99  # nearest boundary rounding


def test_downscale_pad():
    # scale 0.5 of (40,56) -> (20,28) < crop 32 => center pad
    d_img, d_gt, h_img, h_gt = _run_case(False, 0.5, 0, 0)
    np.testing.assert_allclose(d_img, h_img, atol=5e-2)
    assert (d_gt == h_gt).mean() > 0.99
    assert (d_gt == 255).any()  # padding present


def test_batched_jit_runs():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (4, 40, 56, 3)).astype(np.uint8)
    gts = rng.integers(0, 19, (4, 40, 56)).astype(np.uint8)
    aug = make_device_augment((32, 32), (0.75, 1.0, 1.5), MEAN, STD)
    out_img, out_gt = aug(jax.random.PRNGKey(0), jnp.asarray(imgs),
                          jnp.asarray(gts))
    assert out_img.shape == (4, 32, 32, 3) and out_img.dtype == jnp.float32
    assert out_gt.shape == (4, 32, 32) and out_gt.dtype == jnp.int32
    # different key -> different augmentation
    out_img2, _ = aug(jax.random.PRNGKey(1), jnp.asarray(imgs),
                      jnp.asarray(gts))
    assert not np.allclose(np.asarray(out_img), np.asarray(out_img2))


def test_random_param_distributions():
    """flip ~ Bernoulli(0.5); scale drawn uniformly from the array."""
    from torchseg_tpu.data.device_augment import sample_params

    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    flips, scales = [], []
    for k in keys:
        p = sample_params(k, (64, 64), (32, 32), (0.75, 1.0, 1.25))
        flips.append(bool(p.flip))
        scales.append(float(p.scale))
    assert 0.4 < np.mean(flips) < 0.6
    import collections

    counts = collections.Counter(scales)
    assert set(counts) == {0.75, 1.0, 1.25}
    assert min(counts.values()) > 400 / 3 * 0.6


def test_gt_down_sampling_matches_cv2_post_resize():
    """gt_down composes the speed-variant label downsample (reference
    model/bisenet/*.speed/dataloader.py:28-30): the coarse labels must equal
    cv2.INTER_NEAREST applied to the full-res augmented labels."""
    rng = np.random.default_rng(5)
    hw, crop, k = (64, 96), (32, 64), 8
    img = rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
    gt = rng.integers(0, 19, hw).astype(np.uint8)
    for flip, scale, oy, ox in [
        (False, 1.0, 3, 7),
        (True, 1.5, 9, 2),
        (False, 0.75, 0, 0),
    ]:
        params = AugmentParams(
            jnp.asarray(flip), jnp.asarray(scale, jnp.float32),
            jnp.asarray(oy), jnp.asarray(ox),
        )
        _, full = augment_sample(
            jnp.asarray(img), jnp.asarray(gt), params, crop, MEAN, STD
        )
        _, coarse = augment_sample(
            jnp.asarray(img), jnp.asarray(gt), params, crop, MEAN, STD,
            gt_down=k,
        )
        want = cv2.resize(
            np.asarray(full).astype(np.uint8),
            (crop[1] // k, crop[0] // k),
            interpolation=cv2.INTER_NEAREST,
        )
        np.testing.assert_array_equal(np.asarray(coarse), want)


def test_make_device_augment_gt_down_shapes():
    fn = make_device_augment((32, 64), (1.0,), MEAN, STD, gt_down=8)
    imgs = np.zeros((2, 40, 70, 3), np.uint8)
    gts = np.zeros((2, 40, 70), np.uint8)
    out_img, out_gt = fn(jax.random.PRNGKey(0), jnp.asarray(imgs),
                         jnp.asarray(gts))
    assert out_img.shape == (2, 32, 64, 3)
    assert out_gt.shape == (2, 4, 8)


def test_augment_lowers_gather_free():
    """Perf regression guard: the five per-pixel gathers cost 100 ms/batch
    on v5e; the separable interp-matrix formulation of augment_sample must
    lower without any gather primitive (1.5 ms measured — docs/DESIGN.md
    round 2).  (The batched wrapper keeps one tiny scale-table pick.)"""

    def _prims(jaxpr, acc):
        for eqn in jaxpr.eqns:
            acc.add(eqn.primitive.name)
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    _prims(p.jaxpr, acc)
                if isinstance(p, (list, tuple)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            _prims(q.jaxpr, acc)
        return acc

    params = AugmentParams(
        jnp.asarray(True), jnp.asarray(1.5, jnp.float32),
        jnp.asarray(3), jnp.asarray(5),
    )
    jaxpr = jax.make_jaxpr(
        lambda img, gt: augment_sample(img, gt, params, (32, 64), MEAN, STD,
                                       gt_down=8)
    )(
        jnp.zeros((40, 70, 3), jnp.uint8),
        jnp.zeros((40, 70), jnp.uint8),
    ).jaxpr
    prims = _prims(jaxpr, set())
    assert "gather" not in prims, sorted(prims)
