"""Metric parity: jnp hist vs numpy hist, and ADE-style IoU."""

import numpy as np
import jax.numpy as jnp

from torchseg_tpu.ops.metrics import (
    hist_info,
    hist_info_jax,
    compute_score,
    intersection_and_union,
    mean_iou,
    pixel_accuracy,
    accuracy,
)


def test_hist_jax_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 5, (20, 20))
    gt = rng.integers(-1, 5, (20, 20))  # includes invalid
    h_np, l_np, c_np = hist_info(5, pred, gt)
    h_j, l_j, c_j = hist_info_jax(5, jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_array_equal(np.asarray(h_j), h_np)
    assert int(l_j) == l_np and int(c_j) == c_np


def test_compute_score_perfect():
    pred = np.array([[0, 1], [2, 2]])
    h, labeled, correct = hist_info(3, pred, pred)
    iou, miou, _, acc = compute_score(h, correct, labeled)
    np.testing.assert_allclose(iou, 1.0)
    assert miou == 1.0 and acc == 1.0


def test_ade_intersection_union():
    pred = np.array([[0, 1], [1, 2]])
    label = np.array([[0, 1], [2, -1]])  # -1 = unlabeled
    inter, union = intersection_and_union(pred, label, 3)
    np.testing.assert_array_equal(inter, [1, 1, 0])
    # class0: pred {1} label {1} -> union 1; class1: pred {2} label {1} -> 2
    np.testing.assert_array_equal(union, [1, 2, 1])
    iou, miou, _ = mean_iou(inter[:, None], union[:, None])
    np.testing.assert_allclose(iou, [1.0, 0.5, 0.0])


def test_pixel_accuracy():
    pred = np.array([[0, 1], [1, 2]])
    label = np.array([[0, 1], [2, -1]])
    acc, correct, labeled = pixel_accuracy(pred, label)
    assert labeled == 3 and correct == 2
    a, n = accuracy(pred, label)
    assert n == 3 and abs(a - 2 / 3) < 1e-6
