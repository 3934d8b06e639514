"""Segmentation metrics — confusion-matrix mIoU, both as jittable device ops
and numpy host helpers (reference furnace/seg_opr/metric.py).
"""

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp


def hist_info_jax(num_classes: int, pred: jnp.ndarray, gt: jnp.ndarray):
    """Jittable confusion matrix (reference metric.py:9-17).

    Returns (hist[num_classes, num_classes], labeled, correct); pixels with
    gt outside [0, num_classes) are excluded.
    """
    k = (gt >= 0) & (gt < num_classes)
    labeled = jnp.sum(k)
    correct = jnp.sum((pred == gt) & k)
    idx = jnp.where(k, num_classes * gt + pred, num_classes * num_classes)
    hist = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes + 1)
    return hist[:-1].reshape(num_classes, num_classes), labeled, correct


def hist_info(num_classes: int, pred: np.ndarray, gt: np.ndarray):
    """Numpy confusion matrix, identical to the reference implementation."""
    assert pred.shape == gt.shape
    k = (gt >= 0) & (gt < num_classes)
    labeled = np.sum(k)
    correct = np.sum(pred[k] == gt[k])
    hist = np.bincount(
        num_classes * gt[k].astype(int) + pred[k].astype(int),
        minlength=num_classes**2,
    ).reshape(num_classes, num_classes)
    return hist, labeled, correct


def compute_score(hist: np.ndarray, correct, labeled):
    """Per-class IoU, mean IoU, mean IoU w/o background, pixel accuracy
    (reference metric.py:20-28)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
        mean_iou = np.nanmean(iou)
        mean_iou_no_back = np.nanmean(iou[1:])
        mean_pixel_acc = correct / labeled if labeled > 0 else float("nan")
    return iou, mean_iou, mean_iou_no_back, mean_pixel_acc


# ---------------------------------------------------------------------
# ADE-style histogram metrics (reference metric.py:31-89)
# ---------------------------------------------------------------------
def intersection_and_union(pred: np.ndarray, label: np.ndarray,
                           num_classes: int):
    """Per-class intersection/union areas with 1-based shifting so unlabeled
    (0 after shift) pixels don't count (reference metric.py:40-64)."""
    pred = np.asarray(pred).copy() + 1
    label = np.asarray(label).copy() + 1
    pred = pred * (label > 0)
    inter = pred * (pred == label)
    area_inter, _ = np.histogram(inter, bins=num_classes,
                                 range=(1, num_classes))
    area_pred, _ = np.histogram(pred, bins=num_classes,
                                range=(1, num_classes))
    area_lab, _ = np.histogram(label, bins=num_classes,
                               range=(1, num_classes))
    return area_inter, area_pred + area_lab - area_inter


def mean_iou(area_intersection: np.ndarray, area_union: np.ndarray):
    """(reference metric.py:31-37) — rows are classes, columns images."""
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = 1.0 * np.sum(area_intersection, axis=1) / np.sum(
            area_union, axis=1
        )
        return iou, np.nanmean(iou), np.nanmean(iou[1:])


def pixel_accuracy(pred: np.ndarray, label: np.ndarray):
    """(reference metric.py:74-82)."""
    labeled = np.sum(label >= 0)
    correct = np.sum((pred == label) * (label >= 0))
    return 1.0 * correct / labeled, correct, labeled


def accuracy(preds: np.ndarray, label: np.ndarray):
    """(reference metric.py:85-89)."""
    valid = label >= 0
    acc_sum = (valid * (preds == label)).sum()
    valid_sum = valid.sum()
    return float(acc_sum) / (valid_sum + 1e-10), valid_sum


@dataclass
class ConfusionAccumulator:
    """Streaming accumulator used by the evaluator (replaces the reference's
    per-process results_queue of partial hists, evaluator.py:123-128)."""

    num_classes: int
    hist: np.ndarray = field(default=None)
    labeled: int = 0
    correct: int = 0

    def __post_init__(self):
        if self.hist is None:
            self.hist = np.zeros(
                (self.num_classes, self.num_classes), dtype=np.int64
            )

    def update(self, pred: np.ndarray, gt: np.ndarray):
        h, labeled, correct = hist_info(self.num_classes, pred, gt)
        self.hist += h
        self.labeled += int(labeled)
        self.correct += int(correct)

    def merge(self, other: "ConfusionAccumulator"):
        self.hist += other.hist
        self.labeled += other.labeled
        self.correct += other.correct

    def scores(self):
        return compute_score(self.hist, self.correct, self.labeled)
