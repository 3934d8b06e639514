"""Host-side numpy/cv2 augmentation — functional rebuild of reference
``furnace/utils/img_utils.py``.  All random ops take an explicit
``np.random.Generator`` so worker pipelines are reproducible (the reference
uses the global ``random`` module).

Semantics preserved: cv2 INTER_LINEAR for images / INTER_NEAREST for labels,
center padding with per-side margins, /255-then-mean/std normalization
(img_utils.py:181-187).
"""

from typing import Sequence, Tuple

import cv2
import numpy as np


def get_2dshape(shape) -> Tuple[int, int]:
    if isinstance(shape, (int, np.integer)):
        return (int(shape), int(shape))
    h, w = map(int, shape)
    return (h, w)


def pad_image_to_shape(img, shape, value):
    """Center-pad to at least ``shape``; returns (img, margin[4]) with margins
    top/bottom/left/right (img_utils.py:60-74)."""
    shape = get_2dshape(shape)
    pad_h = max(shape[0] - img.shape[0], 0)
    pad_w = max(shape[1] - img.shape[1], 0)
    margin = np.array(
        [pad_h // 2, pad_h // 2 + pad_h % 2, pad_w // 2, pad_w // 2 + pad_w % 2],
        np.int64,
    )
    img = cv2.copyMakeBorder(
        img,
        int(margin[0]),
        int(margin[1]),
        int(margin[2]),
        int(margin[3]),
        cv2.BORDER_CONSTANT,
        value=value,
    )
    return img, margin


def pad_image_size_to_multiples_of(img, multiple, pad_value):
    h, w = img.shape[:2]
    th = -(-h // multiple) * multiple
    tw = -(-w // multiple) * multiple
    return pad_image_to_shape(img, (th, tw), pad_value)


def generate_random_crop_pos(rng: np.random.Generator, ori_size, crop_size):
    """(img_utils.py:42-57) — note the reference's randint(0, h-crop+1) is
    inclusive of h-crop+1; we keep the exact same distribution."""
    h, w = get_2dshape(ori_size)
    ch, cw = get_2dshape(crop_size)
    pos_h = int(rng.integers(0, h - ch + 2)) if h > ch else 0
    pos_w = int(rng.integers(0, w - cw + 2)) if w > cw else 0
    return pos_h, pos_w


def random_crop_pad_to_shape(img, crop_pos, crop_size, pad_value):
    h, w = img.shape[:2]
    sh, sw = crop_pos
    assert 0 <= sh < h and 0 <= sw < w
    ch, cw = get_2dshape(crop_size)
    img_crop = img[sh : sh + ch, sw : sw + cw, ...]
    return pad_image_to_shape(img_crop, (ch, cw), pad_value)


def resize_ensure_shortest_edge(img, edge_length: int):
    h, w = img.shape[:2]
    if h < w:
        th, tw = edge_length, max(1, int(edge_length / h * w))
    else:
        th, tw = max(1, int(edge_length / w * h)), edge_length
    return cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)


def random_scale(rng: np.random.Generator, img, gt, scales: Sequence[float]):
    scale = float(scales[int(rng.integers(0, len(scales)))])
    sh, sw = int(img.shape[0] * scale), int(img.shape[1] * scale)
    img = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_LINEAR)
    gt = cv2.resize(gt, (sw, sh), interpolation=cv2.INTER_NEAREST)
    return img, gt, scale


def random_scale_with_length(rng, img, gt, lengths: Sequence[int]):
    size = int(lengths[int(rng.integers(0, len(lengths)))])
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    gt = cv2.resize(gt, (size, size), interpolation=cv2.INTER_NEAREST)
    return img, gt, size


def random_mirror(rng: np.random.Generator, img, gt):
    if rng.random() >= 0.5:
        img = img[:, ::-1]
        gt = gt[:, ::-1]
    return img, gt


def random_rotation(rng: np.random.Generator, img, gt):
    angle = rng.random() * 20 - 10
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1)
    img = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR)
    gt = cv2.warpAffine(gt, m, (w, h), flags=cv2.INTER_NEAREST)
    return img, gt


def random_gaussian_blur(rng: np.random.Generator, img):
    k = int(rng.choice([1, 3, 5, 7]))
    if k > 1:
        img = cv2.GaussianBlur(img, (k, k), 0)
    return img


def center_crop(img, shape):
    h, w = get_2dshape(shape)
    y = (img.shape[0] - h) // 2
    x = (img.shape[1] - w) // 2
    return img[y : y + h, x : x + w]


def random_crop(rng: np.random.Generator, img, gt, size):
    ch, cw = get_2dshape(size)
    h, w = img.shape[:2]
    if h > ch:
        y = int(rng.integers(0, h - ch + 2))
        img, gt = img[y : y + ch], gt[y : y + ch]
    if w > cw:
        x = int(rng.integers(0, w - cw + 2))
        img, gt = img[:, x : x + cw], gt[:, x : x + cw]
    return img, gt


def normalize(img, mean, std):
    """/255 then (x - mean)/std — float32 (img_utils.py:181-187)."""
    img = img.astype(np.float32) / 255.0
    return (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
