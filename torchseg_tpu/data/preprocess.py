"""Train-time preprocess pipelines — one per experiment family, mirroring the
per-experiment ``dataloader.py`` TrainPre classes.

All return NHWC float32 images (the reference transposes to CHW for torch;
we stay NHWC for TPU).
"""

from typing import Optional, Sequence

import cv2
import numpy as np

from . import transforms as T


class SegTrainPre:
    """mirror -> random_scale -> normalize -> random crop+pad
    (reference model/bisenet/*/dataloader.py:11-33).  Label pad = 255.

    When the native C++/OpenMP kernels are available (torchseg_tpu.native,
    ``use_native=True``) the resize + fused crop/normalize/pad run GIL-free
    in C++ (cv2-parity within 1 uint8 ulp); otherwise cv2/numpy.
    """

    def __init__(
        self,
        img_mean,
        img_std,
        crop_size,
        train_scale_array: Optional[Sequence[float]] = None,
        gt_pad_value: int = 255,
        gt_down_sampling: int = 1,
        use_native: bool = True,
    ):
        self.img_mean = np.asarray(img_mean, np.float32)
        self.img_std = np.asarray(img_std, np.float32)
        self.crop_size = T.get_2dshape(crop_size)
        self.train_scale_array = train_scale_array
        self.gt_pad_value = gt_pad_value
        self.gt_down_sampling = gt_down_sampling
        if use_native:
            from .. import native as _native

            self._native = _native if _native.available() else None
        else:
            self._native = None

    def _native_call(self, rng, img, gt):
        nat = self._native
        if rng.random() >= 0.5:  # random_mirror
            img, gt = img[:, ::-1], gt[:, ::-1]
        if self.train_scale_array is not None:
            s = float(self.train_scale_array[
                int(rng.integers(0, len(self.train_scale_array)))
            ])
            sh, sw = int(img.shape[0] * s), int(img.shape[1] * s)
            img = nat.resize_bilinear(img, sh, sw)
            gt = nat.resize_nearest(gt, sh, sw)
        ch, cw = self.crop_size
        pos_h, pos_w = T.generate_random_crop_pos(
            rng, img.shape[:2], self.crop_size
        )
        # crop first (cheap view-copy), then center-pad via negative window
        # origin so padding lands OUTSIDE the crop like the reference
        # (img_utils.py:24-39)
        img_c = np.ascontiguousarray(img[pos_h:pos_h + ch, pos_w:pos_w + cw])
        gt_c = np.ascontiguousarray(gt[pos_h:pos_h + ch, pos_w:pos_w + cw])
        m_top = (ch - img_c.shape[0]) // 2
        m_left = (cw - img_c.shape[1]) // 2
        p_img = nat.crop_normalize_pad(
            img_c, self.img_mean, self.img_std, ch, cw, -m_top, -m_left, 0.0
        )
        p_gt = nat.crop_pad_labels(
            gt_c, ch, cw, -m_top, -m_left, self.gt_pad_value
        )
        return p_img, p_gt

    def __call__(self, rng, img, gt):
        if self._native is not None and img.dtype == np.uint8:
            p_img, p_gt = self._native_call(rng, img, gt)
        else:
            img, gt = T.random_mirror(rng, img, gt)
            if self.train_scale_array is not None:
                img, gt, _ = T.random_scale(
                    rng, img, gt, self.train_scale_array
                )
            img = T.normalize(img, self.img_mean, self.img_std)
            crop_pos = T.generate_random_crop_pos(
                rng, img.shape[:2], self.crop_size
            )
            p_img, _ = T.random_crop_pad_to_shape(
                img, crop_pos, self.crop_size, 0
            )
            p_gt, _ = T.random_crop_pad_to_shape(
                gt, crop_pos, self.crop_size, self.gt_pad_value
            )
        if self.gt_down_sampling > 1:
            # speed variants train against ÷k labels (reference
            # model/bisenet/*.speed/dataloader.py:28-31, INTER_NEAREST)
            import cv2 as _cv2

            p_gt = _cv2.resize(
                p_gt,
                (
                    self.crop_size[1] // self.gt_down_sampling,
                    self.crop_size[0] // self.gt_down_sampling,
                ),
                interpolation=_cv2.INTER_NEAREST,
            )
        return p_img, p_gt.astype(np.int32), None


class ADETrainPre(SegTrainPre):
    """ADE: gt padded with 0 then shifted by -1 (ignore becomes -1)
    (reference model/pspnet/ade.pspnet.R50_v1c/dataloader.py:28-31)."""

    def __init__(self, img_mean, img_std, crop_size, train_scale_array=None):
        super().__init__(img_mean, img_std, crop_size, train_scale_array,
                         gt_pad_value=0)

    def __call__(self, rng, img, gt):
        p_img, p_gt, _ = super().__call__(rng, img, gt)
        return p_img, p_gt - 1, None


class DFNTrainPre(SegTrainPre):
    """DFN adds a border aux label: Canny(5,5,aperture=7) on the 255-zeroed
    label map, dilated by a 7x7 rect kernel, binarized
    (reference model/dfn/cityscapes.dfn.R101_v1c/dataloader.py:15-44)."""

    def __init__(self, img_mean, img_std, crop_size, train_scale_array=None,
                 edge_radius: int = 7):
        super().__init__(img_mean, img_std, crop_size, train_scale_array,
                         gt_pad_value=255)
        self.edge_kernel = cv2.getStructuringElement(
            cv2.MORPH_RECT, (edge_radius, edge_radius)
        )

    def __call__(self, rng, img, gt):
        img, gt = T.random_mirror(rng, img, gt)
        if self.train_scale_array is not None:
            img, gt, _ = T.random_scale(rng, img, gt, self.train_scale_array)

        no255_gt = np.array(gt)
        no255_gt[gt == 255] = 0
        cgt = cv2.Canny(no255_gt.astype(np.uint8), 5, 5, apertureSize=7)
        cgt = cv2.dilate(cgt, self.edge_kernel)
        cgt[cgt == 255] = 1

        img = T.normalize(img, self.img_mean, self.img_std)
        crop_pos = T.generate_random_crop_pos(
            rng, img.shape[:2], self.crop_size
        )
        p_img, _ = T.random_crop_pad_to_shape(img, crop_pos, self.crop_size, 0)
        p_gt, _ = T.random_crop_pad_to_shape(gt, crop_pos, self.crop_size, 255)
        p_cgt, _ = T.random_crop_pad_to_shape(
            cgt, crop_pos, self.crop_size, 255
        )
        return (
            p_img,
            p_gt.astype(np.int32),
            {"aux_label": p_cgt.astype(np.int32)},
        )
