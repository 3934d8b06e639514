"""Device-side train augmentation — mirror/random-scale/random-crop-pad/
normalize as separable, gather-free interpolation matmuls per sample
(SURVEY.md §7.6 "input pipeline to device-side transforms").

The reference burns 24 host worker processes on cv2 transforms
(model/*/dataloader.py); here the host only decodes images (optionally padded
to a static bucket) and the TPU does the rest inside the step, fused with
static shapes:

  for output pixel (i, j):
    scaled coord  y_s = i + oy - margin_top            (crop + center-pad)
    source coord  y   = (y_s + 0.5) / s - 0.5          (cv2 INTER_LINEAR)
    img: bilinear sample, /255, (x - mean)/std; out-of-window -> 0
    gt:  nearest  y = floor(y_s * H / sh); out-of-window -> gt_pad
    flip mirrors the source x axis.

Randomness (flip p=0.5, scale choice, integer crop offset in scaled coords)
matches the reference's distributions (img_utils.py:105-130, 42-57).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AugmentParams:
    flip: jnp.ndarray      # bool
    scale: jnp.ndarray     # f32
    off_y: jnp.ndarray     # i32, crop offset in scaled coords (>=0)
    off_x: jnp.ndarray


def sample_params(key, img_hw, crop_hw, scale_array: Sequence[float]):
    """Random params for one sample (distributions per the reference)."""
    h, w = img_hw
    ch, cw = crop_hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    flip = jax.random.uniform(k1) >= 0.5
    scales = jnp.asarray(scale_array, jnp.float32)
    scale = scales[jax.random.randint(k2, (), 0, len(scales))]
    sh = (h * scale).astype(jnp.int32)
    sw = (w * scale).astype(jnp.int32)
    # randint(0, dim - crop + 1) inclusive (img_utils.py:42-57 quirk)
    max_y = jnp.maximum(sh - ch + 1, 0)
    max_x = jnp.maximum(sw - cw + 1, 0)
    off_y = jnp.where(
        sh > ch, jax.random.randint(k3, (), 0, jnp.maximum(max_y, 1) + 1), 0
    )
    off_x = jnp.where(
        sw > cw, jax.random.randint(k4, (), 0, jnp.maximum(max_x, 1) + 1), 0
    )
    return AugmentParams(flip, scale, off_y, off_x)


def augment_sample(img_u8, gt, params: AugmentParams, crop_hw, mean, std,
                   gt_pad: int = 255, gt_down: int = 1):
    """Deterministic core: (H,W,3) uint8 + (H,W) labels -> normalized f32
    crop (ch,cw,3) and int32 labels (ch//gt_down, cw//gt_down).

    gt_down > 1 composes the speed-variant label downsampling (reference
    model/bisenet/*.speed/dataloader.py:28-30, cv2 INTER_NEAREST after the
    crop) into the same gather."""
    h, w = img_u8.shape[:2]
    ch, cw = crop_hw
    s = params.scale
    sh = (h * s).astype(jnp.int32)
    sw = (w * s).astype(jnp.int32)
    # center-pad margins when the scaled image is smaller than the crop
    m_top = jnp.maximum((ch - sh) // 2, 0)
    m_left = jnp.maximum((cw - sw) // 2, 0)

    ii = jnp.arange(ch)
    jj = jnp.arange(cw)
    y_s = ii + params.off_y - m_top                     # scaled coords
    x_s = jj + params.off_x - m_left
    in_y = (y_s >= 0) & (y_s < sh)
    in_x = (x_s >= 0) & (x_s < sw)
    mask = in_y[:, None] & in_x[None, :]

    # ---- image: bilinear (cv2 INTER_LINEAR half-pixel convention),
    # expressed SEPARABLY as two MXU matmuls with sparse interpolation
    # matrices built by iota-compare — XLA lowers per-pixel gathers to
    # kCustom dynamic-gathers that cost ~18 ms EACH at 1024x2048 on v5e
    # (docs/DESIGN.md round 2), while the matmuls run in <1 ms ----
    yf = (y_s.astype(jnp.float32) + 0.5) / s - 0.5
    xf = (x_s.astype(jnp.float32) + 0.5) / s - 0.5
    xf = jnp.where(params.flip, (w - 1) - xf, xf)       # mirror source axis
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(yf - y0, 0.0, 1.0)
    wx = jnp.clip(xf - x0, 0.0, 1.0)

    def interp_matrix(i0, i1, frac, n_src):
        iota = jnp.arange(n_src)[None, :]
        return (
            (iota == i0[:, None]).astype(jnp.float32) * (1 - frac)[:, None]
            + (iota == i1[:, None]).astype(jnp.float32) * frac[:, None]
        )

    wy_m = interp_matrix(y0, y1, wy, h)                 # (ch, h)
    wx_m = interp_matrix(x0, x1, wx, w)                 # (cw, w)
    imgf = img_u8.astype(jnp.float32)
    # full precision: TPU matmuls default to bf16 inputs, which would break
    # the cv2 parity of the f32 interpolation weights (same convention as
    # ops/resize.py / ops/pool.py)
    prec = jax.lax.Precision.HIGHEST
    val = jnp.einsum("ih,hwc->iwc", wy_m, imgf, precision=prec)
    val = jnp.einsum("jw,iwc->ijc", wx_m, val, precision=prec)
    val = (val / 255.0 - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
        std, jnp.float32
    )
    out_img = jnp.where(mask[:, :, None], val, 0.0)

    # ---- labels: nearest (cv2 INTER_NEAREST: src = floor(dst * H / sh)),
    # on the (ch//gt_down, cw//gt_down) output grid: first map the coarse
    # index into crop coords (the post-crop downsample), then into scaled
    # coords, then to the source pixel — one composed gather ----
    gh, gw = ch // gt_down, cw // gt_down
    y_sg = (jnp.arange(gh) * ch) // gh + params.off_y - m_top
    x_sg = (jnp.arange(gw) * cw) // gw + params.off_x - m_left
    mask_g = (
        ((y_sg >= 0) & (y_sg < sh))[:, None]
        & ((x_sg >= 0) & (x_sg < sw))[None, :]
    )
    gy = jnp.clip((y_sg * h) // jnp.maximum(sh, 1), 0, h - 1)
    gx = jnp.clip((x_sg * w) // jnp.maximum(sw, 1), 0, w - 1)
    # mirror(gt) then resize == index the mirrored source position
    gx = jnp.where(params.flip, (w - 1) - gx, gx)
    # nearest = one-hot selection matmuls (same kCustom-gather avoidance as
    # above; one-hot rows select exactly one integer, so the full-precision
    # f32 matmul is exact for labels < 2^24)
    ry = (jnp.arange(h)[None, :] == gy[:, None]).astype(jnp.float32)
    rx = (jnp.arange(w)[None, :] == gx[:, None]).astype(jnp.float32)
    out_gt = jnp.matmul(
        jnp.matmul(ry, gt.astype(jnp.float32), precision=prec),
        rx.T,
        precision=prec,
    ).astype(jnp.int32)
    out_gt = jnp.where(mask_g, out_gt, gt_pad)
    return out_img, out_gt


def make_device_augment(crop_hw, scale_array, mean, std, gt_pad: int = 255,
                        gt_down: int = 1):
    """Batched jittable augmentation: (key, imgs (B,H,W,3) u8,
    gts (B,H,W)) -> (B,ch,cw,3) f32, (B,ch//gt_down,cw//gt_down) i32."""

    def fn(key, imgs, gts):
        b, h, w = imgs.shape[:3]
        keys = jax.random.split(key, b)

        def one(k, img, gt):
            p = sample_params(k, (h, w), crop_hw, scale_array)
            return augment_sample(img, gt, p, crop_hw, mean, std, gt_pad,
                                  gt_down)

        return jax.vmap(one)(keys, imgs, gts)

    return jax.jit(fn)
