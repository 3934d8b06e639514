"""Space-to-depth stem convolution — the TPU-native formulation of the
stride-2 small-channel input convs (ResNet 7x7/2 and v1c 3x3/2 stems,
BiSeNet SpatialPath 7x7/2).

A k x k stride-2 conv on (H, W, C) with C tiny (3) wastes the 128-wide MXU
lanes and the strided access defeats tiling — measured ~2.7 TFLOP/s on v5e.
Rearranging the input 2x2 -> depth gives (H/2, W/2, 4C) and an EXACTLY
equivalent ceil(k/2+...)-sized stride-1 conv with the kernel zero-padded and
space-to-depth'd the same way:

  out(i,j) = sum_u,v x(2i+u-P, 2j+v-P) w(u,v)          (P = k//2)
           = sum_p,q,a,b X(i+p-pl, j+q-pl')[a,b] W(p,q)[a,b]

with W[p,q,(a,b,c)] = w_pad[2p+a, 2q+b, c], w_pad = w zero-padded by 1 at the
top/left to (2k', 2k'), k' = (k+1)//2, and asymmetric padding
(pl, pr) = (k'//2, k'-1-k'//2).  Same parameters, same math (up to fp
reassociation) — only the schedule changes.  Requires even H, W.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.init import kaiming_normal_init


def conv_stride2_s2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Equivalent of lax.conv(x, kernel, stride=2, pad=k//2) for odd k and
    even spatial dims, via space-to-depth."""
    k = kernel.shape[0]
    assert k % 2 == 1, "odd kernels only"
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    kp = (k + 1) // 2
    # kernel: zero-pad to (2kp, 2kp) with top/left offset d = (k//2) % 2 so
    # that pl = (k//2 + d) / 2 is integral, then s2d to (kp, kp, 4c)
    d = (k // 2) % 2
    wpad = jnp.pad(
        kernel, ((d, 2 * kp - k - d), (d, 2 * kp - k - d), (0, 0), (0, 0))
    )
    cout = kernel.shape[-1]
    wk = wpad.reshape(kp, 2, kp, 2, c, cout)
    wk = wk.transpose(0, 2, 1, 3, 4, 5).reshape(kp, kp, 4 * c, cout)
    # input s2d: (b, h/2, w/2, (a, b, c))
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    pl = (k // 2 + d) // 2
    pr = kp - 1 - pl
    return jax.lax.conv_general_dilated(
        xs,
        wk,
        (1, 1),
        [(pl, pr), (pl, pr)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_stride2_s2d_rp(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """conv_stride2_s2d with the s2d input view built by ROW-PARITY SPLIT
    instead of a 6D reshape/transpose.

    The transpose-based construction loses on v5e because XLA's layout
    assignment pins the in-graph space-to-depth to a conv-hostile layout
    (see conv_stride2_cpad's docstring).  Here the view is assembled the
    memory-friendly way (the same trick as the wgrad path below): the row
    split ``x[:, 0::2]``/``x[:, 1::2]`` is a full-row-granularity slice,
    the column 2->depth deinterleave is then a FREE row-major reshape
    (w, c) -> (w/2, 2c), and one channel concat orders the s2d channels
    (row-parity a, col-parity b, c) to match the kernel transform."""
    k = kernel.shape[0]
    assert k % 2 == 1, "odd kernels only"
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    kp = (k + 1) // 2
    d = (k // 2) % 2
    pl = (k // 2 + d) // 2
    pr = kp - 1 - pl
    x5 = x.reshape(b, h // 2, 2, w, c)
    xs = jnp.concatenate(
        [x5[:, :, a].reshape(b, h // 2, w // 2, 2 * c) for a in (0, 1)],
        axis=-1,
    )
    cout = kernel.shape[-1]
    wpad = jnp.pad(
        kernel, ((d, 2 * kp - k - d), (d, 2 * kp - k - d), (0, 0), (0, 0))
    )
    wk = wpad.reshape(kp, 2, kp, 2, c, cout)
    wk = wk.transpose(0, 2, 1, 3, 4, 5).reshape(kp, kp, 4 * c, cout)
    return jax.lax.conv_general_dilated(
        xs,
        wk,
        (1, 1),
        [(pl, pr), (pl, pr)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_stride2_cpad(x: jnp.ndarray, kernel: jnp.ndarray, min_c: int = 8):
    """Exact stride-2 conv with input channels zero-padded to ``min_c``.

    Measured on v5e: the C=3 7x7/2 stem runs 3.9 ms at 1024x2048; padding to
    8 channels drops it to 2.2 ms.  (The full s2d reformulation would be
    1.45 ms with a clean input layout, but XLA's layout assignment pins the
    in-graph space-to-depth transpose to a conv-hostile layout — 5.5 ms end
    to end; barriers/pads don't break it.  conv_stride2_s2d remains for
    pipelines that deliver pre-s2d input.)"""
    k = kernel.shape[0]
    c = x.shape[-1]
    if c < min_c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, min_c - c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, min_c - c), (0, 0)))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (2, 2),
        [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ----------------------------------------------------------------------
# custom weight-gradient: XLA's wgrad for the stride-2 tiny-C stem builds
# (1024, 16, 132, 3, 7) shifted-window tensors via six dynamic-update-slice
# fusions and reduces them in a 4.8 ms fusion — ~8 ms of the 50.7 ms
# BiSeNet train step (round-3 chip profile).  This formulation computes
# dW in s2d space as kp*kp accumulated (2c x oh*ow) @ (oh*ow x cout)
# matmuls per row parity over statically shifted views (static slices, no
# scatter, no materialized stack), then maps back to the original kernel
# via the (linear) s2d kernel transform's vjp.  dx keeps the stock dgrad.
#
# The s2d view is built per ROW PARITY: the row split is a full-row-
# granularity strided slice (memory-friendly) and the column 2->depth
# deinterleave then becomes a FREE row-major reshape (w, c)->(w/2, 2c) —
# the full reshape/transpose s2d cost XLA 2.27 ms (reshape) + 1.07 ms
# (relayout copy) at bs2@1024²; this construction removes both.
#
# Chip A/B, full BiSeNet-R18 train step bs2 @1024² (round 3):
#   XLA native wgrad                50.60 ms/step
#   stacked-slab single einsum      43.24   (kp²·12.6 MB stack concat)
#   conv-formulated wgrad           46.43   (CHWN/IHWO large-kernel conv)
#   strided-slice s2d construction  50.42   (column-strided slices lose)
#   accumulated per-shift einsums   40.31   (reshape/transpose s2d)
#   + row-parity-split s2d          37.98   <- shipped
# ----------------------------------------------------------------------

STEM_WGRAD_MATMUL = True  # chip A/B (round 3): 37.98 vs 50.60 ms/step (-25%)


@jax.custom_vjp
def conv_stride2_cpad_cv(x, kernel):
    return conv_stride2_cpad(x, kernel)


def _cpad_fwd(x, kernel):
    return conv_stride2_cpad(x, kernel), (x, kernel)


def _cpad_bwd(res, g):
    x, kernel = res
    _, vjp_x = jax.vjp(lambda xx: conv_stride2_cpad(xx, kernel), x)
    dx = vjp_x(g)[0]

    k = kernel.shape[0]
    b, h, w, c = x.shape
    kp = (k + 1) // 2
    d = (k // 2) % 2
    pl = (k // 2 + d) // 2
    pr = kp - 1 - pl
    oh, ow = g.shape[1], g.shape[2]
    x5 = x.reshape(b, h // 2, 2, w, c)
    parts = []
    for a in (0, 1):
        xa = x5[:, :, a].reshape(b, h // 2, w // 2, 2 * c)
        parts.append(jnp.pad(xa, ((0, 0), (pl, pr), (pl, pr), (0, 0))))
    # channel order within a dwk row is (a, b, cc) — parity-a block first —
    # matching the (kp, 2, kp, 2, c) transpose in `transform` below
    rows = [
        jnp.concatenate(
            [jnp.einsum("bijc,bijo->co", parts[a][:, p:p + oh, q:q + ow, :],
                        g, preferred_element_type=jnp.float32)
             for a in (0, 1)],
            axis=0,
        )
        for p in range(kp)
        for q in range(kp)
    ]
    dwk = jnp.stack(rows).reshape(kp, kp, 4 * c, -1)

    def transform(wker):
        wpad = jnp.pad(
            wker, ((d, 2 * kp - k - d), (d, 2 * kp - k - d), (0, 0), (0, 0))
        )
        wk = wpad.reshape(kp, 2, kp, 2, c, -1)
        return wk.transpose(0, 2, 1, 3, 4, 5).reshape(kp, kp, 4 * c, -1)

    dw = jax.vjp(transform, kernel)[1](dwk.astype(kernel.dtype))[0]
    return dx, dw


conv_stride2_cpad_cv.defvjp(_cpad_fwd, _cpad_bwd)


# Forward-path gate: build the stem FORWARD from the row-parity s2d view
# too (conv_stride2_s2d_rp) instead of the channel-padded strided conv.
# Chip A/B on the full BiSeNet-R18 bs2@1024² train step (2026-08-17):
# cpad 37.10 vs s2d-rp **35.00 ms/step** — the two 7x7/2 stem forwards
# drop from 1.34+1.30 ms to 0.49+0.46 ms as 4x4x12-channel stride-1
# convs on the parity-built view (the transpose-built view measured
# 5.5 ms end-to-end in round 2; construction schedule is everything).
STEM_FWD_S2D = True


@jax.custom_vjp
def conv_stride2_s2d_cv(x, kernel):
    return conv_stride2_s2d_rp(x, kernel)


def _s2d_rp_fwd(x, kernel):
    return conv_stride2_s2d_rp(x, kernel), (x, kernel)


# same backward as the cpad form: dx via the stock strided-conv vjp
# (DCE'd for the image-input stems), dW via the accumulated parity-split
# einsums — both depend only on (x, kernel, g), not on how the forward
# was scheduled.
conv_stride2_s2d_cv.defvjp(_s2d_rp_fwd, _cpad_bwd)


class S2DConv(nn.Module):
    """Drop-in for nn.Conv(stride=2, pad=k//2, no bias) on tiny-C inputs;
    stores the kernel under the same ('kernel') name/shape so checkpoints are
    layout-compatible with the plain conv.  Uses the channel-padded strided
    conv (see conv_stride2_cpad)."""

    features: int
    ksize: int
    kernel_init: Callable = kaiming_normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (self.ksize, self.ksize, x.shape[-1], self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        # the custom backward (_cpad_bwd) splits rows/cols by parity and
        # requires even H and W; odd sizes keep the stock conv + stock vjp
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if STEM_FWD_S2D and even:
            conv = conv_stride2_s2d_cv if STEM_WGRAD_MATMUL else \
                conv_stride2_s2d_rp
        elif STEM_WGRAD_MATMUL and even:
            conv = conv_stride2_cpad_cv
        else:
            conv = conv_stride2_cpad
        return conv(x.astype(dtype), kernel.astype(dtype))


def use_s2d(in_ch: int, stride: int, ksize: int) -> bool:
    """Heuristic: worthwhile only for the tiny-channel strided stems."""
    return stride == 2 and ksize % 2 == 1 and in_ch <= 8
