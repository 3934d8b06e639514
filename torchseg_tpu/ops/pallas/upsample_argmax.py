"""Fused align-corners bilinear upsample + argmax — the Pallas epilogue for
full-resolution prediction (SURVEY.md §7.6 "fused bilinear-upsample +
softmax/argmax epilogue").

The plain XLA path materializes the upsampled (H, W, C) score tensor in HBM
(e.g. 1024x2048x19 f32 = 160 MB written then re-read by argmax).  This kernel
keeps the low-res logits and the two 1-D interpolation-weight matrices in
VMEM and emits only the (H, W) int32 prediction: per output tile, for each
class c it computes  Wh_tile @ X[:, :, c] @ Ww_tile^T  on the MXU and tracks
the running max/argmax — the score tensor never exists in HBM.

argmax tie-breaking matches jnp.argmax (first max wins) because classes are
scanned in order with a strict > test.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _interp_matrix_np


def _kernel(num_classes, x_ref, wh_ref, ww_ref, out_ref):
    wh = wh_ref[:]  # (TH, h)
    ww = ww_ref[:]  # (TW, w)
    th, tw = wh.shape[0], ww.shape[0]

    best = jnp.full((th, tw), -jnp.inf, jnp.float32)
    arg = jnp.zeros((th, tw), jnp.int32)
    for c in range(num_classes):
        xc = x_ref[:, :, c].astype(jnp.float32)  # (h, w)
        a = jnp.dot(wh, xc, preferred_element_type=jnp.float32)  # (TH, w)
        b = jax.lax.dot_general(
            a,
            ww,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TH, TW)
        take = b > best
        best = jnp.where(take, b, best)
        arg = jnp.where(take, c, arg)
    out_ref[:] = arg


def fused_upsample_argmax(
    x: jnp.ndarray, out_hw, tile: int = 128
) -> jnp.ndarray:
    """NHWC logits (B, h, w, C) -> (B, H, W) int32 argmax of the
    align_corners-bilinear upsample to out_hw."""
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    th = min(tile, oh)
    tw = min(tile, ow)
    assert oh % th == 0 and ow % tw == 0, (oh, ow, th, tw)
    wh = jnp.asarray(_interp_matrix_np(h, oh))
    ww = jnp.asarray(_interp_matrix_np(w, ow))

    grid = (oh // th, ow // tw)
    call = pl.pallas_call(
        functools.partial(_kernel, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, w, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, h), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((oh, ow), jnp.int32),
    )

    def one(img):
        return call(img, wh, ww)

    return jax.vmap(one)(x)
