"""Bilinear resize with PyTorch ``align_corners=True`` semantics.

TorchSeg upsamples every head output with ``F.interpolate(..., mode='bilinear',
align_corners=True)`` (e.g. reference model/bisenet/*/network.py:82-84,163-166,
model/pspnet/*/network.py:46-49).  JAX's ``jax.image.resize`` only implements
half-pixel-center sampling, so we build explicit 1-D interpolation matrices and
contract them with the feature map.  Each output row has at most two non-zero
weights; the contraction is a pair of matmuls that run on the MXU, which on TPU
is considerably faster than the gather formulation for the large upsamples
(e.g. 128x256 -> 1024x2048) on the segmentation heads.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix for 1-D align_corners=True linear
    interpolation: src = i * (n_in - 1) / (n_out - 1)."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        # align_corners with a single source (or target) sample: everything
        # reads source position 0 (matches torch broadcast from a 1x1 map).
        if n_out == 1:
            w[0, 0] = 1.0
            return w
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, n_in - 2)
    frac = (src - i0).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, i0] = 1.0 - frac
    w[rows, i0 + 1] = frac
    return w


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw, dtype=None):
    """Resize NHWC (or HWC) tensor to ``out_hw`` with align_corners=True.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=True)`` exactly (up to float associativity).
    """
    squeeze = False
    if x.ndim == 3:
        x = x[None]
        squeeze = True
    assert x.ndim == 4, x.shape
    _, h, w, _ = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    cdtype = dtype or x.dtype
    # TPU matmuls default to reduced precision; the interpolation weights are
    # exact f32, so force full precision when computing in f32 (bf16 inputs
    # keep their own precision — the cast dominates either way).
    prec = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(cdtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if (oh, ow) != (h, w):
        if oh != h:
            wh = jnp.asarray(_interp_matrix_np(h, oh), dtype=cdtype)
            x = jnp.einsum("ph,bhwc->bpwc", wh, x.astype(cdtype), precision=prec)
        if ow != w:
            ww = jnp.asarray(_interp_matrix_np(w, ow), dtype=cdtype)
            x = jnp.einsum("qw,bhwc->bhqc", ww, x.astype(cdtype), precision=prec)
    if squeeze:
        x = x[0]
    return x


def upsample_by_scale(x: jnp.ndarray, scale: int, dtype=None):
    """Upsample NHWC by an integer scale factor, align_corners=True.

    Mirrors ``F.interpolate(x, scale_factor=s, ...)`` used by every head in
    the reference (output size = input size * s).
    """
    if scale == 1:
        return x
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (h * scale, w * scale), dtype=dtype)


def tiled_upsample_argmax(raw: jnp.ndarray, out_hw, row_tile: int = 128,
                          precision=None) -> jnp.ndarray:
    """argmax of the align-corners bilinear upsample WITHOUT materializing
    the full-resolution score tensor.

    The plain epilogue writes then re-reads the (H, W, C) score tensor in
    HBM (160 MB f32 at 1024x2048x19).  Here rows upsample first (the
    (H, w, C) intermediate is small), then ``lax.map`` walks row chunks:
    each chunk's (row_tile, W, C) score tile exists only transiently
    between two fusions, so peak HBM traffic drops ~4x.  Measured on v5e:
    5.944 -> 4.915 ms full-res serving (168 -> 203 FPS), pure XLA.

    This supersedes the Pallas fused kernel
    (ops/pallas/upsample_argmax.py) as the production epilogue: on the
    current libtpu that kernel's compile time scales with grid-instance
    count (1 s at 2 tiles, 86 s at 32, stalled >5 min at production
    sizes) — kept for future toolchains.

    raw: (B, h, w, C) logits.  Returns (B, H, W) int32.
    """
    b, h, w, c = raw.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    rt = min(row_tile, oh)
    # non-divisor heights (1081 etc.): pad the row dimension up to the next
    # multiple of rt (duplicating the last interpolation row) and slice the
    # result — keeps the tile at row_tile instead of degenerating toward
    # rt=1 (= oh sequential lax.map chunks) for prime/near-prime heights
    oh_pad = -(-oh // rt) * rt
    # default HIGHEST: the materialized epilogue this replaces
    # (resize_bilinear_align_corners) forces HIGHEST in f32, and the
    # docstring promises argmax equality — DEFAULT measured 0.21%
    # boundary-pixel divergence on v5e
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    wh_np = _interp_matrix_np(h, oh)
    if oh_pad != oh:
        wh_np = np.concatenate(
            [wh_np, np.repeat(wh_np[-1:], oh_pad - oh, axis=0)]
        )
    wh = jnp.asarray(wh_np, jnp.float32)
    ww = jnp.asarray(_interp_matrix_np(w, ow), jnp.float32)
    z = jnp.einsum("ip,bpqc->biqc", wh, raw.astype(jnp.float32),
                   precision=prec)
    zc = z.reshape(b, oh_pad // rt, rt, w, c).transpose(1, 0, 2, 3, 4)

    def chunk(zt):  # (b, rt, w, c) -> (b, rt, ow)
        s = jnp.einsum("bpqc,jq->bpjc", zt, ww, precision=prec)
        return jnp.argmax(s, axis=-1).astype(jnp.int32)

    out = jax.lax.map(chunk, zc)  # (oh_pad//rt, b, rt, ow)
    return out.transpose(1, 0, 2, 3).reshape(b, oh_pad, ow)[:, :oh]
