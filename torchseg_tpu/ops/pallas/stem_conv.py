"""Pallas 7x7/stride-2 stem convolution (+folded BN affine + ReLU + split) —
the speed-of-light replacement for XLA's strided small-channel conv.

Motivation (v5e, 1024x2048 input): XLA runs the fused 128-channel stem at
~1.2 ms plus ~1.6 ms of im2col relayout copies.  This kernel builds the
im2col rows with cheap sublane-shifted slices and feeds the MXU 128-deep
contractions:

  * input format: flat (rows, 16) where each sublane holds TWO horizontal
    pixels x 8 channels (a pure reshape of the spatially padded (Hp, Wp, 8)
    image); overlapping row-blocks (halo 6) are materialized by one
    leading-axis gather (~1.4x input bytes, ~0.1 ms);
  * output pixel j reads input pixels 2j + v, v in [0, 7): pixel 2j+v lives
    at sublane j + v//2, lane half v%2 — so the 8 horizontal taps (7 real +
    1 zero) of rows u and u+1 are FOUR sublane-shifted (W_out, 16) slices
    each, lane-concatenated into a (W_out, 128) tile;
  * 4 tap-pair matmuls of (W_out, 128) @ (128, C_out) accumulate each output
    row; the epilogue applies y = relu(acc * a + b) and splits the channels
    for the two stem consumers (SpatialPath / backbone).

Mosaic restrictions found empirically on this toolchain (see git history):
unaligned-slice lane-concats must read from a 2D ref that is either a VMEM
input block (leading dim squeezed via BlockSpec None) or written through a 2D
scratch — NOT from 3D-indexed rows, DMA'd scratch, or inside lax.fori_loop.
Hence: python-unrolled rows, squeezed input blocks, no manual DMA.

The kernel computes both BiSeNet stems jointly (C_out = 128), mirrors
``deploy/fused_stem.py`` semantics, and is verified against the XLA conv in
tests/test_pallas_kernels.py (interpret mode) and on hardware.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 4  # output rows per grid step (python-unrolled)


def _kernel(split, row_len, x_ref, w_ref, a_ref, b_ref, out1_ref, out2_ref):
    w_out = out1_ref.shape[1]
    cout = w_ref.shape[-1]

    for li in range(TH):  # python-unrolled: all offsets static
        acc = jnp.zeros((w_out, cout), jnp.float32)
        for pair in range(4):  # tap-row pairs (0,1) (2,3) (4,5) (6,zero)
            pieces = []
            for uo in (0, 1):
                base = (2 * li + 2 * pair + uo) * row_len
                for s in range(4):
                    pieces.append(x_ref[base + s : base + s + w_out, :])
            x_tile = jnp.concatenate(pieces, axis=1)  # (W_out, 128)
            acc = acc + jnp.dot(
                x_tile, w_ref[pair], preferred_element_type=jnp.float32
            )
        y = acc * a_ref[0] + b_ref[0]
        y = jnp.maximum(y, 0.0).astype(out1_ref.dtype)
        out1_ref[li] = y[:, :split]
        out2_ref[li] = y[:, split:]


def _pack_weights(kernel, cin_pad=8):
    """(7,7,C,Cout) -> (4, 128, Cout): tap-pair matrices matching the
    kernel's lane-concat order [u: (v=0..7) x c8] for u = 2p, 2p+1."""
    k, _, c, cout = kernel.shape
    assert k == 7
    w = jnp.pad(kernel, ((0, 1), (0, 1), (0, cin_pad - c), (0, 0)))  # 8x8x8
    # order per pair: (u_local, v, c)
    w = w.reshape(4, 2, 8, cin_pad, cout).reshape(4, 2 * 8 * cin_pad, cout)
    return w


def stem_conv7x7_s2(x, kernel, a, b, split: int, out_dtype=jnp.bfloat16):
    """x: (1, H, W, C<=8) NHWC; kernel (7,7,C,Cout); a/b per-channel affine.

    Returns (y1 (1,H/2,W/2,split), y2 (1,H/2,W/2,Cout-split)) =
    split(relu(conv_stride2(x, kernel) * a + b)).
    """
    _, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    h_out, w_out = h // 2, w // 2
    assert h_out % TH == 0, h_out
    cout = kernel.shape[-1]

    xp = x[0]
    if c < 8:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 8 - c)))
    # spatial pad: rows +3/+3; cols +3 left, +5 right (so Wp is even and the
    # rightmost tap window fits); reshape pixel pairs into 16 lanes
    xp = jnp.pad(xp, ((3, 3), (3, 5), (0, 0)))
    row_len = (w + 8) // 2
    xp = xp.reshape(h + 6, row_len, 16)

    # overlapping (rows: halo 6; cols: halo 4 sublanes) blocks via gathers.
    # f32 inside the kernel: this Mosaic build rejects unaligned-slice
    # lane-concats on bf16 (16, 128) tiles, so the block fetch converts.
    tw = min(256, w_out)  # output col tile (Mosaic chokes past ~512 sublanes)
    assert w_out % tw == 0
    n_rb = h_out // TH
    n_cb = w_out // tw
    block_rows = 2 * TH + 6
    seg = tw + 4
    ridx = (
        jnp.arange(n_rb)[:, None] * (2 * TH)
        + jnp.arange(block_rows)[None, :]
    )
    xb = xp[ridx]  # (n_rb, block_rows, row_len, 16)
    if n_cb > 1:
        cidx = (
            jnp.arange(n_cb)[:, None] * tw + jnp.arange(seg)[None, :]
        )
        xb = xb[:, :, cidx, :]  # (n_rb, block_rows, n_cb, seg, 16)
        xb = xb.transpose(0, 2, 1, 3, 4)
    else:
        xb = xb[:, None, :, :seg, :]
    xb = xb.reshape(n_rb, n_cb, block_rows * seg, 16).astype(jnp.float32)

    wp = _pack_weights(kernel).astype(jnp.float32)
    af = a.astype(jnp.float32).reshape(1, cout)
    bf = b.astype(jnp.float32).reshape(1, cout)

    y1, y2 = pl.pallas_call(
        functools.partial(_kernel, split, seg),
        grid=(n_rb, n_cb),
        in_specs=[
            pl.BlockSpec((None, None, block_rows * seg, 16),
                         lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TH, tw, split), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, tw, cout - split), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h_out, w_out, split), out_dtype),
            jax.ShapeDtypeStruct((h_out, w_out, cout - split), out_dtype),
        ),
    )(xb, wp, af, bf)
    return y1[None], y2[None]
