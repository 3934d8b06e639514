"""Pallas 7x7/stride-2 stem convolution (+folded BN affine + ReLU + split) —
the speed-of-light replacement for XLA's strided small-channel conv.

Motivation (v5e, 1024x2048 input): XLA runs the fused 128-channel stem at
~1.2 ms plus ~1.6 ms of im2col relayout copies.  This kernel reads the
spatially pre-padded input once, builds the im2col rows with cheap
sublane-shifted slices, and feeds the MXU 128-deep contractions:

  * input format: (Hp, Wp/2, 16) where Hp = 2*H_out + 6 and each sublane
    holds TWO horizontal pixels x 8 channels (a pure reshape of the padded
    (Hp, Wp, 8) image);
  * output pixel j reads input pixels 2j + v, v in [0, 7): pixel 2j+v lives
    at sublane j + v//2, lane half v%2 — so the 7 (+1 zero) horizontal taps
    of rows u and u+1 are FOUR sublane-shifted (W_out, 16) slices each,
    lane-concatenated into an (W_out, 128) tile;
  * 4 tap-pair matmuls of (W_out, 128) @ (128, C_out) accumulate each output
    row; epilogue applies y = relu(acc * a + b) and splits the channels for
    the two stem consumers (SpatialPath / backbone).

The kernel computes both BiSeNet stems jointly (C_out = 128), mirrors
``deploy/fused_stem.py`` semantics, and is verified against the XLA conv in
tests/test_pallas_kernels.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # output rows per grid step


def _kernel(split, x_hbm, w_ref, a_ref, b_ref, out1_ref, out2_ref,
            scratch, sem):
    i = pl.program_id(0)
    # DMA the 2*TH+6 input rows this block needs (halo included)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * 2 * TH, 2 * TH + 6)], scratch, sem
    )
    dma.start()
    dma.wait()

    w_out = out1_ref.shape[1]
    cout = w_ref.shape[-1]

    def row_body(li, _):
        acc = jnp.zeros((w_out, cout), jnp.float32)
        for pair in range(4):  # tap-row pairs (0,1) (2,3) (4,5) (6,zero)
            pieces = []
            for uo in (0, 1):
                row = scratch[2 * li + 2 * pair + uo]  # (W_out + 4, 16)
                for s in range(4):
                    pieces.append(row[s : s + w_out, :])
            x_tile = jnp.concatenate(pieces, axis=1)  # (W_out, 128)
            acc = acc + jnp.dot(
                x_tile, w_ref[pair], preferred_element_type=jnp.float32
            )
        y = acc * a_ref[0] + b_ref[0]
        y = jnp.maximum(y, 0.0).astype(out1_ref.dtype)
        out1_ref[li] = y[:, :split]
        out2_ref[li] = y[:, split:]
        return 0

    jax.lax.fori_loop(0, TH, row_body, 0)


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
    # rightmost tap window fits); reshape pairs of pixels into lanes
    xp = jnp.pad(xp, ((3, 3), (3, 5), (0, 0)))
    xp = xp.reshape(h + 6, (w + 8) // 2, 16)

    wp = _pack_weights(kernel).astype(x.dtype)
    af = a.astype(jnp.float32).reshape(1, cout)
    bf = b.astype(jnp.float32).reshape(1, cout)

    grid = (h_out // TH,)
    y1, y2 = pl.pallas_call(
        functools.partial(_kernel, split),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            pl.BlockSpec((4, 128, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TH, w_out, split), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, w_out, cout - split), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h_out, w_out, split), out_dtype),
            jax.ShapeDtypeStruct((h_out, w_out, cout - split), out_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * TH + 6, w_out + 4, 16), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wp, af, bf)
    return y1[None], y2[None]
