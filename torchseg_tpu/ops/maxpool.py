"""3x3/2 pad-1 max pooling with a scatter-free backward.

The stock vjp of ``reduce_window(max)`` lowers to ``select_and_scatter``,
which costs 2.5 ms of the 38 ms BiSeNet train step on v5e (round-3
profile, docs/DESIGN.md) — the same class of data-dependent scatter that
made the loss gathers 30-250x slow on this toolchain.  This formulation
first computes one int8 "winning tap" index per window (the first tap
equal to the window max in row-major order — reproducing
select_and_scatter's first-in-scan-order tie routing exactly), then
routes gradients by comparing against that index, with BOTH the tap
extraction and the gradient placement expressed in window-space parity
planes:

- the 1-padded input's rows split by parity (a full-row-granularity
  slice — the cheap direction on TPU, cf. the stem-wgrad s2d finding);
- its column pairs become the channel dim via a FREE row-major reshape,
  so every tap (u, v) is a unit-stride slice + a lane-half select;
- per-tap gradient contributions stay in (oi, oj) window space and dx is
  reassembled from four parity planes with lane-aligned channel concats
  + free reshapes (columns) and one row interleave (rows).

No interior-dilated pads, no strided scatter — v1 of this file used
dilated ``lax.pad`` placement and measured 79 ms/step (docs/DESIGN.md);
this parity-plane v2 is the round-3 rewrite.

Forward is the identical ``reduce_window`` max the models used before
(reference nn.MaxPool2d(3, 2, 1), base_model/resnet.py:134 /
xception.py:108).
"""

import jax
import jax.numpy as jnp


def _fwd_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@jax.custom_vjp
def max_pool_3x3_s2(x):
    """NHWC 3x3 stride-2 pad-1 max pool (the torch MaxPool2d(3, 2, 1))."""
    return _fwd_pool(x)


def _mp_fwd(x):
    y = _fwd_pool(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    if h % 2 or w % 2:
        # Odd sizes: append a neg row/col to reach even h/w.  The output
        # grid is unchanged (ceil((n-1)/2)+1 == (n+1)//2 either way) and
        # neg never wins a max against finite activations, so gradients
        # routed below are identical; drop the appended row/col at the end.
        he, we = h + (h % 2), w + (w % 2)
        xe_pad = jnp.pad(x, ((0, 0), (0, he - h), (0, we - w), (0, 0)),
                         constant_values=neg)
        (dxe,) = _mp_bwd((xe_pad, y), g)
        return (dxe[:, :h, :w, :],)
    # Window (oi, oj) covers padded-input rows 2oi+u, cols 2oj+v
    # (u, v in 0..2).  Build the two row-parity planes of the padded
    # input with column pairs folded into channels:
    #   E2[m, n, (t, cc)] = xpad[2m,   2n+t]   (u even taps)
    #   O2[m, n, (t, cc)] = xpad[2m+1, 2n+t]   (u == 1 taps)
    # Row split of x is a full-row-granularity slice; the column
    # pair fold is a free row-major reshape of the column-padded rows.
    x5 = x.reshape(b, h // 2, 2, w, c)
    xe, xo = x5[:, :, 0], x5[:, :, 1]
    E = jnp.pad(xo, ((0, 0), (1, 0), (1, 1), (0, 0)), constant_values=neg)
    O = jnp.pad(xe, ((0, 0), (0, 1), (1, 1), (0, 0)), constant_values=neg)
    E2 = E.reshape(b, oh + 1, (w + 2) // 2, 2 * c)
    O2 = O.reshape(b, oh + 1, (w + 2) // 2, 2 * c)

    def tap(u, v):
        src = O2 if u == 1 else E2
        r0 = 1 if u == 2 else 0
        c0 = 1 if v == 2 else 0
        blk = src[:, r0:r0 + oh, c0:c0 + ow, :]
        # v == 1 is the second element of each column pair
        return blk[..., c:] if v == 1 else blk[..., :c]

    # One int8 "winning tap" plane instead of nine materialized masked-g
    # planes: idx[w] = first tap (row-major order, matching XLA
    # select_and_scatter's first-match tie routing) equal to the window
    # max, 9 if none (all -inf).  The idx pass is a single fusion with a
    # 1-byte-per-window output; per-tap contributions are then computed
    # LAZILY inside each parity-plane expression (reads idx + g), which
    # XLA fuses into the reassembly — ~3x less HBM traffic than
    # materializing the contributions.  Accumulation stays in g's dtype:
    # native select_and_scatter adds in the operand dtype too.
    nine = jnp.int8(9)
    idx = jnp.full(y.shape, nine, jnp.int8)
    for u in range(3):
        for v in range(3):
            t = jnp.int8(3 * u + v)
            idx = jnp.where((tap(u, v) == y) & (idx == nine), t, idx)
    zero = jnp.zeros((), g.dtype)

    def contrib(uv):
        u, v = uv
        return jnp.where(idx == 3 * u + v, g, zero)

    # dx row 2m   gets u == 1 taps at oi = m;      row 2m+1 gets
    # u == 0 at oi = m+1 and u == 2 at oi = m (same for columns/v).
    def up(t):  # t[:, m+1] with a zero row past the last window
        return jnp.pad(t, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]

    def left(t):  # t[:, :, n+1] with a zero column past the last window
        return jnp.pad(t, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]

    p00 = contrib((1, 1))
    p01 = left(contrib((1, 0))) + contrib((1, 2))
    p10 = up(contrib((0, 1))) + contrib((2, 1))
    p11 = (up(left(contrib((0, 0)))) + up(contrib((0, 2)))
           + left(contrib((2, 0))) + contrib((2, 2)))
    # reassemble: lane-aligned channel concat + free reshape interleaves
    # columns; stacking on a new row axis + free reshape interleaves rows
    rows_even = jnp.concatenate([p00, p01], axis=-1).reshape(b, oh, w, c)
    rows_odd = jnp.concatenate([p10, p11], axis=-1).reshape(b, oh, w, c)
    dx = jnp.stack([rows_even, rows_odd], axis=2).reshape(b, h, w, c)
    return (dx.astype(x.dtype),)


max_pool_3x3_s2.defvjp(_mp_fwd, _mp_bwd)

# Chip-measurement gate: forward is identical either way; the custom vjp
# only changes the BACKWARD lowering.  v5e A/Bs on the full BiSeNet-R18
# bs2@1024² train step (2026-08-17): select_and_scatter 37.97 vs
# parity-plane-v2 37.09 ms/step; with the s2d-rp stem forward,
# select_and_scatter 36.12 vs idx-based v3 34.15 ms/step — the 2.47 ms
# select_and_scatter becomes ~0.5 ms of fused passes (docs/DESIGN.md).
SCATTER_FREE_BWD = True


def stem_pool(x):
    """The backbones' stem 3x3/2 pad-1 maxpool (resnet.py / xception.py).
    Dispatches between the stock reduce_window (select_and_scatter
    backward) and the scatter-free custom vjp."""
    if SCATTER_FREE_BWD:
        return max_pool_3x3_s2(x)
    return _fwd_pool(x)
