"""Pallas kernels for the int8-through serving graph's two off-roofline
regions (deploy/int8_serve.py; round-4 per-op profile, docs/DESIGN.md):

  * the fused s2d stem conv: XLA runs it at ~1.37 ms (0.85 ms conv fusion
    + 0.32 ms (4,1)-packed s8 operand copy + 0.20 ms channel-split fusion)
    against a ~0.3 ms compute+bandwidth bound — the packed s8 operand
    layout and the 12-channel contraction defeat its conv tiling;
  * the 3x3/2 int8 maxpool that follows it: XLA's s8 reduce-window
    measures 0.40 ms for ~50 MB of traffic (~8x off the bandwidth bound).

The round-5 chip decomposition (docs/DESIGN.md "Pallas int8 stem") found
the three real costs, which shape everything here:
  1. an 8-piece s8 lane-concat in XLA costs 2.27 ms, but the SAME pack as
     jnp.stack + reshape costs 0.315 ms — the pack stays in XLA, stacked;
  2. inside Pallas, s8 stores with 64-lane minor dims pay a ~2x masking
     tax (two 64-ch outputs: 0.80 ms; one fused 128-ch output: 0.45 ms)
     — so the backbone half is never stored at stem resolution at all:
     the VERTICAL 3/2 maxpool fuses into the stem kernel (3 rows of
     requantized codes max-reduced in registers), and only the 2x-smaller
     vertically-pooled tensor is written;
  3. the horizontal 3/2 maxpool needs stride-2 column selection, which
     Mosaic has no strided access for — it runs on the width-paired
     (h, w/2, 2c) VIEW of the row-major tensor (an XLA reshape), where
     stride-2 becomes aligned lane halves.

All kernels obey the Mosaic restrictions documented in
ops/pallas/stem_conv.py (round 1): no unaligned lane-concats, no manual
DMA, python-unrolled static offsets only.  The stem kernel sidesteps the
im2col problem entirely: the XLA-side pack puts the 4 dy-rows and the
even/odd dx-taps into the channel axis, after which the conv is TWO
aligned K=128 matmuls per row block.  The requant epilogue (y*m+c, ReLU,
round, clip, int8) runs in f32 inside the kernel — bit-identical to the
XLA path's ``_requant`` up to f32 summation order (+-1 code on ties).

Maxpool exactness: max commutes with the monotone quantization, the pad
identity 0 never wins over the >=0 post-ReLU codes, and 3x3/2 max is
separable into vertical-then-horizontal 3/2 passes.

Reference anchor: the reference's stem is torch's cudnn 7x7/2 conv +
3x3/2 maxpool (furnace/base_model/resnet.py:106-140, torchvision conv
stem); this is its TPU int8 serving form.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pin the x32 stem-pack output layout to the stem kernel's operand
# constraint (kills the 0.24 ms {0,2,1}->{2,1,0} copy on the 67 MB
# tensor IF the DUS fusions can write it directly) — chip-gated until
# the A/B lands (perf_probe --variant int8-pin)
_PIN_X32_LAYOUT = False


# ----------------------------------------------------------------------
# weight / input packing (XLA side)
# ----------------------------------------------------------------------

def pack_stem_weights(wf, n_pad: int = 128):
    """(4,4,cin,cout) s2d stem kernel -> (2, 128, n_pad) dx-pair matmul
    weights in the kernel's packed-channel order [dx_in_pair, dy, ch].
    Works on jnp (in-graph, tiny) or np arrays."""
    xp = jnp if isinstance(wf, jnp.ndarray) else np
    kh, kw, cin, cout = wf.shape
    assert kh == 4 and kw == 4 and cin <= 16 and cout <= n_pad, wf.shape
    w = xp.pad(wf, ((0, 0), (0, 0), (0, 16 - cin), (0, n_pad - cout)))
    # (dy,dx,ch,o) -> (dx,dy,ch,o) -> [pair, (dx_in_pair, dy, ch), o]
    w = w.transpose(1, 0, 2, 3).reshape(2, 2 * 4 * 16, n_pad)
    return w


def pack_stem_input(xs):
    """(1, h2+3, w2+3, cin<=16) s2d int8 input -> (h2, w2+2, 128) packed
    tensor with x8[r, c, a*64 + dy*16 + ch] = xs[0, r+dy, c+a, ch].

    jnp.stack + reshape, NOT an 8-piece lane-concat: chip A/B measured the
    flat s8 concat at 2.27 ms vs 0.315 ms for the identical stack+reshape
    (round-5, docs/DESIGN.md) — XLA's s8 concat emitter materializes each
    lane-offset piece through a shuffle; stack writes tile-aligned."""
    b, hp, wp, cin = xs.shape
    assert b == 1, "serving kernels are batch-1"
    h2, w2 = hp - 3, wp - 3
    x = xs[0]
    if cin < 16:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 16 - cin)))
    return jnp.stack(
        [x[dy:dy + h2, a:a + w2 + 2, :] for a in (0, 1) for dy in range(4)],
        axis=2,
    ).reshape(h2, w2 + 2, 128)


def _epilogue_consts(m, c, cout):
    mf = m.astype(jnp.float32).reshape(1, cout)
    cf = c.astype(jnp.float32).reshape(1, cout)
    if cout < 128:
        mf = jnp.pad(mf, ((0, 0), (0, 128 - cout)))
        cf = jnp.pad(cf, ((0, 0), (0, 128 - cout)))
    return mf, cf


# ----------------------------------------------------------------------
# fused s2d stem conv + requant (+ split)
# ----------------------------------------------------------------------

def _conv_rows(nrows, w2, x_ref, w_ref, m_ref, c_ref):
    """(nrows, w2+2, 128) s8 block -> (nrows*w2, 128) f32 requantized
    codes.  Two aligned K=128 matmuls (dx-pairs at column offsets 0/+2),
    f32 accumulation, y*m+c / ReLU / round / clip epilogue."""
    xb = x_ref[...].astype(jnp.bfloat16)
    t0 = xb[:, 0:w2, :].reshape(nrows * w2, 128)
    t1 = xb[:, 2:w2 + 2, :].reshape(nrows * w2, 128)
    acc = jnp.dot(t0, w_ref[0], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(t1, w_ref[1], preferred_element_type=jnp.float32)
    z = jnp.maximum(acc * m_ref[0] + c_ref[0], 0.0)
    return jnp.clip(jnp.round(z), 0.0, 127.0)


def _stem_kernel(nr, x_ref, w_ref, m_ref, c_ref, out_ref):
    w2 = out_ref.shape[1]
    q = _conv_rows(nr, w2, x_ref, w_ref, m_ref, c_ref)
    out_ref[...] = q.astype(jnp.int8).reshape(nr, w2, 128)


def s2d_stem_conv_i8(xs, wf, m, c, n_sp: int, *, nr: int = 8):
    """Fused serving stem: 4x4 stride-1 conv over the pre-padded s2d int8
    input (deploy/int8_serve.prepare_s2d_input_u8) with bf16 weights, f32
    accumulation, folded-BN requant epilogue — one Pallas kernel emitting
    the fused 128-channel code tensor, split by an XLA slice pair (the
    in-kernel 64-lane split store costs MORE than the slice: 0.80 vs
    0.45 + 0.20 ms, round-5 chip table).

    xs: (1, h2+3, w2+3, cin<=16) int8     (h2=H/2, w2=W/2)
    wf: (4, 4, cin, cout) bf16 folded stem weights (int8-code domain)
    m, c: (cout,) f32 requant multiplier / bias (stem pack's mf/cf)
    n_sp: channels of the first (spatial-path) output split

    Returns (sp (1,h2,w2,n_sp) int8, bb (1,h2,w2,cout-n_sp) int8), equal
    to requant(relu(conv(xs, wf) * m + c)) split at n_sp.  Matches the
    XLA bf16-stem path up to f32 summation order (+-1 code on ties)."""
    b, hp, wp, cin = xs.shape
    h2, w2 = hp - 3, wp - 3
    cout = wf.shape[-1]
    assert b == 1 and h2 % nr == 0, (xs.shape, nr)
    assert 0 < n_sp < cout <= 128

    x8 = pack_stem_input(xs)
    w_pairs = pack_stem_weights(wf).astype(jnp.bfloat16)
    mf, cf = _epilogue_consts(m, c, cout)

    q = pl.pallas_call(
        functools.partial(_stem_kernel, nr),
        grid=(h2 // nr,),
        in_specs=[
            pl.BlockSpec((nr, w2 + 2, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, w2, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h2, w2, 128), jnp.int8),
    )(x8, w_pairs, mf, cf)
    return q[None, :, :, :n_sp], q[None, :, :, n_sp:cout]


# ----------------------------------------------------------------------
# fused stem + vertical 3/2 maxpool (backbone half never hits HBM at
# stem resolution) + horizontal 3/2 maxpool on the width-paired view
# ----------------------------------------------------------------------

def _stem_vpool_kernel(nr, x_ref, xt_ref, w_ref, m_ref, c_ref,
                       sp_ref, vp_ref):
    w2 = sp_ref.shape[1]
    q = _conv_rows(nr, w2, x_ref, w_ref, m_ref, c_ref)  # (nr*w2, 128)
    sp_ref[...] = q[:, :64].astype(jnp.int8).reshape(nr, w2, 64)

    # top halo: recompute the previous block's last row (x8 row nr*i-1,
    # BlockSpec-clamped at 0); on the first block it is the maxpool's
    # pad row — identity 0, never winning over the >=0 codes
    qh = _conv_rows(1, w2, xt_ref, w_ref, m_ref, c_ref)  # (w2, 128)
    first = pl.program_id(0) == 0
    bb_prev = jnp.where(first, jnp.zeros((w2, 64), jnp.float32),
                        qh[:, 64:])
    rows = [bb_prev] + [q[r * w2:(r + 1) * w2, 64:] for r in range(nr)]
    for s in range(nr // 2):
        v = jnp.maximum(jnp.maximum(rows[2 * s], rows[2 * s + 1]),
                        rows[2 * s + 2])
        vp_ref[s] = v.astype(jnp.int8)


def _hpool_kernel(ch, nr, x_ref, out_ref):
    # x_ref rows are the width-paired view (w4, 2ch): lanes [0:ch] = even
    # input column, [ch:2ch] = odd.  out[c'] = max(in[2c'-1 : 2c'+2]):
    # pairmax covers 2c'/2c'+1; the 2c'-1 neighbor is the previous pair's
    # odd half, shifted in by a zero-row sublane concat (the w'=0 pad).
    wo = out_ref.shape[1]
    for r in range(nr):
        mrow = x_ref[r].astype(jnp.bfloat16)
        pairmax = jnp.maximum(mrow[:, :ch], mrow[:, ch:])
        shifted = jnp.concatenate(
            [jnp.zeros((1, 2 * ch), jnp.bfloat16), mrow[:wo - 1, :]],
            axis=0)
        out_ref[r] = jnp.maximum(pairmax, shifted[:, ch:]).astype(jnp.int8)


def s2d_stem_pool_i8(xs, wf, m, c, n_sp: int, *, nr: int = 8):
    """Fused serving stem + backbone 3x3/2 maxpool: one kernel computes
    the 4x4 s2d stem conv + requant, stores the spatial-path half, and
    vertically max-pools the backbone half in registers (storing only the
    2x-smaller tensor); a second kernel finishes the horizontal pool on
    the width-paired view.  The full-resolution backbone activations
    never exist in HBM.

    Shapes as ``s2d_stem_conv_i8``; additionally requires the R18-stem
    geometry (cout=128, n_sp=64, h2 % (2*nr) == 0, w2 even) — callers
    fall back to the split stem + XLA maxpool otherwise.

    Returns (sp (1,h2,w2,64) int8, pooled (1,h2/2,w2/2,64) int8) where
    pooled == maxpool3x3s2p1(bb) exactly (separable max; identity 0 on
    both pads is dominated by the >=0 codes)."""
    b, hp, wp, cin = xs.shape
    h2, w2 = hp - 3, wp - 3
    cout = wf.shape[-1]
    assert b == 1 and cout == 128 and n_sp == 64, (xs.shape, cout, n_sp)
    assert h2 % (2 * nr) == 0 and w2 % 2 == 0, (h2, w2, nr)

    x8 = pack_stem_input(xs)
    w_pairs = pack_stem_weights(wf).astype(jnp.bfloat16)
    mf, cf = _epilogue_consts(m, c, cout)

    sp, vp = pl.pallas_call(
        functools.partial(_stem_vpool_kernel, nr),
        grid=(h2 // nr,),
        in_specs=[
            pl.BlockSpec((nr, w2 + 2, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2 + 2, 128),
                         lambda i: (jnp.maximum(nr * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nr, w2, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr // 2, w2, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h2, w2, 64), jnp.int8),
            jax.ShapeDtypeStruct((h2 // 2, w2, 64), jnp.int8),
        ),
    )(x8, x8, w_pairs, mf, cf)

    # horizontal 3/2 pool on the paired view (stride-2 -> lane halves)
    h4, w4 = h2 // 2, w2 // 2
    nrh = 8 if h4 % 8 == 0 else (4 if h4 % 4 == 0 else 2)
    assert h4 % nrh == 0, (h4, nrh)
    xv = vp.reshape(h4, w4, 128)
    pooled = pl.pallas_call(
        functools.partial(_hpool_kernel, 64, nrh),
        grid=(h4 // nrh,),
        in_specs=[
            pl.BlockSpec((nrh, w4, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrh, w4, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h4, w4, 64), jnp.int8),
    )(xv)
    return sp[None], pooled[None]


def stem_pool_shapes_ok(xs_shape, cout: int, n_sp: int,
                        nr: int = 8) -> bool:
    """Trace-time gate for ``s2d_stem_pool_i8`` (callers fall back to the
    XLA stem at unsupported geometries, e.g. odd sliding-crop sizes)."""
    b, hp, wp, _ = xs_shape
    h2, w2 = hp - 3, wp - 3
    return (b == 1 and cout == 128 and n_sp == 64
            and h2 % (2 * nr) == 0 and w2 % 2 == 0)


# ----------------------------------------------------------------------
# stem v3: 4-column-granular pack -> sp emitted DIRECTLY in the quad
# view the sp1 kernel consumes, pooled emitted DIRECTLY in the paired
# view the L1 kernel consumes.  Kills the ~0.54 ms of XLA boundary
# relayouts around the v2 stem (sp->quad 0.375 + pooled->paired 0.165,
# round-5 per-op profile).  Uses aligned partial lane-range STORES
# (probe-verified on this Mosaic build); lane-concat of computed slices
# silently MISCOMPILES here and is never used — concat operands are
# always full computed values.
# ----------------------------------------------------------------------


def pack_stem_input_x32(xs):
    """(1, h2+3, w2+3, cin<=16) s2d int8 input -> (h2, w2/4 + 1, 512)
    pack with x32[r, c4, j*128 + a*64 + dy*16 + ch] = xs[0, r+dy,
    4*c4 + j + a, ch] — the x8 pack regrouped to 4-column granularity
    so each output-column parity class is an aligned 128-lane slice.

    The width pad runs on the RAW input (8.4 MB) before the 8-piece
    stack, not on the 8x-replicated stack output (the round-4 order
    paid a 0.09 ms pad on the 67 MB tensor; chip A/B in DESIGN.md).
    The two orders differ only in lanes the stem kernel never reads
    (tail-sublane classes 2/3 beyond the last conv tap)."""
    b, hp, wp, cin = xs.shape
    assert b == 1, "serving kernels are batch-1"
    h2, w2 = hp - 3, wp - 3
    assert w2 % 4 == 0, w2
    x = xs[0]
    if cin < 16:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 16 - cin)))
    x = jnp.pad(x, ((0, 0), (0, 2), (0, 0)))  # w2+3 -> w2+5 cols
    x8 = jnp.stack(
        [x[dy:dy + h2, a:a + w2 + 4, :] for a in (0, 1) for dy in range(4)],
        axis=2,
    )  # (h2, w2+4, 8, 16)
    return x8.reshape(h2, w2 // 4 + 1, 512)


def _stem_pool_quad_kernel(nr, w2, x_ref, xt_ref, w_ref, m_ref, c_ref,
                           sp_ref, vp_ref):
    wq = w2 // 4
    first = pl.program_id(0) == 0

    def conv_classes(row):
        """row (wq+1, 512) bf16 -> [q0..q3] (wq, 128) f32 requantized
        codes, qj = output columns 4c+j."""
        qs = []
        for j in range(4):
            t0 = row[0:wq, 128 * j:128 * (j + 1)]
            k2 = (j + 2) % 4
            off = (j + 2) // 4  # classes 2,3 read the next sublane
            t1 = row[off:wq + off, 128 * k2:128 * (k2 + 1)]
            acc = jnp.dot(t0, w_ref[0],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(t1, w_ref[1],
                                preferred_element_type=jnp.float32)
            z = jnp.maximum(acc * m_ref[0] + c_ref[0], 0.0)
            qs.append(jnp.clip(jnp.round(z), 0.0, 127.0))
        return qs

    rows_q = []
    for r in range(nr):
        qs = conv_classes(x_ref[r].astype(jnp.bfloat16))
        for j in range(4):
            sp_ref[r, :, 64 * j:64 * (j + 1)] = (
                qs[j][:, 0:64].astype(jnp.int8))
        rows_q.append(qs)

    qh = conv_classes(xt_ref[0].astype(jnp.bfloat16))
    zero = jnp.zeros((wq, 128), jnp.float32)
    prev = [jnp.where(first, zero, q) for q in qh]
    rows_q = [prev] + rows_q
    zrow = jnp.zeros((1, 128), jnp.float32)
    for s in range(nr // 2):
        # vertical 3/2 max per class (bb rows 2s-1, 2s, 2s+1)
        vf = [jnp.maximum(jnp.maximum(rows_q[2 * s][j],
                                      rows_q[2 * s + 1][j]),
                          rows_q[2 * s + 2][j]) for j in range(4)]
        # horizontal 3/2 on class arrays: pooled col 2t <- input cols
        # 4t-1 (class 3, sublane t-1), 4t (class 0), 4t+1 (class 1);
        # pooled col 2t+1 <- 4t+1..4t+3 (classes 1, 2, 3)
        v3dn = jnp.concatenate([zrow, vf[3][:wq - 1]], axis=0)
        e = jnp.maximum(jnp.maximum(v3dn, vf[0]), vf[1])
        o = jnp.maximum(jnp.maximum(vf[1], vf[2]), vf[3])
        vp_ref[s, :, 0:64] = e[:, 64:128].astype(jnp.int8)
        vp_ref[s, :, 64:128] = o[:, 64:128].astype(jnp.int8)


def s2d_stem_pool_quad_i8(xs, wf, m, c, n_sp: int, *, nr: int = 8):
    """Stem v3: like ``s2d_stem_pool_i8`` but emitting the DOWNSTREAM
    layouts directly — sp in the quad view ``conv3x3s2_i8_quad``
    consumes ((h2, w2/4, 256) int8) and the pooled backbone in the
    paired view ``l1_stage_i8_paired`` consumes ((h2/2, w2/4, 128)
    int8) — so no XLA relayout exists between the Pallas stages.
    Same math, bit-compatible with the v2 kernel."""
    b, hp, wp, cin = xs.shape
    h2, w2 = hp - 3, wp - 3
    cout = wf.shape[-1]
    assert b == 1 and cout == 128 and n_sp == 64, (xs.shape, cout, n_sp)
    assert h2 % (2 * nr) == 0 and w2 % 8 == 0, (h2, w2, nr)

    x32 = pack_stem_input_x32(xs)
    if _PIN_X32_LAYOUT:
        # the round-5 per-op trace shows XLA emitting the pack DUS
        # fusion in layout {0,2,1} then paying a 0.24 ms copy to the
        # kernel's {2,1,0} operand constraint on the 67 MB tensor —
        # pin the pack output to row-major so the fusion writes the
        # kernel's layout directly (chip A/B: perf_probe int8-pin)
        from jax.experimental.layout import Layout, with_layout_constraint

        x32 = with_layout_constraint(
            x32, Layout(major_to_minor=(0, 1, 2)))
    w_pairs = pack_stem_weights(wf).astype(jnp.bfloat16)
    mf, cf = _epilogue_consts(m, c, cout)
    wq = w2 // 4

    sp_quad, pooled = pl.pallas_call(
        functools.partial(_stem_pool_quad_kernel, nr, w2),
        grid=(h2 // nr,),
        in_specs=[
            pl.BlockSpec((nr, wq + 1, 512), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wq + 1, 512),
                         lambda i: (jnp.maximum(nr * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nr, wq, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr // 2, wq, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h2, wq, 256), jnp.int8),
            jax.ShapeDtypeStruct((h2 // 2, wq, 128), jnp.int8),
        ),
    )(x32, x32, w_pairs, mf, cf)
    return sp_quad, pooled


# ----------------------------------------------------------------------
# int8 3x3 stride-2 pad-1 conv on the quad-packed width view — the
# spatial-path workhorse (BiSeNet SpatialPath convs 2 and 3; reference
# model/bisenet/*/network.py SpatialPath).  XLA's s8 conv at this shape
# costs ~0.9 ms in (4,1)-packed operand copies + select fusions; the
# kernel is 0.167 ms (round-5 chip table).
#
# Stride-2 width access is Mosaic-hostile (no strided loads), so the
# kernel consumes the QUAD view Q[r, c4, j*64+ch] = x[r, 4c4+j, ch]
# (an XLA minor-merge reshape of the row-major NHWC tensor) and emits
# the PAIRED view P[r', o2, h*64+ch] = y[r', 2o2+h, ch]: output column
# granularity (4 input columns per sublane) then matches input
# granularity 1:1, and the three width taps of each output parity are
# aligned 64-lane groups:
#   even outputs (cols 4c4 / 4c4+1 / 4c4-1): lanes [0:128] of the same
#     sublane + lanes [192:256] of the previous sublane (zero-row concat);
#   odd outputs (cols 4c4+1 / +2 / +3): lanes [64:256] of the same
#     sublane — one K=192 contraction.
# Vertical taps 2r'-1..2r'+1 are python-static rows of the input block;
# the cross-block top halo is a 1-row clamped BlockSpec ref, masked to
# the zero pad on the first block.
#
# Exactness: int8 code weights in bf16 are exact (|w| <= 127, 7 bits),
# MXU products accumulate in f32, and |acc| <= 127*127*576 < 2^24 — the
# integer conv is EXACT, so kernel == XLA `_qconv` + `_requant`
# bit-for-bit (verified on chip).
# ----------------------------------------------------------------------


def pack_conv3x3_weights(wq):
    """int8 (3,3,cin=64,cout=64) conv kernel -> per-dy matmul weights
    (wa (3,128,64), wb (3,64,64), wo (3,192,64)) in bf16 (exact codes):
    wa[dy] = vstack(w[dy,1], w[dy,2]); wb[dy] = w[dy,0];
    wo[dy] = vstack(w[dy,0], w[dy,1], w[dy,2])."""
    w = np.asarray(wq, np.float32)
    assert w.shape == (3, 3, 64, 64), w.shape
    wa = np.stack([np.concatenate([w[dy, 1], w[dy, 2]], 0)
                   for dy in range(3)])
    wb = np.stack([w[dy, 0] for dy in range(3)])
    wo = np.stack([np.concatenate([w[dy, 0], w[dy, 1], w[dy, 2]], 0)
                   for dy in range(3)])
    return (jnp.asarray(wa, jnp.bfloat16), jnp.asarray(wb, jnp.bfloat16),
            jnp.asarray(wo, jnp.bfloat16))


def _conv_q_kernel(nr, x_ref, xt_ref, wa_ref, wb_ref, wo_ref, m_ref,
                   c_ref, out_ref):
    w4 = out_ref.shape[1]
    first = pl.program_id(0) == 0
    top = xt_ref[0].astype(jnp.bfloat16)
    top = jnp.where(first, jnp.zeros_like(top), top)
    for r in range(nr):
        acc_e = jnp.zeros((w4, 64), jnp.float32)
        acc_o = jnp.zeros((w4, 64), jnp.float32)
        for dy in range(3):
            k = 2 * r - 1 + dy
            row = top if k < 0 else x_ref[k].astype(jnp.bfloat16)
            acc_e += jnp.dot(row[:, 0:128], wa_ref[dy],
                             preferred_element_type=jnp.float32)
            shifted = jnp.concatenate(
                [jnp.zeros((1, 256), jnp.bfloat16), row[:w4 - 1, :]],
                axis=0)
            acc_e += jnp.dot(shifted[:, 192:256], wb_ref[dy],
                             preferred_element_type=jnp.float32)
            acc_o += jnp.dot(row[:, 64:256], wo_ref[dy],
                             preferred_element_type=jnp.float32)
        qe = jnp.clip(jnp.round(
            jnp.maximum(acc_e * m_ref[0] + c_ref[0], 0.0)), 0.0, 127.0)
        qo = jnp.clip(jnp.round(
            jnp.maximum(acc_o * m_ref[0] + c_ref[0], 0.0)), 0.0, 127.0)
        out_ref[r] = jnp.concatenate([qe, qo], axis=1).astype(jnp.int8)


def conv3x3s2_i8_quad(xq, wa, wb, wo, m, c, *, nr: int = 8):
    """int8-through 3x3/2 pad-1 CBR on the quad width view.

    xq: (hi, wi/4, 256) int8 quad view of the (hi, wi, 64) input codes
    wa/wb/wo: ``pack_conv3x3_weights`` of the layer's int8 kernel
    m, c: (64,) f32 requant multiplier / bias

    Returns the PAIRED view (hi/2, wi/4, 128) of the (hi/2, wi/2, 64)
    output codes: requant(relu(conv(x, w) * m + c))."""
    hi, w4, lanes = xq.shape
    assert lanes == 256 and hi % (2 * nr) == 0, (xq.shape, nr)
    ho = hi // 2
    m2 = m.astype(jnp.float32).reshape(1, 64)
    c2 = c.astype(jnp.float32).reshape(1, 64)
    return pl.pallas_call(
        functools.partial(_conv_q_kernel, nr),
        grid=(ho // nr,),
        in_specs=[
            pl.BlockSpec((2 * nr, w4, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w4, 256),
                         lambda i: (jnp.maximum(2 * nr * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, 64), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 64, 64), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 192, 64), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, w4, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ho, w4, 128), jnp.int8),
    )(xq, xq, wa, wb, wo, m2, c2)


def _pick_nr(ho):
    for nr in (8, 4, 2, 1):
        if ho % nr == 0:
            return nr
    return 1


def spatial_path_shapes_ok(h2: int, w2: int) -> bool:
    """Trace-time gate for the 2-kernel spatial-path chain: both conv
    kernels need even output rows per block and quad-divisible widths."""
    return (h2 % 4 == 0 and w2 % 16 == 0
            and (h2 // 2) % 2 == 0 and (w2 // 4) % 2 == 0)


def spatial_path_i8_from_quad(xq, p1, p2):
    """BiSeNet SpatialPath convs 2+3 (3x3/2 CBRs) as chained quad
    kernels, starting from the quad view the v3 stem emits directly:
    xq (h2, w2/4, 256) int8 -> (1, h2/4, w2/4, 64) int8 codes at p2's
    output scale."""
    h2, wq, lanes = xq.shape
    assert lanes == 256, xq.shape
    w2 = 4 * wq
    o1 = conv3x3s2_i8_quad(xq, p1["wa"], p1["wb"], p1["wo"],
                           p1["m"], p1["c"], nr=_pick_nr(h2 // 2))
    # paired (h2/2, w2/4, 128) -> quad (h2/2, w2/8, 256)
    xq2 = o1.reshape(h2 // 2, w2 // 8, 256)
    o2 = conv3x3s2_i8_quad(xq2, p2["wa"], p2["wb"], p2["wo"],
                           p2["m"], p2["c"], nr=_pick_nr(h2 // 4))
    # paired (h2/4, w2/8, 128) -> standard NHWC
    return o2.reshape(h2 // 4, w2 // 4, 64)[None]


def spatial_path_i8(sp, p1, p2):
    """As ``spatial_path_i8_from_quad`` but from standard NHWC codes:
    sp (1, h2, w2, 64) int8.  p1/p2: dicts with the packed weights
    ("wa","wb","wo") and requant "m"/"c" (see
    deploy/int8_serve.make_int8_through_infer).  The inter-stage
    transforms are XLA minor-merge reshapes of row-major tensors (cheap
    relayouts); stride-2 never appears outside the kernels."""
    b, h2, w2, ch = sp.shape
    assert b == 1 and ch == 64, sp.shape
    return spatial_path_i8_from_quad(sp[0].reshape(h2, w2 // 4, 256),
                                     p1, p2)


# ----------------------------------------------------------------------
# fused ResNet-18 L1 stage (two stride-1 BasicBlocks, 4 convs) on the
# paired width view.  XLA runs these four s8 3x3 convs at ~1.5 ms
# (operand-layout fusions + unfused f32 requant epilogues, round-5
# per-op profile) against a ~0.2 ms MXU bound; the fused kernel keeps
# every intermediate in VMEM (only the stage input/output touch HBM,
# 8.4 MB each) and recomputes a 4-row halo per block for the chained
# 3x3 receptive field.
#
# Stride-1 pairing: with P[c] holding columns (2c, 2c+1) in lane
# halves, BOTH output parities read the SAME aligned operand row —
#   even out (taps 2c-1, 2c, 2c+1):  P[c] @ [[w1|w0],[w2|w1]]
#                                    + shift_dn(P)[c] @ [[0|0],[w0|0]]
#   odd  out (taps 2c,  2c+1, 2c+2): (second N-half of the same dots)
#                                    + shift_up(P)[c] @ [[0|w2],[0|0]]
# so one K=3*(128+128+128) dot per (output row, conv) computes both
# parities at N=128 (the dn/up pieces carry half-zero weights: 67%
# effective K).  Row shifts are sublane zero-concats; everything is
# python-unrolled.
#
# Halo/pad correctness: intermediate activations OUTSIDE the image
# (global row < 0 or >= h) are forced to ZERO — a recomputed halo row
# fed from zero padding is NOT zero after the +bias/ReLU of the
# previous conv, so each level masks its out-of-range rows to match
# XLA's zero padding exactly.
# ----------------------------------------------------------------------


def _resblock_w(w, dy):
    """(3,3,64,64) int8 conv kernel -> the dy-slice of the combined
    dual-parity weight stack: (3, 128, 128) pieces [aligned, dn, up]."""
    wa = np.zeros((128, 128), np.float32)
    wa[0:64, 0:64] = w[dy, 1]
    wa[0:64, 64:128] = w[dy, 0]
    wa[64:128, 0:64] = w[dy, 2]
    wa[64:128, 64:128] = w[dy, 1]
    wd = np.zeros((128, 128), np.float32)
    wd[64:128, 0:64] = w[dy, 0]
    wu = np.zeros((128, 128), np.float32)
    wu[0:64, 64:128] = w[dy, 2]
    return wa, wd, wu


def pack_resblock_weights(e1, e2):
    """Two _apply_block param dicts (l1_0, l1_1: conv1/conv2 with int8
    'w' + f32 'm'/'c', plus 'res_ratio') -> the fused-kernel params:
    W (4, 1152, 128) bf16 (exact int8 codes), mc (4, 2, 128) f32
    requant rows (m, c duplicated across parity halves), rr (2, 128)."""
    ws, mcs, rrs = [], [], []
    for e in (e1, e2):
        for conv in ("conv1", "conv2"):
            w = np.asarray(e[conv]["w"], np.float32)
            pieces = []
            for dy in range(3):
                pieces.extend(_resblock_w(w, dy))
            ws.append(np.concatenate(pieces, axis=0))  # (1152, 128)
            m = np.asarray(e[conv]["m"], np.float32)
            c = np.asarray(e[conv]["c"], np.float32)
            mcs.append(np.stack([np.tile(m, 2), np.tile(c, 2)]))
        rr = np.broadcast_to(
            np.asarray(e["res_ratio"], np.float32).reshape(-1), (64,))
        rrs.append(np.tile(rr, 2))
    return (jnp.asarray(np.stack(ws), jnp.bfloat16),
            jnp.asarray(np.stack(mcs), jnp.float32),
            jnp.asarray(np.stack(rrs), jnp.float32))


def _shifted3(row):
    """(row, shift_dn(row), shift_up(row)) — computed ONCE per level
    row and reused by all three consumer conv rows (the per-consumer
    rebuild tripled the kernel's VPU shift traffic)."""
    zero = jnp.zeros((1, row.shape[1]), row.dtype)
    dn = jnp.concatenate([zero, row[:-1]], axis=0)
    up = jnp.concatenate([row[1:], zero], axis=0)
    return row, dn, up


def _conv_row(rows, r, w_ref, j):
    """One dual-parity conv row: rows maps block offsets to cached
    (row, dn, up) triples of (W2, 128) bf16 code rows (absent = zero
    pad row); returns the (W2, 128) f32 pre-epilogue accumulator — one
    K<=1152 dot."""
    ops, wrows = [], []
    for dy in range(3):
        tri = rows.get(r - 1 + dy)
        if tri is None:
            continue  # static zero row (image pad): contributes nothing
        ops.extend(tri)
        wrows.append(w_ref[j, 384 * dy: 384 * (dy + 1), :])
    op = jnp.concatenate(ops, axis=1)
    wsel = jnp.concatenate(wrows, axis=0)
    return jnp.dot(op, wsel, preferred_element_type=jnp.float32)


def _requant_rows(y, mc_ref, j):
    z = jnp.maximum(y * mc_ref[j, 0] + mc_ref[j, 1], 0.0)
    return jnp.clip(jnp.round(z), 0.0, 127.0).astype(jnp.bfloat16)


def _res_stage_kernel(nr, h4, x_top_ref, x_ref, x_bot_ref, w_ref, mc_ref,
                      rr_ref, out_ref):
    base = pl.program_id(0) * nr

    def in_row(off):
        """Input code row at block offset `off` in [-4, nr+4), masked to
        the zero pad outside the image."""
        if off < -4 or off >= nr + 4:
            return None
        if off < 0:
            v = x_top_ref[4 + off].astype(jnp.bfloat16)
        elif off < nr:
            v = x_ref[off].astype(jnp.bfloat16)
        else:
            v = x_bot_ref[off - nr].astype(jnp.bfloat16)
        g = base + off
        return _shifted3(jnp.where((g >= 0) & (g < h4), v,
                                   jnp.zeros_like(v)))

    def level(rows, lo, hi, j, resid=None, rr=None, last=False):
        """conv j over block offsets [lo, hi); rows maps offsets to
        cached (row, dn, up) triples.  Returns the next level's dict
        (also triples, except the last level), rows masked to zero
        outside the image (XLA's conv pad)."""
        out = {}
        for off in range(lo, hi):
            y = _conv_row(rows, off, w_ref, j)
            if resid is not None:
                z = jnp.maximum(
                    y * mc_ref[j, 0] + mc_ref[j, 1]
                    + resid[off][0].astype(jnp.float32) * rr_ref[rr], 0.0)
                q = jnp.clip(jnp.round(z), 0.0, 127.0).astype(jnp.bfloat16)
            else:
                q = _requant_rows(y, mc_ref, j)
            g = base + off
            q = jnp.where((g >= 0) & (g < h4), q, jnp.zeros_like(q))
            out[off] = q if last else _shifted3(q)
        return out

    x_rows = {off: in_row(off) for off in range(-4, nr + 4)}
    c1 = level(x_rows, -3, nr + 3, 0)
    b0 = level(c1, -2, nr + 2, 1, resid=x_rows, rr=0)
    c3 = level(b0, -1, nr + 1, 2)
    b1 = level(c3, 0, nr, 3, resid=b0, rr=1, last=True)
    for off in range(nr):
        out_ref[off] = b1[off].astype(jnp.int8)


def l1_stage_i8_paired(pooled, W, mc, rr, *, nr: int = 8):
    """ResNet-18 stage-1 (two stride-1 BasicBlocks) int8-through, fused
    into one Pallas kernel over the width-paired view.

    pooled: (1, h4, w4, 64) int8 codes (the stem+pool output)
    W/mc/rr: ``pack_resblock_weights`` of the l1_0/l1_1 packages

    Returns (1, h4, w4, 64) int8 codes == two chained ``_apply_block``
    calls (deploy/int8_serve) — exact integer dots in bf16/f32, same
    f32 epilogue expression and op order."""
    b, h4, w4, ch = pooled.shape
    assert b == 1 and ch == 64 and w4 % 2 == 0, pooled.shape
    return l1_stage_i8_paired_view(
        pooled[0].reshape(h4, w4 // 2, 128), W, mc, rr, nr=nr)


def l1_stage_i8_paired_view(xv, W, mc, rr, *, nr: int = 8,
                            paired_out: bool = False):
    """``l1_stage_i8_paired`` on the paired view directly: xv is the
    (h4, w4/2, 128) tensor the v3 stem emits; returns standard NHWC
    (1, h4, w4, 64) for the XLA stage-2 conv — or, with
    ``paired_out=True``, the raw (h4, w4/2, 128) paired view that
    ``l2_stage_i8_from_paired`` consumes directly (the NHWC reshape is
    a free row-major view either way; returning the view keeps the
    consumer's layout choice explicit)."""
    h4, w2, lanes = xv.shape
    assert lanes == 128, xv.shape
    w4 = 2 * w2
    assert h4 % nr == 0 and nr % 4 == 0, (h4, nr)
    out = pl.pallas_call(
        functools.partial(_res_stage_kernel, nr, h4),
        grid=(h4 // nr,),
        in_specs=[
            pl.BlockSpec((4, w2, 128),
                         lambda i: (jnp.maximum(nr // 4 * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, w2, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, w2, 128),
                         lambda i: (jnp.minimum(nr // 4 * (i + 1),
                                                h4 // 4 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1152, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, w2, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h4, w2, 128), jnp.int8),
    )(xv, xv, xv, W, mc, rr)
    if paired_out:
        return out
    return out.reshape(h4, w4, 64)[None]


# ----------------------------------------------------------------------
# fused ResNet-18 DOWN stage (strided BasicBlock + stride-1 BasicBlock,
# 5 convs incl. the 1x1 projection: conv1 3x3/2 cin->2cin, conv2 3x3
# 2cin->2cin, down 1x1/2 cin->2cin, then the second block's two 3x3
# 2cin->2cin convs) consuming the previous stage's paired-view output
# DIRECTLY — cin=64 is the L2 stage (chains off the L1 kernel's
# paired_out), cin=128 the L3 stage (chains off the L2 kernel's output
# through a free row-major pair view).  The round-5 per-op profile
# attributes ~0.3 ms of s8 operand-layout fusions plus the conv time
# itself to XLA's l2 stage; the fused kernel keeps every intermediate
# in VMEM and recomputes a 3-row halo (in output space) per block,
# exactly like the L1 stage kernel.
#
# Stride-2 on the paired view is NATIVE here: with P[o] holding input
# columns (2o, 2o+1) in lane halves, conv1's output column o reads taps
#   2o   (lanes [0:cin]      of sublane o)    -> dx=1
#   2o+1 (lanes [cin:2cin]   of sublane o)    -> dx=2
#   2o-1 (lanes [cin:2cin]   of sublane o-1)  -> dx=0 (sublane shift-dn)
# so each (row, dy) contributes ONE aligned K=4cin piece
# [P, shift_dn(P)] (the dn even half carries zero weights: 75%
# effective K).  conv1's output width equals the paired sublane count
# 1:1, and cout=2cin fills the lane dim exactly — every downstream conv
# runs on standard (w_out, 2cin) rows where the 3 width taps are
# sublane shifts: one K=9*2cin dot per (row, conv) at 100% effective K.
#
# Halo/pad correctness: identical scheme to the L1 kernel — every level
# masks rows outside the image to ZERO (a recomputed halo row fed from
# zero padding is NOT zero after the +bias of the previous conv).
#
# Exactness: int8 codes in bf16 are exact and the MXU accumulates f32;
# bit-identical to the chained ``_apply_block`` XLA path (same
# accumulation type, f32 epilogue expression and op order; verified in
# tests and on chip for both stages).
# ----------------------------------------------------------------------


def _down_c1_weights(w):
    """(3,3,cin,2cin) conv1 kernel -> (6*2cin, 2cin) paired-view
    stride-2 matmul weights: per-dy blocks [aligned P | shift_dn(P)]
    with P-lane mapping [0:cin]=dx1, [cin:2cin]=dx2; dn [0:cin]=unused
    (zero), [cin:2cin]=dx0."""
    w = np.asarray(w, np.float32)
    kh, kw, cin, cout = w.shape
    assert (kh, kw, cout) == (3, 3, 2 * cin), w.shape
    blocks = []
    for dy in range(3):
        a = np.concatenate([w[dy, 1], w[dy, 2]], axis=0)      # (2cin,2cin)
        d = np.concatenate([np.zeros((cin, cout), np.float32),
                            w[dy, 0]], axis=0)                 # (2cin,2cin)
        blocks.extend((a, d))
    return np.concatenate(blocks, axis=0)                      # (12cin,2cin)


def _down_c3_weights(w):
    """(3,3,C,C) stride-1 kernel -> (9C, C) standard-row matmul
    weights, per-dy blocks in [dn(dx0), row(dx1), up(dx2)] order."""
    w = np.asarray(w, np.float32)
    assert (w.shape[0], w.shape[1]) == (3, 3) and w.shape[2] == w.shape[3]
    return np.concatenate(
        [np.concatenate([w[dy, 0], w[dy, 1], w[dy, 2]], axis=0)
         for dy in range(3)], axis=0)


def pack_down_stage_weights(e0, e1):
    """Strided/stride-1 _apply_block param dict pair -> the fused-kernel
    params: Wc1 (12cin, 2cin) bf16, Wd (cin, 2cin) bf16 (the 1x1
    projection), W3 (3, 18cin, 2cin) bf16 [e0.conv2, e1.conv1,
    e1.conv2], mc (5, 2, 2cin) f32 requant rows [c1, conv2_0, down, c3,
    conv2_1], rr (1, 2cin) f32 (e1's residual ratio).  All weights are
    exact int8 codes carried in bf16."""
    cin = e0["conv1"]["w"].shape[2]
    wc1 = _down_c1_weights(e0["conv1"]["w"])
    wd = np.asarray(e0["down"]["w"], np.float32).reshape(cin, 2 * cin)
    w3 = np.stack([_down_c3_weights(e0["conv2"]["w"]),
                   _down_c3_weights(e1["conv1"]["w"]),
                   _down_c3_weights(e1["conv2"]["w"])])
    mcs = []
    for e, conv in ((e0, "conv1"), (e0, "conv2"), (e0, "down"),
                    (e1, "conv1"), (e1, "conv2")):
        mcs.append(np.stack([np.asarray(e[conv]["m"], np.float32),
                             np.asarray(e[conv]["c"], np.float32)]))
    rr = np.broadcast_to(
        np.asarray(e1["res_ratio"], np.float32).reshape(-1), (2 * cin,))
    return (jnp.asarray(wc1, jnp.bfloat16), jnp.asarray(wd, jnp.bfloat16),
            jnp.asarray(w3, jnp.bfloat16),
            jnp.asarray(np.stack(mcs), jnp.float32),
            jnp.asarray(rr.reshape(1, 2 * cin), jnp.float32))


pack_l2_weights = pack_down_stage_weights


def _down_stage_kernel(nr, h8, x_top_ref, x_ref, x_bot_ref, wc1_ref, wd_ref,
                       w3_ref, mc_ref, rr_ref, out_ref):
    base = pl.program_id(0) * nr   # output-row base (h8 space)
    h4 = 2 * h8
    w2 = x_ref.shape[1]
    lanes = x_ref.shape[2]         # 2*cin
    zrow = jnp.zeros((1, lanes), jnp.bfloat16)

    def in_row(off):
        """Paired input row at block-relative h4-space offset (with its
        cached dn shift), masked to the zero pad outside the image."""
        if off < -8 or off >= 2 * nr + 8:
            return None
        if off < 0:
            v = x_top_ref[8 + off].astype(jnp.bfloat16)
        elif off < 2 * nr:
            v = x_ref[off].astype(jnp.bfloat16)
        else:
            v = x_bot_ref[off - 2 * nr].astype(jnp.bfloat16)
        g = 2 * base + off
        v = jnp.where((g >= 0) & (g < h4), v, jnp.zeros_like(v))
        return v, jnp.concatenate([zrow, v[:-1]], axis=0)

    x_rows = {off: in_row(off) for off in range(-7, 2 * nr + 6)}

    def mask8(q, t):
        g = base + t
        return jnp.where((g >= 0) & (g < h8), q, jnp.zeros_like(q))

    def c1_row(t):
        """conv1 (3x3/2 cin->2cin) output row t as bf16 codes."""
        pieces = []
        for dy in range(3):
            pieces.extend(x_rows[2 * t - 1 + dy])
        acc = jnp.dot(jnp.concatenate(pieces, axis=1), wc1_ref[...],
                      preferred_element_type=jnp.float32)
        z = jnp.maximum(acc * mc_ref[0, 0] + mc_ref[0, 1], 0.0)
        q = jnp.clip(jnp.round(z), 0.0, 127.0).astype(jnp.bfloat16)
        return _shifted3(mask8(q, t))

    def conv3_acc(rows, t, j):
        """stride-1 3x3 2cin->2cin accumulator at output row t: one
        K=18cin dot over cached [dn, row, up] triples per dy."""
        zero3 = None
        ops = []
        for dy in range(3):
            tri = rows.get(t - 1 + dy)
            if tri is None:
                if zero3 is None:
                    z = jnp.zeros((w2, lanes), jnp.bfloat16)
                    zero3 = (z, z, z)
                tri = zero3
            ops.extend((tri[1], tri[0], tri[2]))
        return jnp.dot(jnp.concatenate(ops, axis=1), w3_ref[j],
                       preferred_element_type=jnp.float32)

    c1 = {t: c1_row(t) for t in range(-3, nr + 3)}
    b0 = {}
    for t in range(-2, nr + 2):
        yd = jnp.dot(x_rows[2 * t][0][:, 0:lanes // 2], wd_ref[...],
                     preferred_element_type=jnp.float32)
        z = (conv3_acc(c1, t, 0) * mc_ref[1, 0] + mc_ref[1, 1]
             + yd * mc_ref[2, 0] + mc_ref[2, 1])
        q = jnp.clip(jnp.round(jnp.maximum(z, 0.0)), 0.0,
                     127.0).astype(jnp.bfloat16)
        b0[t] = _shifted3(mask8(q, t))
    c3 = {}
    for t in range(-1, nr + 1):
        z = jnp.maximum(conv3_acc(b0, t, 1) * mc_ref[3, 0]
                        + mc_ref[3, 1], 0.0)
        c3[t] = _shifted3(mask8(jnp.clip(jnp.round(z), 0.0,
                                         127.0).astype(jnp.bfloat16), t))
    for t in range(nr):
        z = (conv3_acc(c3, t, 2) * mc_ref[4, 0] + mc_ref[4, 1]
             + b0[t][0].astype(jnp.float32) * rr_ref[0])
        q = jnp.clip(jnp.round(jnp.maximum(z, 0.0)), 0.0, 127.0)
        out_ref[t] = q.astype(jnp.int8)


def down_stage_shapes_ok(h4: int, w4: int, nr: int = 8) -> bool:
    """Trace-time gate for ``down_stage_i8_from_paired`` (h4/w4 = the
    stage's INPUT spatial dims)."""
    return (h4 % 8 == 0 and (h4 // 2) % nr == 0 and nr % 4 == 0
            and w4 % 2 == 0)


l2_stage_shapes_ok = down_stage_shapes_ok


def down_stage_i8_from_paired(xv, Wc1, Wd, W3, mc, rr, *, nr: int = 8):
    """ResNet-18 down stage int8-through (strided BasicBlock with 1x1
    projection + stride-1 BasicBlock, 5 convs), one Pallas kernel over
    the paired width view of the previous stage's output — stage 2
    (cin=64) off the L1 kernel's paired_out, stage 3 (cin=128) off the
    L2 kernel's output via a free row-major pair view.

    xv: (h, w/2, 2cin) int8 paired view of the (h, w, cin) input codes
    Wc1/Wd/W3/mc/rr: ``pack_down_stage_weights`` of the stage's two
    block packages

    Returns (1, h/2, w/2, 2cin) int8 codes in standard NHWC ==
    ``_apply_block(_apply_block(x, e0, 2), e1, 1)`` bit-for-bit
    (exact integer dots, same f32 epilogue expression and op order)."""
    h4, w2, lanes = xv.shape
    assert lanes % 128 == 0, xv.shape
    h8 = h4 // 2
    assert h4 % 8 == 0 and h8 % nr == 0 and nr % 4 == 0, (h4, nr)
    out = pl.pallas_call(
        functools.partial(_down_stage_kernel, nr, h8),
        grid=(h8 // nr,),
        in_specs=[
            pl.BlockSpec((8, w2, lanes),
                         lambda i: (jnp.maximum(nr // 4 * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nr, w2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w2, lanes),
                         lambda i: (jnp.minimum(nr // 4 * (i + 1),
                                                h4 // 8 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * lanes, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes // 2, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 9 * lanes, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 2, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, w2, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h8, w2, lanes), jnp.int8),
    )(xv, xv, xv, Wc1, Wd, W3, mc, rr)
    return out[None]


l2_stage_i8_from_paired = down_stage_i8_from_paired


# ----------------------------------------------------------------------
# L4 stage as TWO kernels: the fused 5-conv down-stage kernel needs
# ~17.5 MB of resident bf16 weights at cin=256 (> the ~16 MB VMEM), so
# stage 4 splits at the natural block boundary — a 3-conv "down block"
# kernel (conv1 3x3/2 + conv2 3x3 + the 1x1 projection, ~8.1 MB) and a
# 2-conv "res block" kernel (the stride-1 BasicBlock, ~9.4 MB).  Both
# read/write standard (w, C) s8 rows in the same layout, so the split
# costs one extra HBM round-trip of the (h/2, w/2, 2cin) intermediate
# and no relayout.  Same halo/masking/exactness scheme as the fused
# down-stage kernel above.
# ----------------------------------------------------------------------


def pack_down_block_weights(e0):
    """Strided _apply_block param dict -> down-block kernel params:
    Wc1 (12cin, 2cin) bf16, Wd (cin, 2cin) bf16, Wc2 (18cin, 2cin)
    bf16, mc (3, 2, 2cin) f32 rows [c1, conv2, down]."""
    cin = e0["conv1"]["w"].shape[2]
    wc1 = _down_c1_weights(e0["conv1"]["w"])
    wd = np.asarray(e0["down"]["w"], np.float32).reshape(cin, 2 * cin)
    wc2 = _down_c3_weights(e0["conv2"]["w"])
    mcs = [np.stack([np.asarray(e0[conv]["m"], np.float32),
                     np.asarray(e0[conv]["c"], np.float32)])
           for conv in ("conv1", "conv2", "down")]
    return (jnp.asarray(wc1, jnp.bfloat16), jnp.asarray(wd, jnp.bfloat16),
            jnp.asarray(wc2, jnp.bfloat16),
            jnp.asarray(np.stack(mcs), jnp.float32))


def pack_res_block1_weights(e1):
    """Stride-1 _apply_block param dict -> res-block kernel params:
    W (2, 9C, C) bf16, mc (2, 2, C) f32, rr (1, C) f32."""
    c = e1["conv1"]["w"].shape[2]
    w = np.stack([_down_c3_weights(e1["conv1"]["w"]),
                  _down_c3_weights(e1["conv2"]["w"])])
    mcs = [np.stack([np.asarray(e1[conv]["m"], np.float32),
                     np.asarray(e1[conv]["c"], np.float32)])
           for conv in ("conv1", "conv2")]
    rr = np.broadcast_to(
        np.asarray(e1["res_ratio"], np.float32).reshape(-1), (c,))
    return (jnp.asarray(w, jnp.bfloat16),
            jnp.asarray(np.stack(mcs), jnp.float32),
            jnp.asarray(rr.reshape(1, c), jnp.float32))


def _down_block_kernel(nr, h8, x_top_ref, x_ref, x_bot_ref, wc1_ref,
                       wd_ref, wc2_ref, mc_ref, out_ref):
    base = pl.program_id(0) * nr   # output-row base (h8 space)
    h4 = 2 * h8
    w2 = x_ref.shape[1]
    lanes = x_ref.shape[2]         # 2*cin
    zrow = jnp.zeros((1, lanes), jnp.bfloat16)

    def in_row(off):
        if off < -4 or off >= 2 * nr + 4:
            return None
        if off < 0:
            v = x_top_ref[4 + off].astype(jnp.bfloat16)
        elif off < 2 * nr:
            v = x_ref[off].astype(jnp.bfloat16)
        else:
            v = x_bot_ref[off - 2 * nr].astype(jnp.bfloat16)
        g = 2 * base + off
        v = jnp.where((g >= 0) & (g < h4), v, jnp.zeros_like(v))
        return v, jnp.concatenate([zrow, v[:-1]], axis=0)

    x_rows = {off: in_row(off) for off in range(-3, 2 * nr + 2)}

    def mask8(q, t):
        g = base + t
        return jnp.where((g >= 0) & (g < h8), q, jnp.zeros_like(q))

    def c1_row(t):
        pieces = []
        for dy in range(3):
            pieces.extend(x_rows[2 * t - 1 + dy])
        acc = jnp.dot(jnp.concatenate(pieces, axis=1), wc1_ref[...],
                      preferred_element_type=jnp.float32)
        z = jnp.maximum(acc * mc_ref[0, 0] + mc_ref[0, 1], 0.0)
        q = jnp.clip(jnp.round(z), 0.0, 127.0).astype(jnp.bfloat16)
        return _shifted3(mask8(q, t))

    c1 = {t: c1_row(t) for t in range(-1, nr + 1)}
    for t in range(nr):
        ops = []
        for dy in range(3):
            tri = c1[t - 1 + dy]
            ops.extend((tri[1], tri[0], tri[2]))
        acc = jnp.dot(jnp.concatenate(ops, axis=1), wc2_ref[...],
                      preferred_element_type=jnp.float32)
        yd = jnp.dot(x_rows[2 * t][0][:, 0:lanes // 2], wd_ref[...],
                     preferred_element_type=jnp.float32)
        z = (acc * mc_ref[1, 0] + mc_ref[1, 1]
             + yd * mc_ref[2, 0] + mc_ref[2, 1])
        q = jnp.clip(jnp.round(jnp.maximum(z, 0.0)), 0.0, 127.0)
        out_ref[t] = q.astype(jnp.int8)


def down_block_i8_from_paired(xv, Wc1, Wd, Wc2, mc, *, nr: int = 8):
    """One strided BasicBlock (conv1 3x3/2 cin->2cin + conv2 3x3 + 1x1
    projection) over the paired width view — the L4 front half.

    xv: (h, w/2, 2cin) int8 paired view of the (h, w, cin) input codes
    Returns (1, h/2, w/2, 2cin) int8 std NHWC == ``_apply_block(x, e0,
    2)`` bit-for-bit."""
    h4, w2, lanes = xv.shape
    assert lanes % 128 == 0, xv.shape
    h8 = h4 // 2
    assert h4 % 8 == 0 and h8 % nr == 0 and nr % 4 == 0, (h4, nr)
    out = pl.pallas_call(
        functools.partial(_down_block_kernel, nr, h8),
        grid=(h8 // nr,),
        in_specs=[
            pl.BlockSpec((4, w2, lanes),
                         lambda i: (jnp.maximum(nr // 2 * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nr, w2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, w2, lanes),
                         lambda i: (jnp.minimum(nr // 2 * (i + 1),
                                                h4 // 4 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * lanes, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes // 2, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * lanes, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, w2, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h8, w2, lanes), jnp.int8),
    )(xv, xv, xv, Wc1, Wd, Wc2, mc)
    return out[None]


def _res_block_kernel(nr, h, x_top_ref, x_ref, x_bot_ref, w_ref, mc_ref,
                      rr_ref, out_ref):
    base = pl.program_id(0) * nr
    w2 = x_ref.shape[1]
    lanes = x_ref.shape[2]

    def in_row(off):
        if off < -2 or off >= nr + 2:
            return None
        if off < 0:
            v = x_top_ref[4 + off].astype(jnp.bfloat16)
        elif off < nr:
            v = x_ref[off].astype(jnp.bfloat16)
        else:
            v = x_bot_ref[off - nr].astype(jnp.bfloat16)
        g = base + off
        return _shifted3(jnp.where((g >= 0) & (g < h), v,
                                   jnp.zeros_like(v)))

    x_rows = {off: in_row(off) for off in range(-2, nr + 2)}

    def conv3(rows, t, j):
        zero3 = None
        ops = []
        for dy in range(3):
            tri = rows.get(t - 1 + dy)
            if tri is None:
                if zero3 is None:
                    z = jnp.zeros((w2, lanes), jnp.bfloat16)
                    zero3 = (z, z, z)
                tri = zero3
            ops.extend((tri[1], tri[0], tri[2]))
        return jnp.dot(jnp.concatenate(ops, axis=1), w_ref[j],
                       preferred_element_type=jnp.float32)

    c3 = {}
    for t in range(-1, nr + 1):
        z = jnp.maximum(conv3(x_rows, t, 0) * mc_ref[0, 0]
                        + mc_ref[0, 1], 0.0)
        q = jnp.clip(jnp.round(z), 0.0, 127.0).astype(jnp.bfloat16)
        g = base + t
        c3[t] = _shifted3(jnp.where((g >= 0) & (g < h), q,
                                    jnp.zeros_like(q)))
    for t in range(nr):
        z = (conv3(c3, t, 1) * mc_ref[1, 0] + mc_ref[1, 1]
             + x_rows[t][0].astype(jnp.float32) * rr_ref[0])
        q = jnp.clip(jnp.round(jnp.maximum(z, 0.0)), 0.0, 127.0)
        out_ref[t] = q.astype(jnp.int8)


def res_block_i8_std(x, W, mc, rr, *, nr: int = 8):
    """One stride-1 BasicBlock (two 3x3 C->C convs + scaled residual)
    on standard NHWC int8 rows — the L4 back half.

    x: (1, h, w, C) int8 codes; W/mc/rr: ``pack_res_block1_weights``
    Returns (1, h, w, C) int8 == ``_apply_block(x, e1, 1)``
    bit-for-bit."""
    b, h, w2, lanes = x.shape
    assert b == 1 and lanes % 128 == 0, x.shape
    assert h % nr == 0 and nr % 4 == 0, (h, nr)
    xs = x[0]
    out = pl.pallas_call(
        functools.partial(_res_block_kernel, nr, h),
        grid=(h // nr,),
        in_specs=[
            pl.BlockSpec((4, w2, lanes),
                         lambda i: (jnp.maximum(nr // 4 * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, w2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, w2, lanes),
                         lambda i: (jnp.minimum(nr // 4 * (i + 1),
                                                h // 4 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 9 * lanes, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr, w2, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w2, lanes), jnp.int8),
    )(xs, xs, xs, W, mc, rr)
    return out[None]


# ----------------------------------------------------------------------
# standalone 3x3 stride-2 pad-1 maxpool on non-negative int8 codes
# ----------------------------------------------------------------------

_MP_R = 4  # output rows per grid step


def _maxpool_kernel(ch, x_prev_ref, x_a_ref, x_b_ref, out_ref):
    # refs hold the width-paired view (wo, 2ch): lane block [0:ch] = even
    # pixels, [ch:2ch] = odd.  Compute in bf16 (exact for codes in
    # [0,127]): this Mosaic build rejects elementwise max / lane slices
    # directly on s8 vectors.
    wo = out_ref.shape[1]
    first = pl.program_id(0) == 0
    for r in range(_MP_R):
        # window rows 2r-1, 2r, 2r+1 relative to this block's first output
        # row; sources are python-static rows of the three shifted views
        g = 2 * r - 1
        rows = []
        for dy in range(3):
            k = g + dy
            if k < 0:
                # top halo row: x_prev's index_map clamps 2i-1 at 0, so
                # its last row is input row -1 for every block but the
                # first; mask the first block to the pad identity (0 —
                # codes are post-ReLU, >= 0)
                row = x_prev_ref[_MP_R + k].astype(jnp.bfloat16)
                row = jnp.where(first, jnp.zeros_like(row), row)
            elif k < _MP_R:
                row = x_a_ref[k].astype(jnp.bfloat16)
            else:
                row = x_b_ref[k - _MP_R].astype(jnp.bfloat16)
            rows.append(row)
        m = jnp.maximum(jnp.maximum(rows[0], rows[1]), rows[2])  # (wo,2ch)
        pairmax = jnp.maximum(m[:, :ch], m[:, ch:])
        # x[2w'-1] = previous pair's odd pixel; w'=0 gets the pad identity
        # via a zero-row sublane concat (pltpu.roll does not lower here).
        # Concat FULL-WIDTH, lane-slice after: Mosaic rejects concats of
        # offset-lane-sliced operands but accepts slicing the result.
        shifted = jnp.concatenate(
            [jnp.zeros((1, 2 * ch), jnp.bfloat16), m[:wo - 1, :]], axis=0)
        out_ref[r] = jnp.maximum(pairmax, shifted[:, ch:]).astype(jnp.int8)


def maxpool2d_3x3s2_i8(x):
    """3x3 stride-2 pad-1 maxpool over NON-NEGATIVE int8 codes (the
    post-ReLU requantized activations of the int8-through graph), NHWC,
    batch 1 — the standalone Pallas alternative to XLA's s8 reduce-window.

    NOTE: in the serving graph the pool is instead FUSED into the stem
    (``s2d_stem_pool_i8``) — standalone, the width-pairing reshape of the
    input costs an XLA relayout (~0.2 ms at R18 size) that puts this
    kernel at parity with the reduce-window rather than ahead; kept as
    the A/B arm and for geometries the fused kernel rejects.

    Layout: the width-paired (hi, wo, 2ch) view is a free bitcast of a
    row-major NHWC tensor, the stride-2 selection a lane slice, and the
    w-1 neighbor a zero-row sublane concat — no roll, no strided access
    (both unsupported on this Mosaic build).  Edge semantics: identity 0
    == the reference's -inf pad because every code is post-ReLU >= 0; the
    top halo row of each block comes from a BlockSpec view shifted by -1
    block whose index clamps at 0 — masked to the pad on the first block
    only.
    """
    b, hi, wi, ch = x.shape
    assert b == 1 and hi % (2 * _MP_R) == 0 and wi % 2 == 0, x.shape
    ho, wo = hi // 2, wi // 2

    xv = x[0].reshape(hi, wo, 2 * ch)
    out = pl.pallas_call(
        functools.partial(_maxpool_kernel, ch),
        grid=(ho // _MP_R,),
        in_specs=[
            pl.BlockSpec((_MP_R, wo, 2 * ch),
                         lambda i: (jnp.maximum(2 * i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MP_R, wo, 2 * ch), lambda i: (2 * i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MP_R, wo, 2 * ch),
                         lambda i: (2 * i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_MP_R, wo, ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ho, wo, ch), jnp.int8),
    )(xv, xv, xv)
    return out[None]
