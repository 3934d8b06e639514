"""Segmentation losses — jit-compatible, static-shape rebuilds of the
reference's ``furnace/seg_opr/loss_opr.py``.

The OHEM loss replaces torch's data-dependent sort/boolean-mask flow
(reference loss_opr.py:68-97) with a static-shape formulation: a full sort
gives the k-th smallest GT-probability, the dynamic ``min_kept > num_valid``
branch becomes a ``jnp.where`` on the kept mask, and "dropped" pixels are
excluded by masking rather than by writing ignore_label and re-running CE.
Everything compiles to one fused XLA program; nothing leaves the device.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# Cityscapes 19-class weights used by ProbOhemCrossEntropy2d(use_weight=True)
# (reference loss_opr.py:57-60).
CITYSCAPES_CLASS_WEIGHTS = np.array(
    [
        1.4297, 1.4805, 1.4363, 3.365, 2.6635, 1.4311, 2.1943, 1.4817,
        1.4513, 2.1984, 1.5295, 1.6892, 3.2224, 1.4727, 7.5978, 9.4117,
        15.2588, 5.6818, 2.2067,
    ],
    dtype=np.float32,
)


def one_hot(labels: jnp.ndarray, num_classes: int, dtype=jnp.float32):
    """(B,H,W) int labels -> (B,H,W,C) one-hot (reference seg_oprs.py:14-21,
    NHWC instead of NCHW)."""
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def _select_class(values: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """values[..., labels[...]] per row WITHOUT a gather.

    XLA lowers a (N, C) row-gather to a kCustom dynamic-gather that runs at
    ~30 ms for N=2M on v5e; the one-hot select/reduce fuses into one kLoop
    pass over values (~0.5 ms).  Bit-identical result (sum over a single
    nonzero term).
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, values.shape, values.ndim - 1)
    return jnp.sum(
        jnp.where(idx == labels[..., None], values, 0.0), axis=-1
    )


def _lookup_table(table: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """table[labels] per element without a gather (same rationale)."""
    table = jnp.asarray(table)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, labels.shape + table.shape, labels.ndim
    )
    return jnp.sum(
        jnp.where(idx == labels[..., None], table, 0.0), axis=-1
    )


def cross_entropy_with_ignore(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int,
    class_weights: Optional[jnp.ndarray] = None,
):
    """Mean softmax cross entropy over non-ignored pixels.

    Matches ``torch.nn.CrossEntropyLoss(reduction='mean', ignore_index=...)``
    — including the weighted case, where the mean is over the summed weights
    of the valid pixels.  ``scores`` is NHWC (B,H,W,C); the reference applies
    this both to raw logits (FCN/DFN) and to log-softmax outputs
    (PSPNet/PSANet quirk, reference model/pspnet/*/network.py:50-55) — either
    works because we re-apply log_softmax here exactly like torch does.
    """
    scores = scores.astype(jnp.float32)
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -_select_class(logp, safe_labels)
    if class_weights is not None:
        w = _lookup_table(class_weights, safe_labels)
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    denom = jnp.sum(w)
    return jnp.sum(nll * w) / jnp.maximum(denom, 1e-12)


def _kth_smallest_histogram(values: jnp.ndarray, k: int, bins: int = 2048):
    """Approximate k-th smallest of values in [0, 1] via a two-level
    histogram (each level one bincount pass).  Returns an upper bound within
    1/bins^2 of the true k-th value — OHEM selection then keeps at least k
    pixels.

    Note (v5e measurement): XLA lowers bincount to scatter-adds, which lose
    to the O(n log n) sort on TPU (302 vs 199 ms/step on BiSeNet-R18 @
    1024^2) — so the exact sort stays the default; this path exists for
    backends/sizes where histograms win."""
    v = jnp.clip(values, 0.0, 1.0)
    idx1 = jnp.minimum((v * bins).astype(jnp.int32), bins - 1)
    hist1 = jnp.bincount(idx1, length=bins)
    cum1 = jnp.cumsum(hist1)
    b1 = jnp.searchsorted(cum1, k, side="left")  # first bin with cum >= k
    lo = b1.astype(jnp.float32) / bins
    width = 1.0 / bins
    k2 = k - jnp.where(b1 > 0, cum1[jnp.maximum(b1 - 1, 0)], 0)
    in_bin = (idx1 == b1)
    frac = jnp.clip((v - lo) / width, 0.0, 1.0 - 1e-7)
    idx2 = jnp.where(in_bin, (frac * bins).astype(jnp.int32), bins)
    hist2 = jnp.bincount(idx2, length=bins + 1)[:bins]
    cum2 = jnp.cumsum(hist2)
    b2 = jnp.searchsorted(cum2, k2, side="left")
    return lo + (b2.astype(jnp.float32) + 1.0) * (width / bins)


def _kth_smallest_radix(values: jnp.ndarray, k: int) -> jnp.ndarray:
    """EXACT k-th smallest of non-negative f32 values without a sort.

    Non-negative IEEE floats order like their bit patterns, so 8 rounds of
    4-bit radix selection find the k-th value: each round counts the 16
    digit buckets among still-matching elements (one fused compare+reduce
    pass over the data — no scatter, no sort) and descends into the bucket
    containing the k-th element.  8 passes ~= 1 ms for 2M values on v5e vs
    3.3 ms for the O(n log n) sort."""
    u = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.int32)
    mask = jnp.ones(u.shape, jnp.bool_)
    ans = jnp.int32(0)
    k_rem = jnp.int32(k)
    digits16 = jnp.arange(16, dtype=jnp.int32)
    for r in range(8):
        shift = 28 - 4 * r
        dig = (u >> shift) & 15
        cnt = jnp.sum(
            (mask[:, None] & (dig[:, None] == digits16[None, :])).astype(
                jnp.int32
            ),
            axis=0,
        )
        cum = jnp.cumsum(cnt)
        j = jnp.argmax(cum >= k_rem).astype(jnp.int32)
        below = jnp.where(
            j > 0, cum[jnp.maximum(j - 1, 0)], jnp.int32(0)
        )
        ans = ans | (j << shift)
        k_rem = k_rem - below
        mask = mask & (dig == j)
    return jax.lax.bitcast_convert_type(ans, jnp.float32)


def prob_ohem_cross_entropy(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int,
    thresh: float = 0.7,
    min_kept: int = 256,
    class_weights: Optional[jnp.ndarray] = None,
    approx_threshold: bool = False,
):
    """Online hard example mining CE (reference loss_opr.py:48-97).

    Semantics reproduced exactly:
      * per-pixel probability of the GT class (softmax), invalid pixels set
        to prob 1.0 so they sort last;
      * threshold = max(thresh, k-th smallest prob) with
        k = min(num_pixels, min_kept);
      * keep pixels with prob <= threshold;
      * if min_kept > num_valid the reference skips filtering entirely
        (loss_opr.py:80-81) — expressed here as a where() on the kept mask;
      * mean CE over kept pixels.

    Shapes are static: the sort length is B*H*W regardless of the data.
    """
    scores = scores.astype(jnp.float32)
    b, h, w, c = scores.shape
    n = b * h * w

    # select the GT-class log-prob in NHWC and only flatten the resulting
    # one-value-per-pixel maps (a bitcast): reshaping the (N, C) logits
    # first costs ~9 ms of pad/slice/layout copies per step on v5e
    valid4 = labels != ignore_label
    safe4 = jnp.where(valid4, labels, 0)
    logp4 = jax.nn.log_softmax(scores, axis=-1)
    gt_logp = _select_class(logp4, safe4).reshape(-1)
    return _ohem_tail(gt_logp, valid4.reshape(-1), safe4.reshape(-1), n,
                      thresh, min_kept, class_weights, approx_threshold)


def _ohem_tail(gt_logp, valid, safe_labels, n, thresh, min_kept,
               class_weights, approx_threshold):
    """Threshold selection + kept-pixel mean from per-pixel GT log-probs
    (everything past the softmax in reference loss_opr.py:75-97); shared by
    the plain and the fused-upsample OHEM entry points."""
    num_valid = jnp.sum(valid)

    gt_prob = jnp.exp(gt_logp)
    # invalid pixels get prob 1 (reference masked_fill_, loss_opr.py:83)
    gt_prob = jnp.where(valid, gt_prob, 1.0)

    if min_kept > 0:
        k = min(n, int(min_kept))
        if approx_threshold:
            # two-pass histogram quantile (upper bound on the k-th value)
            kth = _kth_smallest_histogram(gt_prob, k)
        else:
            # exact k-th smallest via radix select (3.3x cheaper than the
            # sort on v5e; bit-identical threshold)
            kth = _kth_smallest_radix(gt_prob, k)
        threshold = jnp.maximum(kth, thresh)
        kept = valid & (gt_prob <= threshold)
        # min_kept > num_valid => no OHEM filtering (keep every valid pixel)
        kept = jnp.where(min_kept > num_valid, valid, kept)
    else:
        # min_kept == 0: the reference never applies the threshold mask
        # (loss_opr.py:85 guard), so every valid pixel contributes.
        kept = valid

    nll = -gt_logp
    if class_weights is not None:
        wgt = _lookup_table(class_weights, safe_labels)
    else:
        wgt = jnp.ones_like(nll)
    wgt = wgt * kept.astype(jnp.float32)
    denom = jnp.sum(wgt)
    return jnp.sum(nll * wgt) / jnp.maximum(denom, 1e-12)


# Chip-gated switch for the fused upsample+loss training path (raw train
# heads; the loss owns the x-scale upsample, row-tiled):
#   None  -> per-family measured defaults (FUSED_UPSAMPLE_LOSS_MODELS,
#            set from the chip A/B table in docs/DESIGN.md)
#   True  -> force ON for every upsample-then-loss experiment (A/B arm)
#   False -> force OFF (A/B arm)
# train_speed --fused-loss / --no-fused-loss set the forced arms.
FUSED_UPSAMPLE_LOSS = None

# Model-name prefixes where the fused path measured FASTER on v5e.
# Round-4 chip A/B (docs/DESIGN.md "Fused upsample+loss chip A/B"):
# the fused path LOST or washed on every family (XLA already fuses the
# materialized upsample->log_softmax->select chain; the row-tiled
# lax.map adds loop overhead + backward recompute), so the default set
# is EMPTY and the fused path is reachable only via the forced A/B arms.
FUSED_UPSAMPLE_LOSS_MODELS: tuple = ()


def _upsampled_gt_logp(scores, labels, scale, ignore_label, row_tile,
                       pre_log_softmax=False):
    """Per-pixel GT-class log-prob of the x``scale`` align-corners-upsampled
    logits, computed row-tile by row-tile so the full-resolution score
    tensor never materializes.

    Rows upsample first (small (B, OH, w, C) intermediate), ``lax.map``
    walks row chunks of the output so each (row_tile, W, C) score tile
    exists only transiently, and ``jax.checkpoint`` recomputes the tile in
    the backward pass — the serving-side trick of
    ops/resize.tiled_upsample_argmax applied to the training loss.

    ``pre_log_softmax`` reproduces the PSPNet/PSANet train graph
    (upsample -> log_softmax in the network, then CrossEntropy applies
    softmax AGAIN — reference model/pspnet/*/network.py:50-55 quirk): the
    extra log_softmax runs inside the tile, before the loss's own one.

    Returns the flattened (B*OH*OW,) GT log-probs (invalid pixels read
    class 0 — callers mask).
    """
    from .resize import _interp_matrix_np

    scores = scores.astype(jnp.float32)
    b, h, w, c = scores.shape
    oh, ow = h * scale, w * scale
    assert labels.shape[1:] == (oh, ow), (labels.shape, scores.shape, scale)
    rt = min(row_tile, oh)
    while oh % rt:
        rt -= 1
    prec = jax.lax.Precision.HIGHEST
    wh = jnp.asarray(_interp_matrix_np(h, oh), jnp.float32)
    ww = jnp.asarray(_interp_matrix_np(w, ow), jnp.float32)
    # H first, then W — the exact op order of resize_bilinear_align_corners
    z = jnp.einsum("ph,bhwc->bpwc", wh, scores, precision=prec)
    zc = z.reshape(b, oh // rt, rt, w, c).transpose(1, 0, 2, 3, 4)
    lab = labels.reshape(b, oh // rt, rt, ow).transpose(1, 0, 2, 3)

    @jax.checkpoint
    def chunk(args):
        zt, lt = args  # (b, rt, w, c), (b, rt, ow)
        s = jnp.einsum("qw,bhwc->bhqc", ww, zt, precision=prec)
        if pre_log_softmax:
            s = jax.nn.log_softmax(s, axis=-1)
        safe = jnp.where(lt != ignore_label, lt, 0)
        return _select_class(jax.nn.log_softmax(s, axis=-1), safe)

    gt_logp = jax.lax.map(chunk, (zc, lab))  # (oh//rt, b, rt, ow)
    return gt_logp.transpose(1, 0, 2, 3).reshape(-1)


def cross_entropy_with_ignore_upsampled(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    scale: int,
    ignore_label: int,
    class_weights: Optional[jnp.ndarray] = None,
    pre_log_softmax: bool = False,
    row_tile: int = 128,
):
    """``cross_entropy_with_ignore(upsample_by_scale(scores, scale, f32))``
    without materializing the full-resolution score tensor (equivalent up
    to fp associativity of the valid-pixel sums).

    This is the PSPNet/PSANet (x8 heads, ``pre_log_softmax=True`` for their
    double-softmax quirk), FCN (x32/x16) and DFN smooth-branch (x32..x4)
    train path; see ``_upsampled_gt_logp`` for the tiling scheme.  At ADE's
    bs2-per-chip 480² with 150 classes the materialized path moves ~550 MB
    of f32 score+log_softmax tensors per head per direction.
    """
    if scale == 1:
        if pre_log_softmax:
            scores = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
        return cross_entropy_with_ignore(scores, labels, ignore_label,
                                         class_weights=class_weights)
    gt_logp = _upsampled_gt_logp(scores, labels, scale, ignore_label,
                                 row_tile, pre_log_softmax=pre_log_softmax)
    valid4 = labels != ignore_label
    valid = valid4.reshape(-1)
    safe_labels = jnp.where(valid4, labels, 0).reshape(-1)
    nll = -gt_logp
    if class_weights is not None:
        w = _lookup_table(class_weights, safe_labels)
    else:
        w = jnp.ones_like(nll)
    w = w * valid.astype(jnp.float32)
    denom = jnp.sum(w)
    return jnp.sum(nll * w) / jnp.maximum(denom, 1e-12)


def prob_ohem_cross_entropy_upsampled(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    scale: int,
    ignore_label: int,
    thresh: float = 0.7,
    min_kept: int = 256,
    class_weights: Optional[jnp.ndarray] = None,
    approx_threshold: bool = False,
    row_tile: int = 128,
):
    """OHEM CE of the x``scale`` align-corners-upsampled logits WITHOUT
    materializing the full-resolution score tensor.

    Equivalent (up to fp associativity of the kept-pixel sums) to
    ``prob_ohem_cross_entropy(upsample_by_scale(scores, scale, f32), ...)``
    — the BiSeNet train-head path (models/bisenet.py heads; reference
    network.py:163-166 upsample + loss_opr.py OHEM).  At bs2@1024² the
    materialized path moves ~160 MB of f32 scores per head per direction;
    see ``_upsampled_gt_logp`` for the row-tiling scheme.
    """
    if scale == 1:
        return prob_ohem_cross_entropy(
            scores, labels, ignore_label, thresh=thresh, min_kept=min_kept,
            class_weights=class_weights, approx_threshold=approx_threshold,
        )
    b = scores.shape[0]
    oh, ow = labels.shape[1:]
    gt_logp = _upsampled_gt_logp(scores, labels, scale, ignore_label,
                                 row_tile)
    valid4 = labels != ignore_label
    valid = valid4.reshape(-1)
    safe_labels = jnp.where(valid4, labels, 0).reshape(-1)
    return _ohem_tail(gt_logp, valid, safe_labels, b * oh * ow,
                      thresh, min_kept, class_weights, approx_threshold)


def sigmoid_focal_loss_border(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    ignore_label: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
):
    """DFN border-branch focal loss (reference loss_opr.py:14-45).

    The reference formula (including its quirk of feeding *sigmoid outputs*
    where logits are expected — see the in-code TODO at loss_opr.py:32) is
    reproduced bit-for-bit, since trained checkpoints depend on it:

      s = sigmoid(pred); with max_val = clamp(-s, min=0) == 0:
      pos = (1-s)^gamma * (s - s*t)
      neg = s^gamma * log(1 + exp(-s))
      loss = mean_b,n( -(alpha*pos + (1-alpha)*neg) * valid )

    ``pred`` is (B,H,W,1) border logits, ``target`` (B,H,W) in {0,1,ignore}.
    """
    pred = pred.astype(jnp.float32).reshape(pred.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    mask = (target != ignore_label).astype(jnp.float32)
    t = mask * target.astype(jnp.float32)

    s = jax.nn.sigmoid(pred)
    pos_part = (1.0 - s) ** gamma * (s - s * t)
    neg_part = s**gamma * jnp.log1p(jnp.exp(-s))
    loss = -(alpha * pos_part + (1.0 - alpha) * neg_part) * mask
    return jnp.mean(loss)
