"""Int8-THROUGH serving for classic-stem BiSeNet (R18 and X39, incl. the
.speed variants) — the latency path where activations stay int8 across
layers.

Round-2's generic per-conv PTQ (deploy/quantize.py) measured SLOWER than
bf16 on v5e (8.1 vs 5.2 ms): every conv did float -> quantize -> int8 conv
-> dequantize -> float, so the elementwise quant/dequant passes and doubled
HBM traffic ate the 2x int8 MXU rate.  This module fixes the architecture
of the quantization, not the kernels:

  * the network INPUT is the raw uint8 image (s2d layout, -128 -> int8):
    the /255-mean-std normalization folds into the stem conv weights and
    the +128 shift into its bias — zero input-quantization error, half the
    H2D bytes, and the stem conv (1.2 ms of the 4.74 ms bf16 graph) runs
    at the int8 MXU rate;
  * every body conv consumes int8 and PRODUCES int8: the eval-mode BN
    affine, the ReLU, and the requantization to the consumer's scale all
    fold into one per-channel multiply-add epilogue on the conv's int32
    accumulator (XLA fuses it into the conv) — activations cross HBM as
    int8, never as float;
  * BasicBlock residuals are handled inside the conv2 epilogue: the int8
    shortcut dequantizes with a scalar multiply into the f32 accumulator
    units, the sum ReLUs and requantizes — still one fused epilogue;
  * maxpool runs directly on int8 (max commutes with the monotone
    quantization — bit-exact);
  * the decoder (global context, ARMs, refines, FFM, head — ~20% of the
    FLOPs, at /8 resolution and below) stays bf16 and reuses the standard
    flax module via BiSeNet's ``context_blocks``/``spatial_out`` passthrough,
    so its numerics are identical to the float graph.

Weights: per-output-channel symmetric int8 (scale = absmax/127).
Activations: per-edge symmetric scales from a float-graph calibration run
(deploy/quantize.calibrate — conv-input absmax keyed by module path).

Reference anchor: the reference has no quantization story (this is a
beyond-parity serving capability); the north-star protocol it accelerates
is model/bisenet/cityscapes.bisenet.R18.speed/eval.py:90-106.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused_stem import _stem_weights, fold_bn_affine


# ----------------------------------------------------------------------
# host-side precompute
# ----------------------------------------------------------------------

def _quant_w(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 quantization of an HWIO kernel."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return wq, s


def _scale(stats: Dict[str, float], path: str) -> float:
    """Per-tensor activation scale; accepts scalar or per-channel stats."""
    if path not in stats:
        raise KeyError(
            f"calibration stats missing conv input '{path}' — calibrate on "
            f"the PLAIN model.apply graph (available: {sorted(stats)[:8]}...)"
        )
    return max(float(np.max(stats[path])), 1e-8) / 127.0


def _scale_vec(stats: Dict[str, np.ndarray], path: str) -> np.ndarray:
    """Per-CHANNEL activation scales (separable-conv mid tensors) —
    requires calibrate_channelwise stats."""
    if path not in stats:
        raise KeyError(f"calibration stats missing conv input '{path}'")
    v = np.asarray(stats[path], np.float32)
    if v.ndim == 0:
        raise ValueError(
            f"'{path}' needs PER-CHANNEL calibration stats (the separable "
            "mid scales fold into the pointwise kernel) — use "
            "calibrate_channelwise, not deploy.quantize.calibrate"
        )
    return np.maximum(v, 1e-8) / 127.0


def calibrate_channelwise(model, variables, batches, apply_kwargs=None
                          ) -> Dict[str, np.ndarray]:
    """Like deploy.quantize.calibrate but records the PER-CHANNEL absmax of
    every nn.Conv input — per-channel mid scales fold into the next
    (pointwise) kernel's input axis for free, which per-tensor scales
    can't.

    The whole recording forward is jitted (the interceptor contributes
    traced absmax OUTPUTS, not side effects): one compiled dispatch per
    calibration batch instead of one per op — eager op-by-op calibration
    through the dev tunnel's ~35 ms dispatch took minutes.  The weights
    enter the jit as an ARGUMENT, not a closure: constant-embedded
    weights made XLA constant-fold through the whole capture graph
    (minutes of compile per calibration geometry, uncacheable across
    freshly-initialized weight values); as parameters the compile is
    seconds and the persistent cache key depends only on shapes."""
    from flax import linen as nn

    apply_kwargs = dict(apply_kwargs or {})

    @jax.jit
    def run(variables, x):
        rec = {}

        def interceptor(next_fun, args, kwargs, context):
            if (isinstance(context.module, nn.Conv)
                    and context.method_name == "__call__"):
                path = "/".join(context.module.path)
                a = jnp.max(jnp.abs(args[0].astype(jnp.float32)),
                            axis=tuple(range(args[0].ndim - 1)))
                rec[path] = jnp.maximum(rec[path], a) if path in rec else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, train=False, **apply_kwargs)
        return rec

    stats: Dict[str, np.ndarray] = {}
    for x in batches:
        rec = jax.device_get(run(variables, jnp.asarray(x)))
        for path, a in rec.items():
            prev = stats.get(path)
            stats[path] = a if prev is None else np.maximum(prev, a)
    return stats


def _cbr_pack(params, bstats, eps, s_in, s_out):
    """ConvBnRelu -> (wq int8, M, C) with q_out = clip(round(max(y32*M+C,0))).
    s_out=None emits float (no requant): M,C are in real units."""
    wq, s_w = _quant_w(params["conv"]["kernel"])
    a, b = fold_bn_affine(params["bn"], bstats["bn"], eps)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    m = s_in * s_w * a
    c = b.copy()
    if s_out is not None:
        m, c = m / s_out, c / s_out
    return {"w": jnp.asarray(wq), "m": jnp.asarray(m, jnp.float32),
            "c": jnp.asarray(c, jnp.float32)}


def _convbn_pack(kernel, bn_p, bn_s, eps, s_in, s_out):
    """plain conv + separate bn (resnet blocks) -> (wq, M, C)."""
    wq, s_w = _quant_w(kernel)
    a, b = fold_bn_affine(bn_p, bn_s, eps)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    m = s_in * s_w * a
    c = b.copy()
    if s_out is not None:
        m, c = m / s_out, c / s_out
    return {"w": jnp.asarray(wq), "m": jnp.asarray(m, jnp.float32),
            "c": jnp.asarray(c, jnp.float32)}


def _stem_pack(variables, eps, image_mean, image_std, s_sp_out, s_bb_out):
    """Both 7x7/2 stems as ONE int8 4x4 s2d conv over the RAW uint8 image
    (shifted to int8 by -128), with the /255-mean-std normalization folded
    into the weights and the 128-shift into the bias.

    conv(w, (u/255 - mean)/std) == conv(w / (255*std), u) + shift
    with u = i8 + 128 -> conv(w', i8) + 128*sum(w') + shift, all per
    output channel.  Everything lands in the epilogue bias."""
    k_sp, a_sp, b_sp, k_bb, a_bb, b_bb = _stem_weights(variables, eps)
    k = np.concatenate(
        [np.asarray(k_sp, np.float32), np.asarray(k_bb, np.float32)], axis=-1
    )  # (7,7,3,128)
    mean = np.asarray(image_mean, np.float32)
    std = np.asarray(image_std, np.float32)
    # fold normalization per INPUT channel: conv(k, (u/255-mean)/std)
    #   == conv(k/(255*std), i8) + sum_k k * (128/255 - mean)/std
    kf = k / (255.0 * std)[None, None, :, None]
    cshift = (128.0 / 255.0 - mean) / std
    shift = np.einsum("hwio,i->o", k, cshift)
    # s2d kernel transform (deploy/fused_stem._fused_stem_s2d): pad 7x7 to
    # 8x8 top/left, regroup 2x2 space into channels -> (4,4,12,128)
    kp = np.pad(kf, ((1, 0), (1, 0), (0, 0), (0, 0)))
    c = kp.shape[2]
    cout = kp.shape[3]
    wk = kp.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
    wk = wk.reshape(4, 4, 4 * c, cout)
    wq, s_w = _quant_w(wk)

    a = np.concatenate([np.asarray(a_sp, np.float32),
                        np.asarray(a_bb, np.float32)])
    b = np.concatenate([np.asarray(b_sp, np.float32),
                        np.asarray(b_bb, np.float32)])
    n_sp = k_sp.shape[-1]
    s_out = np.concatenate(
        [np.full(n_sp, s_sp_out, np.float32),
         np.full(cout - n_sp, s_bb_out, np.float32)]
    )
    # post-BN: z = (conv_f32 + shift) * a + b, with conv_f32 = y32 * s_w
    # (the int8 input is integer-exact, so only weight quantization rounds);
    # q = clip(round(max(y32 * (s_w*a) + (shift*a + b), 0) / s_out))
    m = s_w * a / s_out
    cc = (shift * a + b) / s_out
    return {"w": jnp.asarray(wq), "m": jnp.asarray(m, jnp.float32),
            "c": jnp.asarray(cc, jnp.float32), "n_sp": n_sp,
            # bf16-stem variant (chip finding: the 12-channel int8 stem
            # conv runs SLOWER than bf16 — 1.76 vs 1.2 ms — so the default
            # serving graph keeps the stem conv bf16 over the same uint8
            # input and folds the int8 quantization into its epilogue)
            "wf": jnp.asarray(wk, jnp.bfloat16),
            "mf": jnp.asarray(a / s_out, jnp.float32),
            "cf": jnp.asarray((shift * a + b) / s_out, jnp.float32)}


def prepare_s2d_input_u8(img_u8, pads=((2, 1), (2, 1)),
                         image_mean=(0.485, 0.456, 0.406)):
    """Serving input prep for the int8-through graph: (1, H, W, 3) uint8 ->
    pre-padded (1, H/2+ph, W/2+pw, 12) int8 (value-128) in the s2d channel
    order.  The pad constant per channel is the int8 value closest to
    normalized zero (round(255*mean)-128), matching the float graph's
    zero-padding of the normalized image to <0.5/255 absolute error on the
    border taps only."""
    x = np.asarray(img_u8)
    assert x.dtype == np.uint8, x.dtype
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    xi = xs.astype(np.int16) - 128
    padv = np.round(np.asarray(image_mean) * 255.0) - 128
    padv = np.tile(padv, 4).astype(np.int16)  # s2d channel order (a,b,c)x4
    (pt, pb), (pl, pr) = pads
    out = np.empty((b, h // 2 + pt + pb, w // 2 + pl + pr, 4 * c), np.int16)
    out[...] = padv
    out[:, pt:pt + h // 2, pl:pl + w // 2, :] = xi
    return jnp.asarray(np.clip(out, -128, 127).astype(np.int8))


def _quant_w_depthwise(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(k, k, 1, C) depthwise kernel -> per-channel int8."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return wq, s


def _sep_pack(blk_p, blk_s, eps, s_in, s_mid_vec, s_out):
    """Xception separable (NO depthwise BN, xception.py:10-26):
    int8 depthwise -> per-channel requant to the mid scales -> int8
    pointwise (+BN) epilogue.  The per-channel mid scales fold into the
    pointwise kernel's input axis before quantization, so they cost nothing
    at runtime.  ReLU placement is static in the apply fn (sep1/sep2 fold
    it into the epilogue; sep3/proj defer it past the residual add)."""
    kdw = blk_p["depthwise"]["kernel"]
    wq_dw, s_dw = _quant_w_depthwise(kdw)
    m_dw = (s_in * s_dw / s_mid_vec).astype(np.float32)

    kpw = np.asarray(blk_p["pointwise"]["conv"]["kernel"], np.float32)
    kf = kpw * s_mid_vec[None, None, :, None]
    wq_pw, s_pw = _quant_w(kf)
    a, b = fold_bn_affine(blk_p["pointwise"]["bn"],
                          blk_s["pointwise"]["bn"], eps)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    m = s_pw * a
    c = b.copy()
    if s_out is not None:
        m, c = m / s_out, c / s_out
    return {"dw": jnp.asarray(wq_dw),
            "dm": jnp.asarray(m_dw, jnp.float32),
            "w": jnp.asarray(wq_pw),
            "m": jnp.asarray(m, jnp.float32),
            "c": jnp.asarray(c, jnp.float32)}


def _fold_1x1(params, bstats, eps):
    """Float-folded 1x1 conv+BN for the tiny (b,1,1,C) gate tensors: the
    global-context projection and the ARM channel attentions run in f32 —
    their inputs are per-image channel vectors, so int8 buys nothing."""
    k = np.asarray(params["conv"]["kernel"], np.float32)
    a, b = fold_bn_affine(params["bn"], bstats["bn"], eps)
    return {"w": jnp.asarray(k.reshape(k.shape[2], k.shape[3])),
            "a": jnp.asarray(np.asarray(a, np.float32)),
            "b": jnp.asarray(np.asarray(b, np.float32))}


def _dec_pack(variables, stats, eps, s_c16_body, s_c32):
    """Int8 decoder package for the BiSeNet ARM/refine/FFM/head graph
    (models/bisenet.py:135-188, reference network.py:60-85).

    All SPATIAL convs (arm 3x3s, refine0/1, ffm 1x1, head 3x3) run int8
    with the eval-BN affine folded into the epilogue; the per-image gate
    math (global context, ARM attentions, FFM SE — all on (b,1,1,C)
    vectors) and the bilinear top-down resizes stay f32, with the
    requantization to the next conv's calibrated scale fused into those
    elementwise chains by XLA.  The class-logit 1x1 stays float — the
    usual PTQ accuracy rule (deploy/quantize.DEFAULT_SKIP).

    ``s_c16_body``/``s_c32`` are the scales the BODY emits c16/c32 at
    (the arm convs must interpret the codes with the producer's scale)."""
    p = variables["params"]
    s = variables["batch_stats"]
    s_r0 = _scale(stats, "refine0/conv")
    s_r1 = _scale(stats, "refine1/conv")
    s_ffm = _scale(stats, "ffm/conv_1x1/conv")
    s_h = _scale(stats, "head2/conv_3x3/conv")
    head_1x1 = p["head2"]["conv_1x1"]
    k_out = np.asarray(head_1x1["kernel"], np.float32)
    return {
        "gc": _fold_1x1(p["global_context"], s["global_context"], eps),
        "arm0": _cbr_pack(p["arm0"]["conv_3x3"], s["arm0"]["conv_3x3"],
                          eps, s_c32, None),
        "att0": _fold_1x1(p["arm0"]["channel_attention"],
                          s["arm0"]["channel_attention"], eps),
        "refine0": _cbr_pack(p["refine0"], s["refine0"], eps, s_r0, None),
        "arm1": _cbr_pack(p["arm1"]["conv_3x3"], s["arm1"]["conv_3x3"],
                          eps, s_c16_body, None),
        "att1": _fold_1x1(p["arm1"]["channel_attention"],
                          s["arm1"]["channel_attention"], eps),
        "refine1": _cbr_pack(p["refine1"], s["refine1"], eps, s_r1, s_ffm),
        "ffm": _cbr_pack(p["ffm"]["conv_1x1"], s["ffm"]["conv_1x1"],
                         eps, s_ffm, None),
        # FFM SE convs have no BN and no bias (ops/blocks.py:385-406)
        "ca1": jnp.asarray(np.asarray(
            p["ffm"]["ca1"]["conv"]["kernel"], np.float32
        ).reshape(-1, p["ffm"]["ca1"]["conv"]["kernel"].shape[-1])),
        "ca2": jnp.asarray(np.asarray(
            p["ffm"]["ca2"]["conv"]["kernel"], np.float32
        ).reshape(-1, p["ffm"]["ca2"]["conv"]["kernel"].shape[-1])),
        "head": _cbr_pack(p["head2"]["conv_3x3"], s["head2"]["conv_3x3"],
                          eps, s_h, None),
        "out_w": jnp.asarray(k_out.reshape(k_out.shape[2], k_out.shape[3])),
        "out_b": jnp.asarray(np.asarray(head_1x1["bias"], np.float32)),
        "s_c32": jnp.float32(s_c32),
        "inv_r0": jnp.float32(1.0 / s_r0),
        "inv_r1": jnp.float32(1.0 / s_r1),
        "inv_h": jnp.float32(1.0 / s_h),
    }


# ----------------------------------------------------------------------
# package builder
# ----------------------------------------------------------------------

def build_int8_package(variables, stats: Dict[str, float], *,
                       eps: float = 1e-5,
                       image_mean=(0.485, 0.456, 0.406),
                       image_std=(0.229, 0.224, 0.225),
                       decoder: str = "bf16"):
    """Precompute the int8-through parameter package for a classic-stem
    BiSeNet-R18: quantized weights + fused epilogue multipliers/biases for
    the stems, spatial path, and the ResNet-18 body.  ``stats`` is the
    conv-input absmax table from deploy.quantize.calibrate on the plain
    float graph.

    decoder="bf16" (default) hands the stage features to the flax decoder
    in float; decoder="int8" also packs the ARM/refine/FFM/head decoder
    (``_dec_pack``) so the whole serving graph is int8-through — the body
    then emits c32/c16 as int8 and the spatial path emits int8 at the FFM
    concat scale."""
    if decoder not in ("bf16", "int8"):
        raise ValueError(f"decoder must be 'bf16' or 'int8', got {decoder!r}")
    p = variables["params"]
    s = variables["batch_stats"]
    bb_p = p.get("backbone", {})
    blk0 = bb_p.get("layer1_0", {})
    if ("conv1" in blk0 and "bn1" in blk0 and "conv3" not in blk0
            and "layer1_2" not in bb_p):
        kind = "r18"
    elif "sep1" in blk0:
        kind = "x39"
    else:
        raise ValueError(
            "int8-through serving supports the BasicBlock ResNet-18 and "
            "Xception39 BiSeNet backbones (R101's Bottleneck body is not "
            "packed); this param tree matches neither"
        )

    def st(path):
        return _scale(stats, path)

    pkg = {"kind": kind}
    # activation scales at the stem outputs = the first consumers' inputs
    s_sp = st("spatial_path/conv_3x3_1/conv")
    bb_in_key = ("backbone/layer1_0/conv1" if kind == "r18"
                 else "backbone/layer1_0/sep1/depthwise")
    s_bb = st(bb_in_key)
    pkg["stem"] = _stem_pack(variables, eps, image_mean, image_std,
                             s_sp, s_bb)

    # spatial path: 3x3/2, 3x3/2, 1x1 (last emits bf16 for the flax FFM,
    # or int8 at the FFM concat scale when the decoder is int8 too)
    int8_dec = decoder == "int8"
    s_sp_out = st("ffm/conv_1x1/conv") if int8_dec else None
    sp = p["spatial_path"]
    sps = s["spatial_path"]
    s_mid1 = st("spatial_path/conv_3x3_2/conv")
    s_mid2 = st("spatial_path/conv_1x1/conv")
    pkg["sp1"] = _cbr_pack(sp["conv_3x3_1"], sps["conv_3x3_1"], eps,
                           s_sp, s_mid1)
    pkg["sp2"] = _cbr_pack(sp["conv_3x3_2"], sps["conv_3x3_2"], eps,
                           s_mid1, s_mid2)
    pkg["sp3"] = _cbr_pack(sp["conv_1x1"], sps["conv_1x1"], eps,
                           s_mid2, s_sp_out)
    s_c32 = st("arm0/conv_3x3/conv") if int8_dec else None

    bb = p["backbone"]
    bbs = s["backbone"]
    if kind == "r18":
        # resnet-18 body: 4 stages x 2 BasicBlocks
        layers = [(1, 2), (2, 2), (3, 2), (4, 2)]
        s_block_in = s_bb  # post-maxpool == stem scale (max is monotone)
        for li, nblocks in layers:
            for bi in range(nblocks):
                name = f"layer{li}_{bi}"
                blk = bb[name]
                blks = bbs[name]
                stride = 2 if (li > 1 and bi == 0) else 1
                s_mid = st(f"backbone/{name}/conv2")
                # block output scale = next consumer's input absmax; the
                # last block (layer4_1) emits float for the bf16 decoder,
                # int8 at arm0's input scale for the int8 decoder
                if li == 4 and bi == nblocks - 1:
                    s_out = s_c32
                elif bi + 1 < nblocks:
                    s_out = st(f"backbone/layer{li}_{bi + 1}/conv1")
                else:
                    s_out = st(f"backbone/layer{li + 1}_0/conv1")
                e = {
                    "conv1": _convbn_pack(blk["conv1"]["kernel"], blk["bn1"],
                                          blks["bn1"], eps, s_block_in,
                                          s_mid),
                    "conv2": _convbn_pack(blk["conv2"]["kernel"], blk["bn2"],
                                          blks["bn2"], eps, s_mid, s_out),
                    # identity-shortcut dequant ratio, in the conv2
                    # epilogue's output units (real units when s_out None)
                    "res_ratio": jnp.float32(
                        s_block_in / (s_out if s_out is not None else 1.0)
                    ),
                    "stride": stride,
                }
                if "downsample_conv" in blk:
                    e["down"] = _convbn_pack(
                        blk["downsample_conv"]["kernel"],
                        blk["downsample_bn"], blks["downsample_bn"], eps,
                        s_block_in, s_out,
                    )
                pkg[f"l{li}_{bi}"] = e
                if s_out is not None:
                    s_block_in = s_out
        # decoder needs dequantized c16 (arm1 input): layer3 output scale
        pkg["s_c16"] = jnp.float32(st("backbone/layer4_0/conv1"))
        if int8_dec:
            pkg["dec"] = _dec_pack(variables, stats, eps,
                                   st("backbone/layer4_0/conv1"), s_c32)
        return pkg

    # xception-39 body: stages of (4, 8, 4) blocks, 3 separables + optional
    # separable projection each (models/xception.py)
    layers = [(1, 4), (2, 8), (3, 4)]
    s_block_in = s_bb
    for li, nblocks in layers:
        for bi in range(nblocks):
            name = f"layer{li}_{bi}"
            blk = bb[name]
            blks = bbs[name]
            stride = 2 if bi == 0 else 1
            if li == 3 and bi == nblocks - 1:
                s_out = s_c32
            elif bi + 1 < nblocks:
                s_out = st(f"backbone/layer{li}_{bi + 1}/sep1/depthwise")
            else:
                s_out = st(f"backbone/layer{li + 1}_0/sep1/depthwise")
            s1_out = st(f"backbone/{name}/sep2/depthwise")
            s2_out = st(f"backbone/{name}/sep3/depthwise")

            def mid(sub):
                return _scale_vec(
                    stats, f"backbone/{name}/{sub}/pointwise/conv"
                )

            e = {
                "sep1": _sep_pack(blk["sep1"], blks["sep1"], eps,
                                  s_block_in, mid("sep1"), s1_out),
                "sep2": _sep_pack(blk["sep2"], blks["sep2"], eps,
                                  s1_out, mid("sep2"), s2_out),
                "sep3": _sep_pack(blk["sep3"], blks["sep3"], eps,
                                  s2_out, mid("sep3"), s_out),
                "stride": stride,
            }
            if "proj" in blk:
                e["proj"] = _sep_pack(blk["proj"], blks["proj"], eps,
                                      s_block_in, mid("proj"), s_out)
            else:
                e["res_ratio"] = jnp.float32(
                    s_block_in / (s_out if s_out is not None else 1.0)
                )
            pkg[f"l{li}_{bi}"] = e
            if s_out is not None:
                s_block_in = s_out
    # decoder dequant scale for c16 (= layer2 output feeding layer3_0)
    pkg["s_c16"] = jnp.float32(st("backbone/layer3_0/sep1/depthwise"))
    if int8_dec:
        pkg["dec"] = _dec_pack(variables, stats, eps,
                               st("backbone/layer3_0/sep1/depthwise"), s_c32)
    return pkg


# ----------------------------------------------------------------------
# dilated Bottleneck backbones (PSPNet/PSANet/DFN: resnet50/101 v1c os8)
# ----------------------------------------------------------------------

RESNET_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
DILATED = {"strides": (1, 2, 1, 1), "dilations": (1, 1, 2, 4)}


def build_int8_backbone_package(variables, stats, *, depth: int,
                                eps: float = 1e-5,
                                image_mean=(0.485, 0.456, 0.406),
                                image_std=(0.229, 0.224, 0.225),
                                strides=DILATED["strides"],
                                dilations=DILATED["dilations"]):
    """Int8-through package for a v1c deep-stem dilated Bottleneck ResNet
    under ``params['backbone']`` — the shared body of PSPNet/PSANet/DFN.

    Stem: uint8 (value-128) NHWC input, stem_conv1 runs bf16 with the
    normalization folded (same chip finding as the BiSeNet stem: tiny-C
    int8 convs lose), int8 from its epilogue onward (stem_conv2/3 and the
    whole Bottleneck body int8; the /8 dilated stages keep their exact
    strides/dilations).  The final stage emits float for the bf16 head."""
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]
    if "stem_conv1" not in p:
        raise ValueError(
            "build_int8_backbone_package expects a v1c deep-stem resnet "
            "(params['backbone']['stem_conv1'])"
        )
    layers = RESNET_LAYERS[depth]

    def st(path):
        return _scale(stats, path)

    mean = np.asarray(image_mean, np.float32)
    std = np.asarray(image_std, np.float32)
    pkg = {"kind": f"bottleneck{depth}"}

    # --- deep stem ---
    k1 = np.asarray(p["stem_conv1"]["kernel"], np.float32)  # (3,3,3,32)
    kf = k1 / (255.0 * std)[None, None, :, None]
    cshift = (128.0 / 255.0 - mean) / std
    shift = np.einsum("hwio,i->o", k1, cshift)
    a1, b1 = fold_bn_affine(p["stem_bn1"], s["stem_bn1"], eps)
    a1, b1 = np.asarray(a1, np.float32), np.asarray(b1, np.float32)
    s_c2 = st("backbone/stem_conv2")
    pkg["stem1"] = {
        "wf": jnp.asarray(kf, jnp.bfloat16),
        "m": jnp.asarray(a1 / s_c2, jnp.float32),
        "c": jnp.asarray((shift * a1 + b1) / s_c2, jnp.float32),
    }
    s_c3 = st("backbone/stem_conv3")
    pkg["stem2"] = _convbn_pack(p["stem_conv2"]["kernel"], p["stem_bn2"],
                                s["stem_bn2"], eps, s_c2, s_c3)
    s_l1 = st("backbone/layer1_0/conv1")
    pkg["stem3"] = _convbn_pack(p["stem_conv3"]["kernel"], p["bn1"],
                                s["bn1"], eps, s_c3, s_l1)

    # --- bottleneck body ---
    s_block_in = s_l1  # post-maxpool (max is monotone)
    for li in range(4):
        nblocks = layers[li]
        stride = strides[li]
        dilation = dilations[li]
        first_dil = max(dilation // 2, 1) if dilation > 1 else 1
        for bi in range(nblocks):
            name = f"layer{li + 1}_{bi}"
            blk = p[name]
            blks = s[name]
            is_first = bi == 0
            last = li == 3 and bi == nblocks - 1
            s_m1 = st(f"backbone/{name}/conv2")
            s_m2 = st(f"backbone/{name}/conv3")
            if last:
                s_out = None
            elif bi + 1 < nblocks:
                s_out = st(f"backbone/layer{li + 1}_{bi + 1}/conv1")
            else:
                s_out = st(f"backbone/layer{li + 2}_0/conv1")
            e = {
                "conv1": _convbn_pack(blk["conv1"]["kernel"], blk["bn1"],
                                      blks["bn1"], eps, s_block_in, s_m1),
                "conv2": _convbn_pack(blk["conv2"]["kernel"], blk["bn2"],
                                      blks["bn2"], eps, s_m1, s_m2),
                "conv3": _convbn_pack(blk["conv3"]["kernel"], blk["bn3"],
                                      blks["bn3"], eps, s_m2, s_out),
                "res_ratio": jnp.float32(
                    s_block_in / (s_out if s_out is not None else 1.0)
                ),
                "stride": stride if is_first else 1,
                "dilation": first_dil if is_first else dilation,
            }
            if "downsample_conv" in blk:
                e["down"] = _convbn_pack(
                    blk["downsample_conv"]["kernel"], blk["downsample_bn"],
                    blks["downsample_bn"], eps, s_block_in, s_out,
                )
            pkg[f"l{li + 1}_{bi}"] = e
            if s_out is not None:
                s_block_in = s_out
    pkg["s_c16"] = jnp.float32(st("backbone/layer4_0/conv1"))
    # earlier-stage dequant scales (DFN's decoder reads all stage values)
    pkg["s_c4"] = jnp.float32(st("backbone/layer2_0/conv1"))
    pkg["s_c8"] = jnp.float32(st("backbone/layer3_0/conv1"))
    pkg["layers"] = layers
    return pkg


def build_int8_bisenet_r101_package(variables, stats, *,
                                    eps: float = 1e-5,
                                    image_mean=(0.485, 0.456, 0.406),
                                    image_std=(0.229, 0.224, 0.225)):
    """BiSeNet-R101 (v1c deep-stem Bottleneck backbone + spatial path):
    composes the deep-stem body package with an int8 spatial path whose
    7x7 stem runs bf16 over the raw uint8 input (normalization folded)."""
    p = variables["params"]
    s = variables["batch_stats"]
    if "spatial_path" not in p or "stem_conv1" not in p.get("backbone", {}):
        raise ValueError(
            "expects a deep-stem BiSeNet (spatial_path + "
            "backbone/stem_conv1) — use build_int8_package for the "
            "classic-stem R18/X39 variants"
        )
    pkg = {"kind": "bisenet_r101",
           "bb": build_int8_backbone_package(
               variables, stats, depth=101, eps=eps,
               image_mean=image_mean, image_std=image_std,
               strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1))}

    mean = np.asarray(image_mean, np.float32)
    std = np.asarray(image_std, np.float32)
    k = np.asarray(p["spatial_path"]["conv_7x7"]["conv"]["kernel"],
                   np.float32)
    kf = k / (255.0 * std)[None, None, :, None]
    cshift = (128.0 / 255.0 - mean) / std
    shift = np.einsum("hwio,i->o", k, cshift)
    a, b = fold_bn_affine(p["spatial_path"]["conv_7x7"]["bn"],
                          s["spatial_path"]["conv_7x7"]["bn"], eps)
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    s_sp = _scale(stats, "spatial_path/conv_3x3_1/conv")
    pkg["sp_stem"] = {
        "wf": jnp.asarray(kf, jnp.bfloat16),
        "m": jnp.asarray(a / s_sp, jnp.float32),
        "c": jnp.asarray((shift * a + b) / s_sp, jnp.float32),
    }
    sp = p["spatial_path"]
    sps = s["spatial_path"]
    s_m1 = _scale(stats, "spatial_path/conv_3x3_2/conv")
    s_m2 = _scale(stats, "spatial_path/conv_1x1/conv")
    pkg["sp1"] = _cbr_pack(sp["conv_3x3_1"], sps["conv_3x3_1"], eps,
                           s_sp, s_m1)
    pkg["sp2"] = _cbr_pack(sp["conv_3x3_2"], sps["conv_3x3_2"], eps,
                           s_m1, s_m2)
    pkg["sp3"] = _cbr_pack(sp["conv_1x1"], sps["conv_1x1"], eps, s_m2, None)
    return pkg


def make_int8_bisenet_r101_infer(model, variables, pkg, *,
                                 argmax: bool = True, dtype=jnp.bfloat16):
    """Jitted int8-through BiSeNet-R101 serving.  Input: pre-padded int8
    from ``prepare_u8_input(img, pad=3)`` (the 7x7 spatial stem's padding;
    the deep stem slices its pad-1 window out of the same tensor)."""
    run_bb, bb_runpkg = make_int8_backbone_fn(pkg["bb"], dtype)
    run_pkg = {"bb": bb_runpkg,
               **{k: v for k, v in pkg.items() if k not in ("kind", "bb")}}

    @jax.jit
    def infer(pkg, x_i8):
        # spatial path: bf16 7x7/2 stem over the uint8 codes, int8 chain
        sp = pkg["sp_stem"]
        y = jax.lax.conv_general_dilated(
            x_i8.astype(jnp.bfloat16), sp["wf"], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        q = _requant(jnp.maximum(y * sp["m"] + sp["c"], 0.0))
        q = _apply_cbr(q, pkg["sp1"], 2, 1)
        q = _apply_cbr(q, pkg["sp2"], 2, 1)
        spatial_out = _apply_cbr(q, pkg["sp3"], 1, 0, emit_int8=False)

        # backbone: the deep stem pads 1 — slice it out of the pad-3 input
        xb = x_i8[:, 2:-2, 2:-2, :]
        blocks = run_bb(pkg["bb"], xb)
        blocks = tuple(
            b if b.dtype == dtype else b.astype(dtype) for b in blocks
        )
        dummy = jnp.zeros((1, 1, 1, 3), dtype)
        scores = model.apply(variables, dummy, train=False,
                             spatial_out=spatial_out.astype(dtype),
                             context_blocks=blocks)
        if argmax:
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return infer, run_pkg


def prepare_u8_input(img_u8, pad: int = 1,
                     image_mean=(0.485, 0.456, 0.406)):
    """(1, H, W, 3) uint8 -> pre-padded (1, H+2p, W+2p, 3) int8 (value-128)
    for the deep-stem int8 path; pad constant = the int8 code closest to
    normalized zero (matches the float graph's zero-padding to <0.5/255)."""
    x = np.asarray(img_u8)
    assert x.dtype == np.uint8, x.dtype
    b, h, w, c = x.shape
    padv = (np.round(np.asarray(image_mean) * 255.0) - 128).astype(np.int16)
    out = np.empty((b, h + 2 * pad, w + 2 * pad, c), np.int16)
    out[...] = padv
    out[:, pad:pad + h, pad:pad + w, :] = x.astype(np.int16) - 128
    return jnp.asarray(np.clip(out, -128, 127).astype(np.int8))


def _apply_bottleneck(xq, e, stride, dilation, emit_int8=True):
    """Bottleneck int8-through (1x1 -> 3x3 s/d -> 1x1 + shortcut, relu)."""
    q1 = _apply_cbr(xq, e["conv1"], 1, 0)
    q2 = _apply_cbr(q1, e["conv2"], stride, dilation, dilation=dilation)
    y3 = _qconv(q2, e["conv3"]["w"], 1, 0).astype(jnp.float32)
    z = y3 * e["conv3"]["m"] + e["conv3"]["c"]
    if "down" in e:
        yd = _qconv(xq, e["down"]["w"], stride, 0).astype(jnp.float32)
        z = z + yd * e["down"]["m"] + e["down"]["c"]
    else:
        z = z + xq.astype(jnp.float32) * e["res_ratio"]
    z = jnp.maximum(z, 0.0)
    return _requant(z) if emit_int8 else z


def make_int8_backbone_fn(pkg, dtype=jnp.bfloat16, dequant_all=False):
    """Returns ``run(run_pkg, x_i8) -> tuple of 4 stage features`` (last
    two in ``dtype``, earlier int8 — shape-only for the PSP/PSA heads, or
    all dequantized with ``dequant_all`` for DFN's value-reading decoder)
    plus the stripped run package.  Feed the result to a head via the
    model's ``context_blocks`` passthrough."""
    layers = pkg["layers"]
    statics = {k: (v["stride"], v["dilation"]) for k, v in pkg.items()
               if isinstance(v, dict) and "stride" in v}
    run_pkg = {
        k: ({kk: vv for kk, vv in v.items()
             if kk not in ("stride", "dilation")}
            if isinstance(v, dict) else v)
        for k, v in pkg.items() if k not in ("kind", "layers")
    }

    def run(pkg, x_i8):
        # stem: bf16 conv1 (normalization folded) -> int8 from epilogue on
        s1 = pkg["stem1"]
        y = jax.lax.conv_general_dilated(
            x_i8.astype(jnp.bfloat16), s1["wf"], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        q = _requant(jnp.maximum(y * s1["m"] + s1["c"], 0.0))
        q = _apply_cbr(q, pkg["stem2"], 1, 1)
        q = _apply_cbr(q, pkg["stem3"], 1, 1)
        x = _maxpool_i8(q)
        feats = []
        for li in range(4):
            for bi in range(layers[li]):
                name = f"l{li + 1}_{bi}"
                stride, dilation = statics[name]
                last = li == 3 and bi == layers[li] - 1
                x = _apply_bottleneck(x, pkg[name], stride, dilation,
                                      emit_int8=not last)
            feats.append(x)
        c16_f = (feats[2].astype(jnp.float32) * pkg["s_c16"]).astype(dtype)
        if dequant_all:
            c4_f = (feats[0].astype(jnp.float32) * pkg["s_c4"]).astype(dtype)
            c8_f = (feats[1].astype(jnp.float32) * pkg["s_c8"]).astype(dtype)
            return (c4_f, c8_f, c16_f, feats[3].astype(dtype))
        return (feats[0], feats[1], c16_f, feats[3].astype(dtype))

    return run, run_pkg


def make_int8_pspnet_infer(model, variables, pkg, *, argmax: bool = True,
                           dtype=jnp.bfloat16, dequant_all: bool = False):
    """Jitted int8-through serving for any model with a ``context_blocks``
    passthrough over a Bottleneck backbone (PSPNet's PPM head, PSANet's
    PSA head, DFN's dual-branch decoder with ``dequant_all``): int8
    backbone + bf16 head.  Input: pre-padded int8 from
    ``prepare_u8_input``."""
    run_bb, run_pkg = make_int8_backbone_fn(pkg, dtype, dequant_all)

    @jax.jit
    def infer(pkg, x_i8):
        blocks = run_bb(pkg, x_i8)
        dummy = jnp.zeros((1, 1, 1, 3), dtype)
        scores = model.apply(variables, dummy, train=False,
                             context_blocks=blocks)
        if argmax:
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return infer, run_pkg


def _split_statics(tree: dict):
    """Recursively split a package tree into (arrays, statics).

    Statics are the python-native structure fields the forward builders
    consume as compile-time constants — str/bool/int scalars ('kind',
    'stride', 'dilation', 'n_sp', …) and int tuples ('layers') — at any
    nesting depth (the Bottleneck packages nest under 'bb').  Everything
    else (np/jnp arrays, jnp scalars) goes through flax msgpack."""
    arrays, statics = {}, {}
    for k, v in tree.items():
        if isinstance(v, dict):
            a, s = _split_statics(v)
            arrays[k] = a
            if s:
                statics[k] = s
        elif isinstance(v, (str, bool, int)):
            statics[k] = v
        elif isinstance(v, (tuple, list)) and all(
            isinstance(i, (int, bool)) for i in v
        ):
            statics[k] = list(v)
        else:
            arrays[k] = v
    return arrays, statics


def _merge_statics(arrays, statics):
    out = dict(arrays)
    for k, v in statics.items():
        if isinstance(v, dict):
            out[k] = _merge_statics(out.get(k, {}), v)
        elif isinstance(v, list):
            # preserve element types (ints stay int, bools stay bool) so a
            # static list round-trips exactly as _split_statics stored it
            out[k] = tuple(v)
        else:
            out[k] = v
    return out


INT8PKG_FORMAT_VERSION = 2


def save_int8_package(path: str, pkg: dict) -> str:
    """Persist a built package (quantized weights + epilogue constants) —
    serving hosts load this instead of re-calibrating.  msgpack via
    flax.serialization, like engine/checkpoint.py; the static structure
    fields travel in a parallel side tree (works for every package kind:
    classic-stem r18/x39, bottleneck bodies, bisenet_r101's nested
    'bb')."""
    from flax import serialization

    arrays, statics = _split_statics(pkg)
    arrays = jax.tree.map(np.asarray, arrays)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"v": INT8PKG_FORMAT_VERSION, "statics": statics,
             "arrays": arrays}))
    return path


def load_int8_package(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    v = blob.get("v") if isinstance(blob, dict) else None
    if v != INT8PKG_FORMAT_VERSION or "arrays" not in blob \
            or "statics" not in blob:
        raise ValueError(
            f"{path}: unsupported .int8pkg format "
            f"(version={v!r}, expected {INT8PKG_FORMAT_VERSION}); "
            "re-export the package with save_int8_package / "
            "torchseg-export --int8-through"
        )
    return _merge_statics(blob["arrays"], blob["statics"])


# ----------------------------------------------------------------------
# device-side forward pieces
# ----------------------------------------------------------------------

# fused-stage kernel block sizes (output rows per grid step).  Larger
# blocks amortize the recomputed halo rows ((nr+6..nr)/nr per level);
# chip A/B'd (DESIGN.md round-5): nr=16 on both stages is 2.453 vs
# 2.536 ms @1024x2048 — callers degrade to any nr%4==0 divisor at odd
# geometries via _pick_stage_nr.
_L1_NR = 16
_L2_NR = 16
_L3_NR = 16
# stage-3/4 kernel chain gates: unlike L1->L2 (zero-relayout handoff),
# the L2->L3 and L3->L4 handoffs need an XLA pair-view reshape, and the
# chip A/B says it costs more than the kernels save — int8-l3 2.652 ms
# and int8-l34 2.781 ms vs 2.536 ms with both OFF (perf_probe
# --variant int8-l3 / int8-l34 flips them; DESIGN.md round-5).  L4
# runs as two kernels (down block + res block): the 5-conv fused form
# needs ~17.5 MB of resident weights at cin=256, over the ~16 MB VMEM.
_L3_ENABLE = False
_L4_ENABLE = False
_L4_NR = 16


def _pick_stage_nr(rows: int, pref: int) -> int:
    for nr in (pref, 16, 8, 4):
        if nr % 4 == 0 and rows % nr == 0:
            return nr
    return 4


def _qconv(xq, wq, stride, pad, dilation=1):
    if xq.dtype == jnp.bfloat16:
        # bf16-carried int8 conv: the activations are int8 VALUES stored
        # as bf16 (exactly representable), the products are formed
        # bf16 x bf16 -> f32 (exact: 8+8 mantissa bits < f32's 24) and
        # accumulated in f32, exact up to 2^24 — 3x3x512x127x127 = 74M...
        # per-conv |acc| here is bounded by 3*3*64*127*127 = 9.3M < 2^24
        # for every spatial-path conv, so the result is BIT-IDENTICAL to
        # the int32 path.  Why carry bf16 at all: XLA's s8 (4,1)-packed
        # conv operands force ~1.3 ms of layout copies per serving
        # forward @1024x2048 (round-4 per-op profile, DESIGN.md); the
        # bf16 layouts are native.
        return jax.lax.conv_general_dilated(
            xq, wq.astype(jnp.bfloat16), (stride, stride),
            [(pad, pad)] * 2,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _requant(z, carry=jnp.int8):
    return jnp.clip(jnp.round(z), -127, 127).astype(carry)


def _apply_cbr(xq, e, stride, pad, emit_int8=True, dilation=1,
               carry=jnp.int8):
    y = _qconv(xq, e["w"], stride, pad, dilation).astype(jnp.float32)
    z = jnp.maximum(y * e["m"] + e["c"], 0.0)
    return _requant(z, carry) if emit_int8 else z


def _apply_block(xq, e, stride, emit_int8=True):
    """BasicBlock int8-through; returns int8 (or f32 on the final block)."""
    q1 = _apply_cbr(xq, e["conv1"], stride, 1)
    y2 = _qconv(q1, e["conv2"]["w"], 1, 1).astype(jnp.float32)
    z = y2 * e["conv2"]["m"] + e["conv2"]["c"]
    if "down" in e:
        yd = _qconv(xq, e["down"]["w"], stride, 0).astype(jnp.float32)
        z = z + yd * e["down"]["m"] + e["down"]["c"]
    else:
        z = z + xq.astype(jnp.float32) * e["res_ratio"]
    z = jnp.maximum(z, 0.0)
    return _requant(z) if emit_int8 else z


def _qconv_dw(xq, wq, stride, pad):
    """Depthwise int8 conv (feature_group_count = C)."""
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=xq.shape[-1],
        preferred_element_type=jnp.int32,
    )


def _apply_sep(xq, e, stride, relu=True, emit_int8=True, extra=None):
    """Separable int8-through: depthwise -> per-channel requant ->
    pointwise epilogue (+optional residual term ``extra`` in output units,
    added before the ReLU like the reference's relu(shortcut + r))."""
    ydw = _qconv_dw(xq, e["dw"], stride, 1).astype(jnp.float32)
    q_mid = _requant(ydw * e["dm"])
    ypw = _qconv(q_mid, e["w"], 1, 0).astype(jnp.float32)
    z = ypw * e["m"] + e["c"]
    if extra is not None:
        z = z + extra
    if relu:
        z = jnp.maximum(z, 0.0)
    return _requant(z) if emit_int8 else z


def _apply_xblock(xq, e, stride, emit_int8=True):
    """XceptionBlock int8-through: relu(shortcut + sep1>sep2>sep3)."""
    r = _apply_sep(xq, e["sep1"], stride)
    r = _apply_sep(r, e["sep2"], 1)
    if "proj" in e:
        short = _apply_sep(xq, e["proj"], stride, relu=False,
                           emit_int8=False)
    else:
        short = xq.astype(jnp.float32) * e["res_ratio"]
    return _apply_sep(r, e["sep3"], 1, relu=True, emit_int8=emit_int8,
                      extra=short)


def _maxpool_i8(xq, via: str = "s8"):
    """3x3/2 pad-1 maxpool directly on int8 — exact (max commutes with the
    monotone quantization; identity element -128 never wins over the >=0
    post-ReLU codes).

    via="pallas" runs the standalone Pallas kernel
    (ops/pallas/int8_serve_kernels.maxpool2d_3x3s2_i8): bit-exact, but
    only at parity with the reduce-window standalone (0.40 vs 0.27-0.40
    ms — the width-pairing input reshape costs an XLA relayout, round-5
    chip table).  The SHIPPED serving graph instead fuses the pool into
    the Pallas stem (``s2d_stem_pool_i8``), where the pairing is free;
    this arm remains for A/Bs and non-stem call sites.

    via="bf16" computes the same max over the bf16 image of the codes —
    bit-exact (every int8 value is exactly representable in bf16 and max
    is order-independent); the round-4 A/B arm."""
    if via == "pallas":
        from ..ops.pallas.int8_serve_kernels import maxpool2d_3x3s2_i8

        return maxpool2d_3x3s2_i8(xq)
    if via == "bf16":
        y = jax.lax.reduce_window(
            xq.astype(jnp.bfloat16), jnp.bfloat16(-128), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        return y.astype(xq.dtype)
    return jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _vec_1x1(v, e, relu):
    """f32 1x1 conv+folded-BN on a (b,1,1,C) gate vector."""
    y = jnp.einsum("bhwc,cd->bhwd", v, e["w"]) * e["a"] + e["b"]
    return jnp.maximum(y, 0.0) if relu else y


def _apply_int8_decoder(dec, spatial_q, c16q, c32q):
    """Int8-through BiSeNet decoder: ARM -> top-down refine -> FFM -> head
    (models/bisenet.py:135-188; reference network.py:60-85).  Returns the
    /8 raw class logits in f32 — the caller owns the upsample/argmax
    epilogue.  Spatial convs run int8; the per-image channel gates and
    bilinear resizes run f32 with the requantization fused in."""
    from ..ops.resize import resize_bilinear_align_corners

    # global context from the quantized c32 codes (GAP is linear: exact)
    n32 = c32q.shape[1] * c32q.shape[2]
    gvec = jnp.sum(c32q.astype(jnp.int32), axis=(1, 2), keepdims=True
                   ).astype(jnp.float32) * (dec["s_c32"] / n32)
    gc = _vec_1x1(gvec, dec["gc"], relu=True)

    # arm0 @ /32: int8 3x3 conv -> f32, channel gate from its own GAP;
    # the align-corners resize of the (b,1,1,cc) context to /32 is an
    # exact broadcast, so gc adds directly
    fm0 = _apply_cbr(c32q, dec["arm0"], 1, 1, emit_int8=False)
    att0 = jax.nn.sigmoid(_vec_1x1(
        jnp.mean(fm0, axis=(1, 2), keepdims=True), dec["att0"], relu=False))
    fm = fm0 * att0 + gc
    x = resize_bilinear_align_corners(fm, c16q.shape[1:3])
    r0 = _apply_cbr(_requant(x * dec["inv_r0"]), dec["refine0"], 1, 1,
                    emit_int8=False)

    # arm1 @ /16 + top-down, refine1 emits int8 at the FFM concat scale
    fm1 = _apply_cbr(c16q, dec["arm1"], 1, 1, emit_int8=False)
    att1 = jax.nn.sigmoid(_vec_1x1(
        jnp.mean(fm1, axis=(1, 2), keepdims=True), dec["att1"], relu=False))
    fm = fm1 * att1 + r0
    x = resize_bilinear_align_corners(fm, spatial_q.shape[1:3])
    ctx_q = _apply_cbr(_requant(x * dec["inv_r1"]), dec["refine1"], 1, 1)

    # FFM: int8 concat (both halves share the calibrated concat scale)
    # -> int8 1x1 conv -> f32 SE gate -> fm * (1 + se)
    fm = _apply_cbr(jnp.concatenate([spatial_q, ctx_q], axis=-1),
                    dec["ffm"], 1, 0, emit_int8=False)
    se = jnp.mean(fm, axis=(1, 2), keepdims=True)
    se = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", se, dec["ca1"]), 0.0)
    se = jax.nn.sigmoid(jnp.einsum("bhwc,cd->bhwd", se, dec["ca2"]))
    v = fm + fm * se

    # head: int8 3x3 CBR; the class-logit 1x1 stays float (PTQ rule)
    h = _apply_cbr(_requant(v * dec["inv_h"]), dec["head"], 1, 1,
                   emit_int8=False)
    return jnp.einsum("bhwc,cd->bhwd", h, dec["out_w"]) + dec["out_b"]


def make_int8_through_infer(model, variables, pkg, *, argmax=True,
                            dtype=jnp.bfloat16, stem_mode: str = None,
                            maxpool_via: str = "s8",
                            spatial_carry: str = "s8"):
    """Build the jitted int8-through serving function.

    Returns ``(infer, run_pkg)``: call ``infer(run_pkg, xs_i8)`` with the
    pre-padded int8 s2d input from ``prepare_s2d_input_u8``.  ``run_pkg`` is
    the package with static structure (strides, split point) stripped so it
    can be a jit argument — weights stay runtime inputs rather than
    baked-in constants.

    argmax: True argmaxes the in-model-upsampled scores; 'tiled' (full-res
    heads only) skips the in-model x-scale upsample and produces the
    full-res prediction with the row-tiled epilogue
    (ops/resize.tiled_upsample_argmax) — composes the int8 body with the
    serving epilogue that never holds the full-res score tensor in HBM.

    If ``pkg`` was built with ``decoder="int8"`` (it carries a "dec"
    entry), the ARM/refine/FFM/head decoder also runs int8-through
    (``_apply_int8_decoder``) instead of the flax bf16 decoder — the
    whole graph is then int8 from the uint8 input to the class logits.

    stem_mode: None (default) resolves to "pallas" on a TPU backend and
    "bf16" elsewhere (the Pallas kernels have no CPU lowering outside
    interpret mode).  "pallas" (classic-stem only — other kinds degrade
    to "bf16") runs the stem conv + requant + backbone maxpool
    + both spatial-path 3x3/2 convs as Pallas kernels
    (ops/pallas/int8_serve_kernels) — round-5 chip A/B: 4.21 vs 4.60 ms
    @1024x2048 (docs/DESIGN.md "Pallas int8 stem+spatial path"); the
    conv kernels are bit-identical to the XLA path, the stem within
    +-1 code on f32-summation ties.  "bf16"/"bf16-acc"/"s8" are the
    round-4 XLA arms.

    maxpool_via / spatial_carry: "s8" (store int8) or "bf16" (store the
    same int8 CODES as bf16) for the backbone maxpool and the
    spatial-path activations — bit-identical values either way (see
    ``_qconv``/``_maxpool_i8``); the choice only moves where XLA pays
    layout-copy vs bandwidth cost.  Chip A/B in docs/DESIGN.md.
    (With the default stem_mode="pallas" the maxpool is fused into the
    stem kernel and the spatial carry is int8; both knobs then only
    affect the fallback geometries.)"""
    if argmax == "tiled" and model.head_scales[2] <= 1:
        raise ValueError(
            "argmax='tiled' targets full-res heads (head_scales[2] > 1); "
            "the .speed variants already emit /8 logits — use argmax=True"
        )
    if stem_mode is None:
        stem_mode = "pallas" if jax.default_backend() == "tpu" else "bf16"
    kind = pkg.get("kind", "r18")
    n_sp = int(pkg["stem"]["n_sp"])
    strides = {name: pkg[name]["stride"]
               for name in pkg if name.startswith("l")}
    stages = ((1, 2), (2, 2), (3, 2), (4, 2)) if kind == "r18" \
        else ((1, 4), (2, 8), (3, 4))
    run_pkg = {
        k: ({kk: vv for kk, vv in v.items() if kk not in ("stride", "n_sp")}
            if isinstance(v, dict) else v)
        for k, v in pkg.items() if k != "kind"
    }
    if stem_mode == "pallas" and kind == "r18" and tuple(
            pkg["sp1"]["w"].shape) == (3, 3, 64, 64):
        # pre-pack the spatial-path conv weights for the Pallas quad
        # kernels (ops/pallas/int8_serve_kernels.conv3x3s2_i8_quad):
        # exact int8 codes carried in bf16, f32 accumulation — the
        # kernel is bit-identical to _qconv + _requant (docstring there).
        # r18-kind only: the X39 arm was MEASURED SLOWER (2.92 vs
        # 1.91 ms @768x1536, round-5 chip A/B in DESIGN.md) — without
        # the v3 stem emitting the quad view, the std->quad boundary
        # relayouts around the kernels cost more than the sp convs save
        # at X39's resolution (and X39 ships bf16 deploy regardless)
        from ..ops.pallas.int8_serve_kernels import (
            pack_conv3x3_weights,
            pack_resblock_weights,
        )

        for name in ("sp1", "sp2"):
            wa, wb, wo = pack_conv3x3_weights(pkg[name]["w"])
            run_pkg[name + "q"] = {
                "wa": wa, "wb": wb, "wo": wo,
                "m": pkg[name]["m"], "c": pkg[name]["c"],
            }
        if (kind == "r18"
                and strides.get("l1_0") == 1 and strides.get("l1_1") == 1
                and "down" not in pkg["l1_0"]
                and pkg["l1_0"]["conv1"]["w"].shape == (3, 3, 64, 64)):
            l1w, l1mc, l1rr = pack_resblock_weights(pkg["l1_0"],
                                                    pkg["l1_1"])
            run_pkg["l1q"] = {"W": l1w, "mc": l1mc, "rr": l1rr}
            # stage 2 rides the same chain (consumes the L1 kernel's
            # paired view directly; round-5 session: the 5 l2 convs +
            # their s8 operand fusions are the next per-op block)
            if (strides.get("l2_0") == 2 and strides.get("l2_1") == 1
                    and "down" in pkg["l2_0"]
                    and pkg["l2_0"]["conv1"]["w"].shape == (3, 3, 64, 128)
                    and pkg["l2_0"]["down"]["w"].shape == (1, 1, 64, 128)):
                from ..ops.pallas.int8_serve_kernels import pack_l2_weights

                wc1, wd, w3, l2mc, l2rr = pack_l2_weights(pkg["l2_0"],
                                                          pkg["l2_1"])
                run_pkg["l2q"] = {"Wc1": wc1, "Wd": wd, "W3": w3,
                                  "mc": l2mc, "rr": l2rr}
                # stage 3 is the same down-stage kernel at cin=128 (its
                # paired view is a free row-major regrouping of the L2
                # kernel's std output)
                if (_L3_ENABLE and strides.get("l3_0") == 2
                        and strides.get("l3_1") == 1
                        and "down" in pkg["l3_0"]
                        and pkg["l3_0"]["conv1"]["w"].shape
                        == (3, 3, 128, 256)
                        and pkg["l3_0"]["down"]["w"].shape
                        == (1, 1, 128, 256)):
                    wc1, wd, w3, l3mc, l3rr = pack_l2_weights(pkg["l3_0"],
                                                              pkg["l3_1"])
                    run_pkg["l3q"] = {"Wc1": wc1, "Wd": wd, "W3": w3,
                                      "mc": l3mc, "rr": l3rr}
                if (_L4_ENABLE and strides.get("l4_0") == 2
                        and strides.get("l4_1") == 1
                        and "down" in pkg["l4_0"]
                        and pkg["l4_0"]["conv1"]["w"].shape
                        == (3, 3, 256, 512)
                        and pkg["l4_0"]["down"]["w"].shape
                        == (1, 1, 256, 512)):
                    from ..ops.pallas.int8_serve_kernels import (
                        pack_down_block_weights,
                        pack_res_block1_weights,
                    )

                    wc1, wd, wc2, dmc = pack_down_block_weights(
                        pkg["l4_0"])
                    rw, rmc, rrr = pack_res_block1_weights(pkg["l4_1"])
                    run_pkg["l4q"] = {"Wc1": wc1, "Wd": wd, "Wc2": wc2,
                                      "dmc": dmc, "W": rw, "mc": rmc,
                                      "rr": rrr}

    @jax.jit
    def infer(pkg, xs):
        stem = pkg["stem"]
        use_dec = "dec" in pkg
        pooled = None
        sp_quad = pooled_view = None
        cout_stem = stem["wf"].shape[-1]
        if stem_mode == "pallas" and kind == "r18":
            # Pallas fused stem (ops/pallas/int8_serve_kernels): same bf16
            # weights / f32 accumulation / requant math as the "bf16"
            # branch below, but conv + requant + the backbone 3x3/2
            # maxpool in Pallas kernels.  The v3 stem additionally emits
            # sp in the quad view the sp1 kernel consumes and the pooled
            # backbone in the paired view the L1 kernel consumes, so no
            # XLA relayout exists between the Pallas stages (round-5
            # chip tables, docs/DESIGN.md "Pallas int8 stem+spatial
            # path").  Geometry the fused kernels reject (odd crops)
            # degrades per trace-time shape to the v2 split kernels,
            # then to the XLA stem.
            from ..ops.pallas.int8_serve_kernels import (
                s2d_stem_conv_i8,
                s2d_stem_pool_i8,
                s2d_stem_pool_quad_i8,
                spatial_path_shapes_ok,
                stem_pool_shapes_ok,
            )

            h2s, w2s = xs.shape[1] - 3, xs.shape[2] - 3
            stem_ok = stem_pool_shapes_ok(xs.shape, cout_stem, n_sp)
            if (stem_ok and w2s % 8 == 0 and "l1q" in pkg
                    and spatial_path_shapes_ok(h2s, w2s)
                    and spatial_carry == "s8"):
                sp_quad, pooled_view = s2d_stem_pool_quad_i8(
                    xs, stem["wf"], stem["mf"], stem["cf"], n_sp)
                sp_q = None
            elif stem_ok:
                sp_q, pooled = s2d_stem_pool_i8(
                    xs, stem["wf"], stem["mf"], stem["cf"], n_sp)
            else:
                sp_q, bb_q = s2d_stem_conv_i8(
                    xs, stem["wf"], stem["mf"], stem["cf"], n_sp)
            if spatial_carry == "bf16" and sp_q is not None:
                sp_q = sp_q.astype(jnp.bfloat16)
        elif stem_mode in ("bf16", "bf16-acc", "pallas"):
            # bf16 stem conv over the same int8 input (cast is free in the
            # conv's input handling); int8 quantization fused into the
            # epilogue.  Chip profile: the 12-ch int8 stem conv is slower
            # than bf16 (1.76 vs 1.2 ms) — int8 starts at the body.
            # "bf16-acc" emits the conv result in bf16, halving the
            # 272 MB f32 y round-trip before the requant at the cost of
            # occasional +-1 code shifts from the bf16 rounding of y.
            # ("pallas" lands here too when kind != "r18": the fused
            # kernels target the classic-stem geometry.)
            y = jax.lax.conv_general_dilated(
                xs.astype(jnp.bfloat16), stem["wf"], (1, 1),
                [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=(
                    jnp.bfloat16 if stem_mode == "bf16-acc"
                    else jnp.float32),
            )
            z = jnp.maximum(y.astype(jnp.float32) * stem["mf"]
                            + stem["cf"], 0.0)
        else:
            y = _qconv(xs, stem["w"], 1, 0).astype(jnp.float32)
            z = jnp.maximum(y * stem["m"] + stem["c"], 0.0)
        if not (stem_mode == "pallas" and kind == "r18"):
            if spatial_carry == "bf16":
                # split BEFORE the requant so each half quantizes straight
                # into its carrier dtype (one fused pass each, no repack)
                sp_q = _requant(z[..., :n_sp], jnp.bfloat16)
                bb_q = _requant(z[..., n_sp:])
            else:
                q = _requant(z)
                sp_q, bb_q = q[..., :n_sp], q[..., n_sp:]

        # spatial path (int8 chain; last conv emits float for the flax
        # FFM, int8 at the concat scale for the int8 decoder).  Both
        # 3x3/2 CBRs run as chained Pallas quad kernels when possible —
        # XLA's s8 convs here cost ~1.3 ms in (4,1)-packed operand
        # copies (round-4/5 per-op profiles); the kernels are
        # bit-identical to the _apply_cbr path (exact integer bf16
        # matmuls)
        carry = jnp.bfloat16 if spatial_carry == "bf16" else jnp.int8
        if sp_quad is not None:
            from ..ops.pallas.int8_serve_kernels import (
                spatial_path_i8_from_quad,
            )

            sq = spatial_path_i8_from_quad(sp_quad, pkg["sp1q"],
                                           pkg["sp2q"])
        else:
            sp_pallas = False
            if stem_mode == "pallas" and kind == "r18" \
                    and sp_q.dtype == jnp.int8 and "sp1q" in pkg:
                from ..ops.pallas.int8_serve_kernels import (
                    spatial_path_i8,
                    spatial_path_shapes_ok,
                )

                sp_pallas = spatial_path_shapes_ok(*sp_q.shape[1:3])
            if sp_pallas:
                sq = spatial_path_i8(sp_q, pkg["sp1q"], pkg["sp2q"])
            else:
                sq = _apply_cbr(sp_q, pkg["sp1"], 2, 1, carry=carry)
                sq = _apply_cbr(sq, pkg["sp2"], 2, 1, carry=carry)
        # the decoder concat wants s8 codes; the /8 tensor is small, so
        # the final requant lands in s8 regardless of the carry
        spatial_out = _apply_cbr(sq, pkg["sp3"], 1, 0, emit_int8=use_dec)

        # backbone body (the fused Pallas stem already pooled).  Stage 1
        # (both stride-1 BasicBlocks) runs as ONE fused Pallas kernel
        # when possible (intermediates never leave VMEM) —
        # bit-identical to the chained _apply_block path; XLA runs
        # these 4 convs ~1.5 ms, the kernel 0.69 (round-5 chip table,
        # docs/DESIGN.md)
        if pooled_view is None:
            x = pooled if pooled is not None else _maxpool_i8(
                bb_q, via=maxpool_via)
            l1_pallas = (stem_mode == "pallas" and kind == "r18"
                         and "l1q" in pkg and x.dtype == jnp.int8
                         and x.shape[1] % 8 == 0 and x.shape[2] % 2 == 0)
        else:
            x, l1_pallas = None, True
        feats = []
        apply_block = _apply_block if kind == "r18" else _apply_xblock
        last_stage = stages[-1][0]
        l1_raw = None  # L1 kernel's paired view, for the L2 kernel
        l2_kernel_out = False  # L2 kernel ran and L3 can chain off it
        for li, nblocks in stages:
            if li == 1 and l1_pallas:
                from ..ops.pallas.int8_serve_kernels import (
                    l1_stage_i8_paired_view,
                    l2_stage_shapes_ok,
                )

                q1 = pkg["l1q"]
                xv = (pooled_view if pooled_view is not None
                      else x[0].reshape(x.shape[1], x.shape[2] // 2, 128))
                l1_raw = l1_stage_i8_paired_view(
                    xv, q1["W"], q1["mc"], q1["rr"],
                    nr=_pick_stage_nr(xv.shape[0], _L1_NR),
                    paired_out=True)
                h4, w4 = l1_raw.shape[0], 2 * l1_raw.shape[1]
                x = l1_raw.reshape(h4, w4, 64)[None]
                if not ("l2q" in pkg and l2_stage_shapes_ok(
                        h4, w4, nr=_pick_stage_nr(h4 // 2, _L2_NR))):
                    l1_raw = None
                feats.append(x)
                continue
            if li == 2 and l1_raw is not None:
                # fused stage-2 kernel on the L1 kernel's paired view —
                # zero XLA relayout between the stages (bit-identical
                # to the chained _apply_block path)
                from ..ops.pallas.int8_serve_kernels import (
                    down_stage_shapes_ok,
                    l2_stage_i8_from_paired,
                )

                q2 = pkg["l2q"]
                h4 = l1_raw.shape[0]
                x = l2_stage_i8_from_paired(
                    l1_raw, q2["Wc1"], q2["Wd"], q2["W3"], q2["mc"],
                    q2["rr"], nr=_pick_stage_nr(h4 // 2, _L2_NR))
                l2_kernel_out = ("l3q" in pkg and down_stage_shapes_ok(
                    x.shape[1], x.shape[2],
                    nr=_pick_stage_nr(x.shape[1] // 2, _L3_NR)))
                feats.append(x)
                continue
            if li == 3 and l2_kernel_out:
                # same down-stage kernel at cin=128; its paired view is
                # a free row-major regrouping of the L2 kernel's output
                from ..ops.pallas.int8_serve_kernels import (
                    down_stage_i8_from_paired,
                )

                q3 = pkg["l3q"]
                h8, w8 = x.shape[1], x.shape[2]
                xv = x[0].reshape(h8, w8 // 2, 256)
                x = down_stage_i8_from_paired(
                    xv, q3["Wc1"], q3["Wd"], q3["W3"], q3["mc"],
                    q3["rr"], nr=_pick_stage_nr(h8 // 2, _L3_NR))
                feats.append(x)
                continue
            # kernel path emits s8 codes — only valid when the int8
            # decoder consumes them (the bf16-decoder last stage emits
            # float at the last block)
            if li == 4 and "l4q" in pkg and use_dec:
                from ..ops.pallas.int8_serve_kernels import (
                    down_block_i8_from_paired,
                    down_stage_shapes_ok,
                    res_block_i8_std,
                )

                h16, w16 = x.shape[1], x.shape[2]
                nr4 = _pick_stage_nr(h16 // 2, _L4_NR)
                if down_stage_shapes_ok(h16, w16, nr=nr4):
                    q4 = pkg["l4q"]
                    xv = x[0].reshape(h16, w16 // 2, 512)
                    y = down_block_i8_from_paired(
                        xv, q4["Wc1"], q4["Wd"], q4["Wc2"], q4["dmc"],
                        nr=nr4)
                    x = res_block_i8_std(
                        y, q4["W"], q4["mc"], q4["rr"],
                        nr=_pick_stage_nr(h16 // 2, _L4_NR))
                    feats.append(x)
                    continue
            for bi in range(nblocks):
                name = f"l{li}_{bi}"
                last = li == last_stage and bi == nblocks - 1
                x = apply_block(x, pkg[name], strides[name],
                                emit_int8=use_dec or not last)
            feats.append(x)
        if use_dec:
            # int8-through decoder: c32/c16 stay int8 (the package
            # quantized them at the arm input scales); /8 raw logits out
            scores = _apply_int8_decoder(pkg["dec"], spatial_out,
                                         feats[-2], feats[-1])
        else:
            # bf16 decoder handoff: the last stage already emits float;
            # the next-to-last dequantizes (arm1 reads its values);
            # earlier stages are shape-only in the decoder
            c_last = feats[-1]
            c_prev = feats[-2].astype(jnp.float32) * pkg["s_c16"]
            blocks = tuple(
                f.astype(dtype) for f in feats[:-2]
            ) + (c_prev.astype(dtype), c_last.astype(dtype))
            dummy = jnp.zeros((1, 1, 1, 3), dtype)  # unused: all precomputed
            scores = model.apply(
                variables, dummy, train=False,
                spatial_out=spatial_out.astype(dtype),
                context_blocks=blocks,
                raw_logits=argmax == "tiled",
            )
        if argmax == "tiled":
            from ..ops.resize import tiled_upsample_argmax

            scale = model.head_scales[2]
            h, w = scores.shape[1:3]
            return tiled_upsample_argmax(scores, (h * scale, w * scale))
        if use_dec:
            # mirror the flax eval tail (models/bisenet.py:178-188)
            from ..ops.resize import upsample_by_scale

            scores = upsample_by_scale(scores, model.head_scales[2],
                                       dtype=jnp.float32)
            if not argmax:
                scores = jax.nn.log_softmax(
                    scores.astype(jnp.float32), axis=-1)
        if argmax:
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return infer, run_pkg


def build_int8_serving_for_experiment(cfg, model, variables, *,
                                      decoder: str = None,
                                      calib_images=None,
                                      calib_shape=(1, 256, 512, 3),
                                      seed: int = 0,
                                      stem_mode: str = None):
    """Assemble the int8-through serving graph for ANY registered
    experiment — the model-family dispatch shared by
    ``torchseg-speed --int8-through`` and ``torchseg-export
    --int8-through``.

    calib_images: list of uint8 NHWC arrays for activation calibration
    (None → 2 random images of ``calib_shape``; production serving
    calibrates on val crops — see docs/DESIGN.md "int8-THROUGH").
    decoder: None (default) auto-picks per the round-4 chip A/B
    (docs/DESIGN.md "int8 decoder chip A/B"): "int8" for classic-stem
    BiSeNet (R18/X39 — int8 ARM/refine/FFM/head measured faster than
    bf16 on both, 4.905 vs 4.923 ms and 2.033 vs 2.060 ms chained),
    "bf16" for every other family.  Pass "int8"/"bf16" to force;
    "int8" is classic-stem BiSeNet only.

    Returns ``(infer, run_pkg, prepare, prep)``:
        infer(run_pkg, xs)  jitted serving fn (argmax labels)
        prepare(img_u8)     host-side numpy input prep → xs
        prep                the same prep, declaratively:
                            {"format": "s2d"|"pad", "pads"|"pad": …,
                             "image_mean": […]} — enough to build an
                            equivalent jax graph (deploy/export.py).
    Raises ValueError for unsupported families (e.g. Xception depthwise
    decoders with decoder="int8").
    """
    classic_stem = not (
        cfg.model == "bisenet_r101"
        or cfg.model.startswith(("pspnet", "psanet", "dfn", "fcn"))
    )
    if decoder is None:
        decoder = "int8" if classic_stem else "bf16"
    if decoder == "int8" and not classic_stem:
        raise ValueError(
            "decoder='int8' only applies to the classic-stem BiSeNet "
            f"int8-through path (got {cfg.model})"
        )
    if calib_images is None:
        rng = np.random.default_rng(seed)
        calib_images = [
            rng.integers(0, 255, calib_shape).astype(np.uint8)
            for _ in range(2)
        ]
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    calib = [jnp.asarray((u.astype(np.float32) / 255.0 - mean) / std)
             for u in calib_images]
    stats = calibrate_channelwise(model, variables, calib)

    if cfg.model == "bisenet_r101":
        pkg = build_int8_bisenet_r101_package(
            variables, stats, eps=cfg.bn_eps,
            image_mean=cfg.image_mean, image_std=cfg.image_std,
        )
        infer, run_pkg = make_int8_bisenet_r101_infer(model, variables, pkg)
        prep = {"format": "pad", "pad": 3,
                "image_mean": list(cfg.image_mean)}
        prepare = lambda u8: prepare_u8_input(  # noqa: E731
            u8, pad=3, image_mean=cfg.image_mean)
    elif cfg.model.startswith(("pspnet", "psanet", "dfn", "fcn")):
        depth = int(cfg.model.rsplit("r", 1)[-1])
        is_dfn = cfg.model.startswith(("dfn", "fcn"))
        extra = (dict(strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1))
                 if is_dfn else {})  # DFN/FCN: standard strides
        pkg = build_int8_backbone_package(
            variables, stats, depth=depth, eps=cfg.bn_eps,
            image_mean=cfg.image_mean, image_std=cfg.image_std, **extra,
        )
        infer, run_pkg = make_int8_pspnet_infer(
            model, variables, pkg, dequant_all=is_dfn,
        )
        prep = {"format": "pad", "pad": 1,
                "image_mean": list(cfg.image_mean)}
        prepare = lambda u8: prepare_u8_input(  # noqa: E731
            u8, image_mean=cfg.image_mean)
    else:
        pkg = build_int8_package(
            variables, stats, eps=cfg.bn_eps,
            image_mean=cfg.image_mean, image_std=cfg.image_std,
            decoder=decoder,
        )
        infer, run_pkg = make_int8_through_infer(model, variables, pkg,
                                                 stem_mode=stem_mode)
        prep = {"format": "s2d", "pads": [[2, 1], [2, 1]],
                "image_mean": list(cfg.image_mean)}
        prepare = lambda u8: prepare_s2d_input_u8(  # noqa: E731
            u8, image_mean=cfg.image_mean)
    return infer, run_pkg, prepare, prep
