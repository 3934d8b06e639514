"""Post-training int8 quantization for serving — model-agnostic.

The v5e MXU runs int8 matmuls at 2x the bf16 rate and int8 activations halve
HBM traffic, so quantized serving is the standard production lever once the
bf16 graph is layout-bound (docs/DESIGN.md round-2 table).  The reference has
no quantization story; this is a beyond-parity framework capability.

Scheme (symmetric, zero-point-free — the TPU-friendly choice):
  * weights: per-output-channel int8, scale = absmax / 127;
  * activations: per-tensor int8, scale calibrated by running representative
    batches through the float graph and recording each conv input's absmax.

Implementation: ``flax.linen.intercept_methods`` swaps every ``nn.Conv``
application for quantize -> int8 conv (``preferred_element_type=int32``) ->
rescale + bias, so ANY Flax model in the zoo quantizes without model changes.
Layers can be kept in float via ``skip`` (class-logit head convs by default —
the usual accuracy-critical layers).

Accuracy note: real deployments calibrate on validation images and must
re-verify mIoU; tests pin the mechanism (dequantization math, argmax
agreement on random networks), not dataset accuracy.
"""

import re
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# head class-logit convs across the model zoo: bisenet heads ("head0..2 /
# conv_1x1"), fcn/psp/psa/dfn output convs
DEFAULT_SKIP = (
    r"^head\d/conv_1x1$",
    r"conv1x1$",
    r"conv6_out$",
    r"^(smooth|border)_head\d/conv$",
)


def _path_str(module) -> str:
    return "/".join(module.path)


def _is_conv_call(context) -> bool:
    return (
        isinstance(context.module, nn.Conv)
        and context.method_name == "__call__"
    )


def calibrate(model, variables, batches: Iterable, apply_kwargs=None
              ) -> Dict[str, float]:
    """Run the float graph over representative batches, recording the absmax
    of every conv input.  Returns {conv_path: absmax}.

    The recording forward is jitted (the interceptor contributes traced
    absmax OUTPUTS): one compiled dispatch per batch instead of one per op
    — eager calibration through the dev tunnel took minutes."""
    apply_kwargs = dict(apply_kwargs or {})

    @jax.jit
    def run(x):
        rec = {}

        def interceptor(next_fun, args, kwargs, context):
            if _is_conv_call(context):
                path = _path_str(context.module)
                a = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                rec[path] = jnp.maximum(rec[path], a) if path in rec else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, train=False, **apply_kwargs)
        return rec

    stats: Dict[str, float] = {}
    for x in batches:
        rec = jax.device_get(run(jnp.asarray(x)))
        for path, a in rec.items():
            stats[path] = max(stats.get(path, 0.0), float(a))
    return stats


def _norm_strides(s):
    if isinstance(s, int):
        return (s, s)
    return tuple(s) if s is not None else (1, 1)


def _norm_padding(p):
    if isinstance(p, str):
        return p
    if isinstance(p, int):
        return [(p, p), (p, p)]
    return [tuple(q) if not isinstance(q, int) else (q, q) for q in p]


def quantized_interceptor(scales: Dict[str, float],
                          skip: Iterable[str] = DEFAULT_SKIP) -> Callable:
    """Build the intercept_methods callback replacing calibrated nn.Conv
    applications with the int8 path."""
    skip_res = [re.compile(p) for p in skip]

    def interceptor(next_fun, args, kwargs, context):
        if not _is_conv_call(context):
            return next_fun(*args, **kwargs)
        mod = context.module
        path = _path_str(mod)
        if path not in scales or any(r.search(path) for r in skip_res):
            return next_fun(*args, **kwargs)

        (x,) = args
        params = mod.variables["params"]
        w = params["kernel"].astype(jnp.float32)
        bias = params.get("bias")

        s_in = max(scales[path], 1e-8) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_in), -127, 127
        ).astype(jnp.int8)
        s_w = jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12
        ) / 127.0  # per output channel
        wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)

        y = jax.lax.conv_general_dilated(
            xq,
            wq,
            _norm_strides(mod.strides),
            _norm_padding(mod.padding),
            rhs_dilation=_norm_strides(mod.kernel_dilation)
            if mod.kernel_dilation is not None
            else None,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=mod.feature_group_count,
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_in * s_w)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        out_dtype = x.dtype if mod.dtype is None else mod.dtype
        return y.astype(out_dtype)

    return interceptor


def quantized_apply_fn(model, scales: Dict[str, float],
                       skip: Iterable[str] = DEFAULT_SKIP) -> Callable:
    """(variables, x, **kw) -> outputs with calibrated convs running int8.
    Jit-compatible: the interception happens at trace time."""
    interceptor = quantized_interceptor(scales, skip)

    def apply_fn(variables, x, **kw):
        kw.setdefault("train", False)
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, **kw)

    return apply_fn


def make_int8_infer(model, variables, calib_batches,
                    skip: Iterable[str] = DEFAULT_SKIP,
                    argmax: bool = True, apply_kwargs=None):
    """Calibrate then build a jitted int8 serving function."""
    scales = calibrate(model, variables, calib_batches,
                       apply_kwargs=apply_kwargs)
    apply_fn = quantized_apply_fn(model, scales, skip)

    @jax.jit
    def infer(x):
        scores = apply_fn(variables, x, **dict(apply_kwargs or {}))
        if argmax:
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return infer, scales
