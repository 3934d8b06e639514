"""Fused multi-class sigmoid focal loss — the Pallas/TPU counterpart of the
reference's native CUDA extension (furnace/seg_opr/sigmoid_focal_loss/src/
sigmoid_focal_loss_cuda.cu:24-97), including its conventions:

  * logits (N, C), integer targets (N,) with t == d + 1 marking class d
    positive and t == 0 background; t < 0 is fully ignored;
  * forward per-element loss:
      p = sigmoid(x)
      term1 = (1-p)^g * log(max(p, tiny))
      term2 = p^g * log(1-p)            (computed in the stable form
               -x*(x>=0) - log(1+exp(x - 2x*(x>=0))), :48-53)
      loss  = -alpha*c1*term1 - (1-alpha)*c2*term2
  * backward (:62-97):
      d1 = (1-p)^g * (1 - p - g*p*log(max(p, tiny)))
      d2 = p^g * (g*(1-p)*log(1-p) - p)
      dx = (-alpha*c1*d1 - (1-alpha)*c2*d2) * dloss

Both passes are single Pallas kernels (one VMEM tile of logits per grid step,
targets prefetched as scalars), wired together with jax.custom_vjp — the
structural equivalent of the reference's autograd Function
(functions/sigmoid_focal_loss.py:8-42).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1.1754943508222875e-38  # FLT_MIN, matching the CUDA max(p, FLT_MIN)


def _row_tile(n: int) -> int:
    return min(512, max(8, 1 << (n - 1).bit_length()))


def _fwd_kernel(gamma, alpha, logits_ref, targets_ref, out_ref):
    x = logits_ref[:].astype(jnp.float32)
    t = targets_ref[:]  # (TN, 1) int32
    tn, c = x.shape
    d = jax.lax.broadcasted_iota(jnp.int32, (tn, c), 1)
    c1 = (t == d + 1).astype(jnp.float32)
    c2 = ((t >= 0) & (t != d + 1)).astype(jnp.float32)

    p = jax.nn.sigmoid(x)
    term1 = (1.0 - p) ** gamma * jnp.log(jnp.maximum(p, _TINY))
    xpos = (x >= 0).astype(jnp.float32)
    log1mp = -x * xpos - jnp.log1p(jnp.exp(x - 2.0 * x * xpos))
    term2 = p**gamma * log1mp
    out_ref[:] = -(c1 * term1 * alpha) - (c2 * term2 * (1.0 - alpha))


def _bwd_kernel(gamma, alpha, logits_ref, targets_ref, dloss_ref, out_ref):
    x = logits_ref[:].astype(jnp.float32)
    t = targets_ref[:]
    g = dloss_ref[:].astype(jnp.float32)
    tn, c = x.shape
    d = jax.lax.broadcasted_iota(jnp.int32, (tn, c), 1)
    c1 = (t == d + 1).astype(jnp.float32)
    c2 = ((t >= 0) & (t != d + 1)).astype(jnp.float32)

    p = jax.nn.sigmoid(x)
    logp = jnp.log(jnp.maximum(p, _TINY))
    d1 = (1.0 - p) ** gamma * (1.0 - p - p * gamma * logp)
    xpos = (x >= 0).astype(jnp.float32)
    log1mp = -x * xpos - jnp.log1p(jnp.exp(x - 2.0 * x * xpos))
    d2 = p**gamma * (log1mp * (1.0 - p) * gamma - p)
    out_ref[:] = (-(c1 * d1 * alpha) - (c2 * d2 * (1.0 - alpha))) * g


def _call_elementwise(kernel, gamma, alpha, logits, targets, *extra):
    n, c = logits.shape
    tn = _row_tile(n)
    grid = (pl.cdiv(n, tn),)
    in_specs = [
        pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((tn, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in extra
    ]
    return pl.pallas_call(
        functools.partial(kernel, gamma, alpha),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tn, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
    )(logits, targets.reshape(-1, 1).astype(jnp.int32), *extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sigmoid_focal_loss_multiclass(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
):
    """Per-element focal losses (N, C); reduce like the reference module
    wrapper (``SigmoidFocalLossMulti``) with sum / num_positives."""
    return _call_elementwise(_fwd_kernel, gamma, alpha, logits, targets)


def _vjp_fwd(logits, targets, gamma, alpha):
    out = sigmoid_focal_loss_multiclass(logits, targets, gamma, alpha)
    return out, (logits, targets)


def _vjp_bwd(gamma, alpha, res, dloss):
    logits, targets = res
    dx = _call_elementwise(_bwd_kernel, gamma, alpha, logits, targets, dloss)
    return dx.astype(logits.dtype), None


sigmoid_focal_loss_multiclass.defvjp(_vjp_fwd, _vjp_bwd)


def SigmoidFocalLossMulti(
    logits, targets, gamma: float = 2.0, alpha: float = 0.25
):
    """Module-wrapper semantics of the reference ext
    (modules/sigmoid_focal_loss.py:14-26): sum of per-element losses divided
    by the number of positive targets (t > 0)."""
    losses = sigmoid_focal_loss_multiclass(logits, targets, gamma, alpha)
    pos = jnp.sum((targets > 0).astype(jnp.float32))
    return jnp.sum(losses) / jnp.maximum(pos, 1.0)
