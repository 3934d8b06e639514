"""Batch normalization with exact PyTorch semantics + cross-replica sync.

This single module replaces three reference components:
  * ``nn.BatchNorm2d`` (plain per-device BN),
  * apex ``SyncBatchNorm`` (the main training path, e.g. reference
    model/bisenet/cityscapes.bisenet.R18/train.py:54-55),
  * the legacy CUDA/thread SyncBN extension
    (reference furnace/legacy/sync_bn/{src,syncbn.py}) whose math spec is:
    allreduce of per-channel (sum_x, sum_x^2, N) then normalize
    (syncbn.py:42-52,86-98).

On TPU the allreduce is a single ``lax.pmean`` over the mesh ``axis_name``
inside ``shard_map`` — no native code, no threads.

PyTorch conventions reproduced exactly:
  * momentum m=0.1 means ``running = (1 - m) * running + m * batch``,
  * normalization uses the *biased* batch variance,
  * running_var is updated with the *unbiased* variance (n / (n - 1)),
    where n counts elements across every synced replica
    (reference legacy/sync_bn/syncbn.py:92-96).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """NHWC batch norm over (N, H, W) with optional cross-replica sync.

    Attributes:
      momentum: torch-convention momentum (fraction of the *new* batch stat).
      epsilon: added to variance before rsqrt.
      axis_name: if set and present (inside shard_map/pmap), batch statistics
        are averaged across that mesh axis — this is SyncBN.
      use_scale/use_bias: affine parameters (gamma/beta).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    use_scale: bool = True
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = (
            self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            if self.use_scale
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            if self.use_bias
            else None
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            # Two moments so the cross-replica reduction is one fused pmean,
            # mirroring the (sum_x, sum_x^2) exchange of the reference SyncBN.
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n_local = xf.size // features
            n_total = n_local
            if self.axis_name is not None and not self.is_initializing():
                stacked = jnp.stack([mean, mean_sq])
                stacked = jax.lax.pmean(stacked, axis_name=self.axis_name)
                mean, mean_sq = stacked[0], stacked[1]
                n_total = n_local * jax.lax.axis_size(self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

            if not self.is_initializing():
                m = self.momentum
                unbias = n_total / max(n_total - 1, 1)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * (var * unbias)

        # Fold mean/var/gamma/beta into one per-channel affine computed in
        # f32 (C-sized vectors, negligible), applied in the compute dtype —
        # keeps bf16 activations bf16 so XLA fuses the affine+ReLU into the
        # conv epilogue instead of round-tripping through f32.
        inv = jax.lax.rsqrt(var + self.epsilon)
        a = inv if scale is None else inv * scale
        b = -mean * a
        if bias is not None:
            b = b + bias
        out_dtype = self.dtype or x.dtype
        return x.astype(out_dtype) * a.astype(out_dtype) + b.astype(out_dtype)
