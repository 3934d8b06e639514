"""Adaptive average pooling with exact torch ``AdaptiveAvgPool2d`` semantics,
expressed as segment-mean matrices so the whole PPM head (reference
model/pspnet/*/network.py:77-109) stays one fused einsum chain on the MXU.

torch bins: bin i covers rows [floor(i*H/s), ceil((i+1)*H/s)).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _pool_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_h, out_w)."""
    assert x.ndim == 4
    _, h, w, _ = x.shape
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    prec = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(x.dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if oh != h:
        ph = jnp.asarray(_pool_matrix_np(h, oh), dtype=x.dtype)
        x = jnp.einsum("ph,bhwc->bpwc", ph, x, precision=prec)
    if ow != w:
        pw = jnp.asarray(_pool_matrix_np(w, ow), dtype=x.dtype)
        x = jnp.einsum("qw,bhwc->bhqc", pw, x, precision=prec)
    return x
