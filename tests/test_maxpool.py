"""Scatter-free maxpool backward (ops/maxpool.py) must match the native
reduce_window vjp bit-for-bit — including first-in-scan-order tie routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchseg_tpu.ops.maxpool import max_pool_3x3_s2


def _native_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@pytest.mark.parametrize("hw", [(8, 8), (9, 13), (16, 32)])
def test_forward_matches_native(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *hw, 5)).astype(np.float32))
    np.testing.assert_array_equal(max_pool_3x3_s2(x), _native_pool(x))


@pytest.mark.parametrize("seed", [0, 1])
def test_grad_matches_native(seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 4)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(2, 8, 12, 4)).astype(np.float32))

    g_ours = jax.vjp(max_pool_3x3_s2, x)[1](ct)[0]
    g_nat = jax.vjp(_native_pool, x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_nat),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("hw", [(9, 13), (15, 16), (16, 15)])
def test_grad_matches_native_odd_sizes(hw):
    """The parity-plane backward neg-pads odd inputs to even; gradients
    must still match the native vjp exactly."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, *hw, 4)).astype(np.float32))
    oh, ow = (hw[0] + 1) // 2, (hw[1] + 1) // 2
    ct = jnp.asarray(rng.normal(size=(2, oh, ow, 4)).astype(np.float32))
    g_ours = jax.vjp(max_pool_3x3_s2, x)[1](ct)[0]
    g_nat = jax.vjp(_native_pool, x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_nat),
                               rtol=0, atol=1e-5)


def test_grad_tie_routing_matches_native():
    """Integer-valued floats force exact ties inside windows; the custom
    backward must route to the same (first-in-scan-order) element as XLA's
    select_and_scatter."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.integers(0, 3, (1, 12, 12, 3)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
    g_ours = jax.vjp(max_pool_3x3_s2, x)[1](ct)[0]
    g_nat = jax.vjp(_native_pool, x)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_nat),
                               rtol=0, atol=1e-5)


def test_value_and_grad_through_model_path():
    """Smoke the jit + grad path the backbones use."""

    def loss(x):
        return (max_pool_3x3_s2(x) ** 2).sum()

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 32, 32, 8)).astype(np.float32))
    val, grad = jax.jit(jax.value_and_grad(loss))(x)
    assert np.isfinite(float(val))
    assert grad.shape == x.shape


def test_grad_bf16_close_to_native():
    """In the bf16 train graph the backward accumulates in bf16 like the
    native select_and_scatter; only add-order rounding may differ."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)), jnp.bfloat16)
    ct = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.bfloat16)
    g_ours = jax.vjp(max_pool_3x3_s2, x)[1](ct)[0]
    g_nat = jax.vjp(lambda v: _native_pool(v), x)[1](ct)[0]
    assert g_ours.dtype == jnp.bfloat16
    d = np.abs(np.float32(g_ours) - np.float32(g_nat)).max()
    assert d <= 0.0625, d
