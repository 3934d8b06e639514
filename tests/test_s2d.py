"""Space-to-depth stem conv must be EXACTLY equivalent to the plain stride-2
conv (same params, same math) — verified against lax.conv and torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from torchseg_tpu.ops.s2d import conv_stride2_s2d, use_s2d


@pytest.mark.parametrize("k,cin,cout", [(7, 3, 64), (3, 3, 32), (5, 4, 16)])
def test_matches_plain_conv(k, cin, cout):
    rng = np.random.default_rng(k)
    x = rng.normal(size=(2, 32, 48, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1

    want = lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(w),
        (2, 2),
        [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    got = conv_stride2_s2d(jnp.asarray(x), jnp.asarray(w))
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_use_s2d_heuristic():
    assert use_s2d(3, 2, 7)
    assert use_s2d(3, 2, 3)
    assert not use_s2d(64, 2, 3)  # dense channels: plain conv is fine
    assert not use_s2d(3, 1, 3)  # unstrided


def test_resnet_stem_uses_s2d_param_compatible():
    """The s2d stem stores the kernel at the same path/shape as the plain
    conv, so torch grafting and odd-size fallbacks share parameters."""
    from torchseg_tpu.models.resnet import resnet18

    m = resnet18()
    v_even = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    v_odd = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 63, 65, 3)))
    assert (
        v_even["params"]["conv1"]["kernel"].shape
        == v_odd["params"]["conv1"]["kernel"].shape
        == (7, 7, 3, 64)
    )
    # same variables usable at both sizes
    out_even = m.apply(v_even, jnp.zeros((1, 64, 64, 3)))
    out_odd = m.apply(v_even, jnp.zeros((1, 63, 65, 3)))
    assert out_even[0].shape[-1] == out_odd[0].shape[-1] == 64


def test_cpad_matches_plain_conv():
    from torchseg_tpu.ops.s2d import conv_stride2_cpad

    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 32, 48, 3)).astype(np.float32)
    w = rng.normal(size=(7, 7, 3, 16)).astype(np.float32) * 0.1
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(3, 3)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    got = conv_stride2_cpad(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_cpad_custom_wgrad_matches_autodiff():
    """The stacked-shift matmul weight gradient (conv_stride2_cpad_cv)
    must match the stock conv wgrad for both stems' shapes."""
    import jax

    from torchseg_tpu.ops.s2d import conv_stride2_cpad, conv_stride2_cpad_cv

    for k, hw in ((7, (32, 64)), (3, (16, 24))):
        rng = np.random.default_rng(k)
        x = jnp.asarray(rng.normal(size=(2, *hw, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, 3, 8)).astype(np.float32))
        ct = jnp.asarray(rng.normal(
            size=(2, hw[0] // 2, hw[1] // 2, 8)).astype(np.float32))

        y1, vjp1 = jax.vjp(conv_stride2_cpad, x, w)
        y2, vjp2 = jax.vjp(conv_stride2_cpad_cv, x, w)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        dx1, dw1 = vjp1(ct)
        dx2, dw2 = vjp2(ct)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,cin,cout", [(7, 3, 16), (3, 3, 8), (5, 4, 8)])
def test_s2d_rp_matches_plain_conv(k, cin, cout):
    """The row-parity s2d forward must equal the plain stride-2 conv (same
    math as conv_stride2_s2d, different construction schedule)."""
    from torchseg_tpu.ops.s2d import conv_stride2_s2d_rp

    rng = np.random.default_rng(k)
    x = rng.normal(size=(2, 32, 48, cin)).astype(np.float32)
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.1
    want = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (2, 2), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    got = conv_stride2_s2d_rp(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_s2d_rp_custom_vjp_matches_autodiff():
    """conv_stride2_s2d_cv: row-parity forward + matmul wgrad backward must
    match the stock strided-conv autodiff for both stem shapes."""
    import jax

    from torchseg_tpu.ops.s2d import conv_stride2_cpad, conv_stride2_s2d_cv

    for k, hw in ((7, (32, 64)), (3, (16, 24))):
        rng = np.random.default_rng(k)
        x = jnp.asarray(rng.normal(size=(2, *hw, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, 3, 8)).astype(np.float32))
        ct = jnp.asarray(rng.normal(
            size=(2, hw[0] // 2, hw[1] // 2, 8)).astype(np.float32))

        y1, vjp1 = jax.vjp(conv_stride2_cpad, x, w)
        y2, vjp2 = jax.vjp(conv_stride2_s2d_cv, x, w)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-4, atol=1e-4)
        dx1, dw1 = vjp1(ct)
        dx2, dw2 = vjp2(ct)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                                   rtol=1e-4, atol=1e-4)


def test_stem_fwd_s2d_flag_numerics():
    """S2DConv output with STEM_FWD_S2D on/off must agree (fp
    reassociation only) and fall back to cpad on odd spatial sizes."""
    from torchseg_tpu.ops import s2d

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    mod = s2d.S2DConv(features=16, ksize=7)
    vs = mod.init(jax.random.PRNGKey(0), x)
    old = s2d.STEM_FWD_S2D
    try:
        s2d.STEM_FWD_S2D = False
        y0 = mod.apply(vs, x)
        s2d.STEM_FWD_S2D = True
        y1 = mod.apply(vs, x)
        xo = jnp.asarray(rng.normal(size=(1, 31, 33, 3)).astype(np.float32))
        yo = mod.apply(vs, xo)  # odd sizes: must not assert, falls back
        assert yo.shape == (1, 16, 17, 16)
    finally:
        s2d.STEM_FWD_S2D = old
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
