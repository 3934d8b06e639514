"""Int8 post-training quantization (deploy/quantize.py): dequantization math,
calibration, skip rules, and end-to-end argmax agreement on a random net."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from torchseg_tpu.deploy.quantize import (
    DEFAULT_SKIP,
    calibrate,
    make_int8_infer,
    quantized_apply_fn,
)


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)], name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", name="c2")(x)
        x = nn.relu(x)
        return nn.Conv(8, (1, 1), name="head0/conv_1x1".replace("/", "_"))(x)


def _init(model, shape, seed=0):
    x = np.random.default_rng(seed).normal(size=shape).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return v, x


def test_single_conv_quantization_error_bound():
    """Quantized conv output must match float within the analytic int8
    error bound (scale ~ absmax/127 per tensor/channel)."""

    class One(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)],
                           name="c")(x)

    m = One()
    v, x = _init(m, (1, 16, 16, 4))
    want = np.asarray(m.apply(v, jnp.asarray(x)))
    scales = calibrate(m, v, [x])
    assert set(scales) == {"c"}
    got = np.asarray(
        quantized_apply_fn(m, scales, skip=())(v, jnp.asarray(x))
    )
    # error bound: |dx| <= s_in/2 per input element; conv of k*k*cin terms
    s_in = scales["c"] / 127.0
    w = np.asarray(v["params"]["c"]["kernel"])
    bound = (
        0.5 * s_in * np.abs(w).sum(axis=(0, 1, 2))  # activation rounding
        + 0.5 * (np.abs(w).max(axis=(0, 1, 2)) / 127.0)
        * np.abs(x).sum() / x.size * w.shape[0] * w.shape[1] * w.shape[2]
        * 4  # weight rounding, loose
    )
    err = np.abs(got - want).max(axis=(0, 1, 2))
    assert (err <= bound).all(), (err, bound)
    # and it genuinely quantized (outputs differ from float at f32 eps scale)
    assert np.abs(got - want).max() > 1e-6


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_skip_patterns_keep_layers_float():
    m = TinyNet()
    v, x = _init(m, (1, 16, 16, 3))
    scales = calibrate(m, v, [x])
    assert set(scales) == {"c1", "c2", "head0_conv_1x1"}
    full = quantized_apply_fn(m, scales, skip=())(v, jnp.asarray(x))
    part = quantized_apply_fn(m, scales, skip=(r"^c1$",))(v, jnp.asarray(x))
    ref = m.apply(v, jnp.asarray(x))
    # skipping c1 must move the result toward float
    assert float(jnp.abs(part - ref).max()) < float(jnp.abs(full - ref).max())


def test_bisenet_int8_argmax_agreement():
    """End-to-end on BiSeNet-R18.speed (random init): the int8 graph must
    agree with the float graph on the vast majority of pixels."""
    from torchseg_tpu import models

    model = models.bisenet_r18(num_classes=19, speed=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 128, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=True,
    )
    calib = [rng.normal(size=(1, 64, 128, 3)).astype(np.float32)
             for _ in range(2)]
    infer, scales = make_int8_infer(model, variables, calib)
    assert len(scales) > 20  # every conv in the net was calibrated
    got = np.asarray(infer(jnp.asarray(x)))
    want = np.asarray(
        jnp.argmax(model.apply(variables, jnp.asarray(x), train=False),
                   axis=-1)
    )
    assert got.shape == want.shape
    agreement = (got == want).mean()
    assert agreement > 0.9, agreement


def test_quantized_apply_is_jittable():
    m = TinyNet()
    v, x = _init(m, (1, 16, 16, 3))
    scales = calibrate(m, v, [x])
    fn = quantized_apply_fn(m, scales)
    jitted = jax.jit(lambda v, x: fn(v, x))
    out = jitted(v, jnp.asarray(x))
    assert out.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(fn(v, jnp.asarray(x))),
        rtol=1e-5, atol=1e-5,
    )
