"""Parity tests (Pallas interpret mode on CPU) for the int8-through
serving kernels: fused s2d stem conv (+ vertical/horizontal maxpool) and
the quad-view 3x3/2 conv, each against the plain-XLA int8 path they
replace (deploy/int8_serve's bf16 stem + _requant + reduce-window and
_qconv + _requant).  Chip-exactness (same comparisons at serving size on
real TPU) is rechecked by scripts/ and the round-5 DESIGN.md table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torchseg_tpu.deploy.int8_serve import _maxpool_i8, _qconv, _requant
from torchseg_tpu.ops.pallas.int8_serve_kernels import (
    conv3x3s2_i8_quad,
    maxpool2d_3x3s2_i8,
    pack_conv3x3_weights,
    s2d_stem_conv_i8,
    s2d_stem_pool_i8,
    spatial_path_i8,
    spatial_path_shapes_ok,
    stem_pool_shapes_ok,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _stem_case(h2=32, w2=64, cin=12, cout=128, seed=0):
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.integers(-128, 128, (1, h2 + 3, w2 + 3, cin)),
                     jnp.int8)
    wf = jnp.asarray(rng.normal(size=(4, 4, cin, cout)) * 0.05,
                     jnp.bfloat16)
    m = jnp.asarray(rng.uniform(0.004, 0.02, (cout,)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(cout,)) * 2.0, jnp.float32)
    return xs, wf, m, c


def _stem_ref(xs, wf, m, c, n_sp):
    """The XLA bf16-stem path (make_int8_through_infer stem_mode='bf16')."""
    y = jax.lax.conv_general_dilated(
        xs.astype(jnp.bfloat16), wf, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    q = _requant(jnp.maximum(y * m + c, 0.0))
    return q[..., :n_sp], q[..., n_sp:]


def test_stem_conv_matches_xla_split():
    xs, wf, m, c = _stem_case()
    rsp, rbb = _stem_ref(xs, wf, m, c, 64)
    sp, bb = s2d_stem_conv_i8(xs, wf, m, c, 64)
    # f32 summation order may flip round-ties by one code on rare pixels
    assert np.abs(np.asarray(rsp, np.int32) - np.asarray(sp)).max() <= 1
    assert np.abs(np.asarray(rbb, np.int32) - np.asarray(bb)).max() <= 1
    assert (np.asarray(rsp) != np.asarray(sp)).mean() < 1e-3
    assert (np.asarray(rbb) != np.asarray(bb)).mean() < 1e-3


def test_stem_pool_matches_xla_stem_plus_maxpool():
    xs, wf, m, c = _stem_case(seed=1)
    rsp, rbb = _stem_ref(xs, wf, m, c, 64)
    rmp = _maxpool_i8(rbb, via="s8")
    assert stem_pool_shapes_ok(xs.shape, 128, 64)
    sp, pooled = s2d_stem_pool_i8(xs, wf, m, c, 64)
    assert np.abs(np.asarray(rsp, np.int32) - np.asarray(sp)).max() <= 1
    # max absorbs a +-1 tie flip only when that pixel wins the window
    assert np.abs(np.asarray(rmp, np.int32) - np.asarray(pooled)).max() <= 1
    assert (np.asarray(rmp) != np.asarray(pooled)).mean() < 1e-3


def test_stem_pool_quad_v3_matches_v2_views():
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        s2d_stem_pool_quad_i8,
    )

    xs, wf, m, c = _stem_case(seed=6)
    h2, w2 = xs.shape[1] - 3, xs.shape[2] - 3
    sp2, pl2 = s2d_stem_pool_i8(xs, wf, m, c, 64)
    spq, plq = s2d_stem_pool_quad_i8(xs, wf, m, c, 64)
    # the v3 outputs are the quad / paired VIEWS of the v2 tensors
    np.testing.assert_array_equal(
        np.asarray(sp2), np.asarray(spq).reshape(h2, w2, 64)[None])
    np.testing.assert_array_equal(
        np.asarray(pl2),
        np.asarray(plq).reshape(h2 // 2, w2 // 2, 64)[None])


def test_stem_pool_shape_gate():
    assert stem_pool_shapes_ok((1, 515, 1027, 12), 128, 64)
    assert not stem_pool_shapes_ok((1, 516, 1027, 12), 128, 64)  # h2=513
    assert not stem_pool_shapes_ok((1, 515, 1027, 12), 128, 32)
    assert not stem_pool_shapes_ok((2, 515, 1027, 12), 128, 64)


def test_maxpool_standalone_bit_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 128, (1, 16, 32, 64)), jnp.int8)
    ref = _maxpool_i8(x, via="s8")
    got = maxpool2d_3x3s2_i8(x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_conv3x3s2_quad_bit_exact_vs_qconv():
    rng = np.random.default_rng(3)
    hi, wi = 16, 32
    x = jnp.asarray(rng.integers(0, 128, (1, hi, wi, 64)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)
    m = jnp.asarray(rng.uniform(1e-4, 5e-4, (64,)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(64,)) * 0.5, jnp.float32)
    ref = _requant(jnp.maximum(
        _qconv(x, wq, 2, 1).astype(jnp.float32) * m + c, 0.0))
    wa, wb, wo = pack_conv3x3_weights(wq)
    got = conv3x3s2_i8_quad(
        x[0].reshape(hi, wi // 4, 256), wa, wb, wo, m, c, nr=2)
    got_std = np.asarray(got).reshape(hi // 2, wi // 2, 64)[None]
    # int8 codes in bf16 are exact; f32 accumulation exact below 2^24:
    # the kernel must be BIT-identical to the s32 _qconv path
    np.testing.assert_array_equal(np.asarray(ref), got_std)


def test_spatial_path_chain_bit_exact():
    rng = np.random.default_rng(4)
    h2, w2 = 16, 32
    assert spatial_path_shapes_ok(h2, w2)
    sp = jnp.asarray(rng.integers(0, 128, (1, h2, w2, 64)), jnp.int8)
    pkgs = []
    for s in range(2):
        wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)
        m = jnp.asarray(rng.uniform(1e-4, 5e-4, (64,)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(64,)) * 0.5, jnp.float32)
        wa, wb, wo = pack_conv3x3_weights(wq)
        pkgs.append({"w": wq, "m": m, "c": c,
                     "wa": wa, "wb": wb, "wo": wo})
    ref = sp
    for p in pkgs:
        ref = _requant(jnp.maximum(
            _qconv(ref, p["w"], 2, 1).astype(jnp.float32) * p["m"]
            + p["c"], 0.0))
    got = spatial_path_i8(sp, pkgs[0], pkgs[1])
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_l1_stage_bit_exact_vs_apply_block():
    from torchseg_tpu.deploy.int8_serve import _apply_block
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        l1_stage_i8_paired,
        pack_resblock_weights,
    )

    rng = np.random.default_rng(5)

    def mk_block(r):
        e = {}
        for conv in ("conv1", "conv2"):
            e[conv] = {
                "w": jnp.asarray(r.integers(-127, 128, (3, 3, 64, 64)),
                                 jnp.int8),
                "m": jnp.asarray(r.uniform(1e-5, 8e-5, (64,)),
                                 jnp.float32),
                "c": jnp.asarray(r.normal(size=(64,)) * 0.4, jnp.float32),
            }
        e["res_ratio"] = jnp.asarray(r.uniform(0.3, 0.9, (64,)),
                                     jnp.float32)
        return e

    e1, e2 = mk_block(rng), mk_block(rng)
    x = jnp.asarray(rng.integers(0, 128, (1, 8, 16, 64)), jnp.int8)
    ref = _apply_block(_apply_block(x, e1, 1), e2, 1)
    W, mc, rr = pack_resblock_weights(e1, e2)
    got = l1_stage_i8_paired(x, W, mc, rr, nr=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_spatial_path_shape_gate():
    assert spatial_path_shapes_ok(512, 1024)
    assert spatial_path_shapes_ok(384, 768)
    assert not spatial_path_shapes_ok(510, 1024)
    assert not spatial_path_shapes_ok(512, 1020)


def _mk_l2_blocks(rng):
    def mk_cbr(cin, cout, shape=(3, 3)):
        return {
            "w": jnp.asarray(
                rng.integers(-127, 128, shape + (cin, cout)), jnp.int8),
            "m": jnp.asarray(rng.uniform(1e-5, 8e-5, (cout,)), jnp.float32),
            "c": jnp.asarray(rng.normal(size=(cout,)) * 0.4, jnp.float32),
        }

    e0 = {"conv1": mk_cbr(64, 128), "conv2": mk_cbr(128, 128),
          "down": mk_cbr(64, 128, shape=(1, 1))}
    e1 = {"conv1": mk_cbr(128, 128), "conv2": mk_cbr(128, 128),
          "res_ratio": jnp.asarray(rng.uniform(0.3, 0.9), jnp.float32)}
    return e0, e1


def test_l2_stage_bit_exact_vs_apply_block():
    from torchseg_tpu.deploy.int8_serve import _apply_block
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        l2_stage_i8_from_paired,
        l2_stage_shapes_ok,
        pack_l2_weights,
    )

    rng = np.random.default_rng(7)
    e0, e1 = _mk_l2_blocks(rng)
    h4, w4 = 16, 32
    x = jnp.asarray(rng.integers(0, 128, (1, h4, w4, 64)), jnp.int8)
    ref = _apply_block(_apply_block(x, e0, 2), e1, 1)
    wc1, wd, w3, mc, rr = pack_l2_weights(e0, e1)
    assert l2_stage_shapes_ok(h4, w4, nr=4)
    got = l2_stage_i8_from_paired(
        x[0].reshape(h4, w4 // 2, 128), wc1, wd, w3, mc, rr, nr=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_l1_paired_out_is_the_paired_view():
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        l1_stage_i8_paired_view,
        pack_resblock_weights,
    )

    rng = np.random.default_rng(8)

    def mk_block(r):
        e = {}
        for conv in ("conv1", "conv2"):
            e[conv] = {
                "w": jnp.asarray(r.integers(-127, 128, (3, 3, 64, 64)),
                                 jnp.int8),
                "m": jnp.asarray(r.uniform(1e-5, 8e-5, (64,)),
                                 jnp.float32),
                "c": jnp.asarray(r.normal(size=(64,)) * 0.4, jnp.float32),
            }
        e["res_ratio"] = jnp.asarray(r.uniform(0.3, 0.9, (64,)),
                                     jnp.float32)
        return e

    e1, e2 = mk_block(rng), mk_block(rng)
    W, mc, rr = pack_resblock_weights(e1, e2)
    x = jnp.asarray(rng.integers(0, 128, (8, 8, 128)), jnp.int8)
    std = l1_stage_i8_paired_view(x, W, mc, rr, nr=4)
    raw = l1_stage_i8_paired_view(x, W, mc, rr, nr=4, paired_out=True)
    np.testing.assert_array_equal(
        np.asarray(std), np.asarray(raw).reshape(8, 16, 64)[None])


def test_l2_stage_shape_gate():
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        l2_stage_shapes_ok,
    )

    assert l2_stage_shapes_ok(256, 512, nr=8)   # 1024x2048 serving
    assert l2_stage_shapes_ok(16, 32, nr=4)
    assert not l2_stage_shapes_ok(20, 32, nr=4)  # h8=10 % 4 != 0
    assert not l2_stage_shapes_ok(16, 31, nr=4)  # odd width
    assert not l2_stage_shapes_ok(16, 32, nr=2)  # nr % 4 != 0


def _mk_down_blocks(rng, cin):
    def mk_cbr(ci, co, shape=(3, 3)):
        return {
            "w": jnp.asarray(
                rng.integers(-127, 128, shape + (ci, co)), jnp.int8),
            "m": jnp.asarray(rng.uniform(1e-5, 8e-5, (co,)), jnp.float32),
            "c": jnp.asarray(rng.normal(size=(co,)) * 0.4, jnp.float32),
        }

    e0 = {"conv1": mk_cbr(cin, 2 * cin), "conv2": mk_cbr(2 * cin, 2 * cin),
          "down": mk_cbr(cin, 2 * cin, shape=(1, 1))}
    e1 = {"conv1": mk_cbr(2 * cin, 2 * cin),
          "conv2": mk_cbr(2 * cin, 2 * cin),
          "res_ratio": jnp.asarray(rng.uniform(0.3, 0.9), jnp.float32)}
    return e0, e1


def test_l3_stage_bit_exact_vs_apply_block():
    """The generic down-stage kernel at cin=128 (ResNet-18 stage 3)."""
    from torchseg_tpu.deploy.int8_serve import _apply_block
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        down_stage_i8_from_paired,
        down_stage_shapes_ok,
        pack_down_stage_weights,
    )

    rng = np.random.default_rng(11)
    e0, e1 = _mk_down_blocks(rng, 128)
    h8, w8 = 8, 16
    x = jnp.asarray(rng.integers(0, 128, (1, h8, w8, 128)), jnp.int8)
    ref = _apply_block(_apply_block(x, e0, 2), e1, 1)
    wc1, wd, w3, mc, rr = pack_down_stage_weights(e0, e1)
    assert down_stage_shapes_ok(h8, w8, nr=4)
    got = down_stage_i8_from_paired(
        x[0].reshape(h8, w8 // 2, 256), wc1, wd, w3, mc, rr, nr=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_l4_split_kernels_bit_exact_vs_apply_block():
    """The L4 two-kernel split (down block + res block) at cin=256."""
    from torchseg_tpu.deploy.int8_serve import _apply_block
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        down_block_i8_from_paired,
        pack_down_block_weights,
        pack_res_block1_weights,
        res_block_i8_std,
    )

    rng = np.random.default_rng(13)
    e0, e1 = _mk_down_blocks(rng, 256)
    h16, w16 = 8, 16
    x = jnp.asarray(rng.integers(0, 128, (1, h16, w16, 256)), jnp.int8)
    ref = _apply_block(_apply_block(x, e0, 2), e1, 1)
    wc1, wd, wc2, dmc = pack_down_block_weights(e0)
    rw, rmc, rrr = pack_res_block1_weights(e1)
    y = down_block_i8_from_paired(
        x[0].reshape(h16, w16 // 2, 512), wc1, wd, wc2, dmc, nr=4)
    np.testing.assert_array_equal(
        np.asarray(_apply_block(x, e0, 2)), np.asarray(y))
    got = res_block_i8_std(y, rw, rmc, rrr, nr=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_l2_to_l3_chain_via_free_pair_view():
    """L2 kernel std output -> row-major pair reshape -> L3 kernel ==
    the four chained _apply_block calls."""
    from torchseg_tpu.deploy.int8_serve import _apply_block
    from torchseg_tpu.ops.pallas.int8_serve_kernels import (
        down_stage_i8_from_paired,
        pack_down_stage_weights,
    )

    rng = np.random.default_rng(12)
    e2_0, e2_1 = _mk_l2_blocks(rng)
    e3_0, e3_1 = _mk_down_blocks(rng, 128)
    h4, w4 = 16, 32
    x = jnp.asarray(rng.integers(0, 128, (1, h4, w4, 64)), jnp.int8)
    ref = _apply_block(_apply_block(x, e2_0, 2), e2_1, 1)
    ref = _apply_block(_apply_block(ref, e3_0, 2), e3_1, 1)
    p2 = pack_down_stage_weights(e2_0, e2_1)
    p3 = pack_down_stage_weights(e3_0, e3_1)
    mid = down_stage_i8_from_paired(
        x[0].reshape(h4, w4 // 2, 128), *p2, nr=4)
    h8, w8 = mid.shape[1], mid.shape[2]
    got = down_stage_i8_from_paired(
        mid[0].reshape(h8, w8 // 2, 256), *p3, nr=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
