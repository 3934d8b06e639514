"""Spatial partitioning (parallel/spatial.py): the GSPMD dp x sp train
step must be numerically the single-device global-batch step — XLA's
SPMD partitioner owns the conv halo exchange and BN/loss reductions, so
sharding must not change the math."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from torchseg_tpu.engine.lr_policy import PolyLR
from torchseg_tpu.engine.optim import (
    make_lr_mult_tree,
    make_wd_tree,
    sgd_update,
)
from torchseg_tpu.engine.trainer import TrainState
from torchseg_tpu.experiments.registry import (
    build_loss_fn,
    build_model,
    get_experiment,
)
from torchseg_tpu.ops.losses import cross_entropy_with_ignore
from torchseg_tpu.parallel import (
    SpatialTrainer,
    make_dp_sp_mesh,
    space_unshard_interceptor,
)

pytestmark = pytest.mark.slow  # heavy tier: see TESTING.md


def _tiny_batch(cfg, b=4, hw=32, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(b, hw, hw, 3)).astype(np.float32)
    labels = rng.integers(0, cfg.num_classes, (b, hw, hw)).astype(np.int32)
    return {"image": jnp.asarray(images), "label": jnp.asarray(labels)}


def test_dp_sp_mesh_shape_and_validation():
    mesh = make_dp_sp_mesh(2, 2)
    assert mesh.shape == {"data": 2, "space": 2}
    with pytest.raises(ValueError, match="devices"):
        make_dp_sp_mesh(8, 2)


def test_spatial_step_matches_single_device():
    """2 steps of the 2x2 dp x sp GSPMD trainer == 2 unsharded steps on
    the same global batch (same init, same dropout key): loss AND params.

    Plain CE loss: OHEM's hard-example *selection* is discrete, so the
    reduction-order float noise between sharded and unsharded sums flips
    boundary pixels in/out of the kept set (covered by the looser OHEM
    smoke test below); CE pins the GSPMD numerics as tightly as f32
    allows.

    Tolerance calibration (measured, this toolchain): reassociation of
    the BN batch-stat reductions compounds through ~30 BN layers to a
    worst-leaf gradient deviation of 8.8e-3 at this toy scale — for
    PURE 1-D data parallelism (dp4, no space axis), which only reorders
    psums, the same 8.8e-3 at the same leaf.  That is the noise floor
    any multi-device run eats vs a single-device oracle here; the
    asserts below sit just above it.  The unmitigated XLA diamond
    miscompile (test_xla_diamond_wgrad_mitigated) showed 30x wrong
    gradients — 3+ orders of magnitude above these bounds."""
    cfg = get_experiment("cityscapes.bisenet.R18")
    model = build_model(cfg, axis_name=None)  # global-batch BN

    def loss_fn(outs, batch):
        total = 0.0
        for k in sorted(outs):
            total = total + cross_entropy_with_ignore(
                outs[k], batch["label"], cfg.ignore_label)
        return total

    batch = _tiny_batch(cfg, b=4, hw=32)

    tr = SpatialTrainer(
        model, loss_fn, PolyLR(cfg.lr, cfg.lr_power, 100),
        sgd_momentum=cfg.momentum, mesh=make_dp_sp_mesh(2, 2),
        donate=False,
    )
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    tr.configure_groups(
        make_lr_mult_tree(state.params, cfg.business_lr_mult),
        make_wd_tree(state.params, cfg.weight_decay),
    )

    # unsharded oracle: same math, plain jit on one device
    lr_schedule = PolyLR(cfg.lr, cfg.lr_power, 100)

    def step(state, batch, key):
        def loss_wrapped(params, stats):
            outs, mut = model.apply(
                {"params": params, "batch_stats": stats},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return loss_fn(outs, batch), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params, state.batch_stats)
        lr = lr_schedule(state.step)
        params, mom = sgd_update(
            state.params, grads, state.momentum, lr,
            momentum=cfg.momentum, lr_mult=tr.lr_mult, wd=tr.wd,
        )
        return TrainState(params, stats, mom, state.step + 1), loss

    oracle_step = jax.jit(step)
    ref_state = TrainState(state.params, state.batch_stats,
                           state.momentum, state.step)

    for i in range(2):
        key = jax.random.PRNGKey(10 + i)
        state, loss_sp, _ = tr.train_step(state, batch, key)
        ref_state, loss_ref = oracle_step(ref_state, batch, key)
        np.testing.assert_allclose(float(loss_sp), float(loss_ref),
                                   rtol=3e-3)

    # Per-leaf max-deviation budget (not element-wise rtol): after 2
    # momentum steps the params hold lr-compounded noise-floor gradient
    # deviations, and maxpool max-selection flips between values within
    # float noise re-route whole gradients at single elements (measured
    # mitigated worst |diff| 1.1e-2; unmitigated ~7 — 200x the budget).
    # The tight gradient-level check lives in
    # test_spatial_step_small_features_at_noise_floor.
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(state.params)):
        assert float(np.abs(np.asarray(b) - np.asarray(a)).max()) < 0.03


def test_spatial_step_ohem_smoke():
    """Registry OHEM loss under dp x sp: one step runs and lands within
    1% of the unsharded loss (hard-example selection is discrete, so
    exact equality is not expected — see the CE parity test above)."""
    cfg = get_experiment("cityscapes.bisenet.R18")
    model = build_model(cfg, axis_name=None)
    loss_fn = build_loss_fn(cfg, num_shards=1)
    batch = _tiny_batch(cfg, b=4, hw=32)

    tr = SpatialTrainer(
        model, loss_fn, PolyLR(cfg.lr, cfg.lr_power, 100),
        sgd_momentum=cfg.momentum, mesh=make_dp_sp_mesh(2, 2),
        donate=False,
    )
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(10)
    _, loss_sp, _ = tr.train_step(state, batch, key)

    def unsharded_loss(params, stats):
        outs, _ = model.apply(
            {"params": params, "batch_stats": stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        return loss_fn(outs, batch)

    loss_ref = jax.jit(unsharded_loss)(state.params, state.batch_stats)
    assert np.isfinite(float(loss_sp))
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-2)


def test_xla_diamond_wgrad_mitigated():
    """Pin the XLA SPMD miscompile (parallel/spatial.py docstring) and its
    mitigation.  The wgrad of a linear conv "diamond" — stride-2 conv ->
    stride-1 conv, summed with a 1x1/2 projection of the same input (every
    ResNet downsample block) — is silently wrong on a dp2 x sp2 mesh when
    the strided output has one row per space shard (jax 0.9.0, CPU SPMD).
    Constraining the small activations to P("data") (what
    space_unshard_interceptor does for whole models) restores exactness.
    If the UNMITIGATED branch starts passing, the upstream bug is fixed
    and the interceptor can be retired to a pure perf role."""
    mesh = make_dp_sp_mesh(2, 2)
    repl = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data", "space"))
    rng = np.random.default_rng(0)
    c = 16
    x = jnp.asarray(rng.normal(size=(4, 4, 4, c)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(3, 3, c, c)) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(3, 3, c, c)) * 0.1).astype(np.float32))
    wd = jnp.asarray((rng.normal(size=(1, 1, c, c)) * 0.1).astype(np.float32))

    def conv(v, w, s, pad):
        return jax.lax.conv_general_dilated(
            v, w, (s, s), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def make_loss(mitigate):
        def loss_of(w1, x):
            t = conv(x, w1, 2, 1)
            if mitigate:
                # the interceptor constrains EVERY small module output;
                # both constraints are needed to steer the partitioner off
                # the miscompiled program
                t = jax.lax.with_sharding_constraint(
                    t, NamedSharding(mesh, P("data")))
            y = conv(t, w2, 1, 1) + conv(x, wd, 2, 0)
            if mitigate:
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, P("data")))
            return jnp.sum(y ** 2)
        return loss_of

    oracle = np.asarray(jax.jit(jax.grad(make_loss(False)))(w1, x))
    grads = {}
    for mitigate in (False, True):
        f = jax.jit(jax.grad(make_loss(mitigate)), in_shardings=(repl, shd))
        grads[mitigate] = np.asarray(
            f(jax.device_put(w1, repl), jax.device_put(x, shd)))

    rel = np.abs(grads[True] - oracle).max() / np.abs(oracle).max()
    assert rel < 1e-5, f"mitigated wgrad off by rel {rel}"
    # document the live upstream bug; alert (xfail-style) when it heals
    rel_bad = np.abs(grads[False] - oracle).max() / np.abs(oracle).max()
    assert rel_bad > 1e-2, (
        "XLA diamond wgrad bug appears FIXED upstream (rel "
        f"{rel_bad}); consider relaxing space_unshard_interceptor")


def test_spatial_step_small_features_at_noise_floor():
    """Full-model mitigation check against a TRUE single-device oracle
    (no interceptor — a with_sharding_constraint in the oracle would
    silently promote it onto the mesh).  The mitigated dp x sp gradients
    must sit at the pure-DP reassociation noise floor (measured 8.8e-3
    worst leaf for BOTH dp4-only and mitigated dp2 x sp2 — same leaf);
    the unmitigated model's conv1 grads were off by rel ~30 at hw=32."""
    cfg = get_experiment("cityscapes.bisenet.R18")
    model = build_model(cfg, axis_name=None)
    batch = _tiny_batch(cfg, b=4, hw=32)
    mesh = make_dp_sp_mesh(2, 2)
    key = jax.random.PRNGKey(7)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["image"][:1], train=True)
    ignore = cfg.ignore_label

    def make_loss(mitigate):
        def loss_of(params, stats, image, label):
            from flax import linen as fnn
            ctx = (fnn.intercept_methods(space_unshard_interceptor(mesh))
                   if mitigate else contextlib.nullcontext())
            with ctx:
                outs, _ = model.apply(
                    {"params": params, "batch_stats": stats}, image,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": key})
            return sum(cross_entropy_with_ignore(outs[k], label, ignore)
                       for k in sorted(outs))
        return loss_of

    p, s = variables["params"], variables["batch_stats"]
    oracle = jax.jit(jax.grad(make_loss(False)))(
        p, s, batch["image"], batch["label"])

    repl = NamedSharding(mesh, P())
    shd3 = NamedSharding(mesh, P("data", "space"))
    f = jax.jit(jax.grad(make_loss(True)),
                in_shardings=(repl, repl, shd3, shd3))
    sharded = f(jax.device_put(p, repl), jax.device_put(s, repl),
                jax.device_put(batch["image"], shd3),
                jax.device_put(batch["label"], shd3))
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(oracle)[0],
            jax.tree_util.tree_flatten_with_path(sharded)[0]):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(a).max()), 1e-3)
        assert float(np.abs(a - b).max()) / scale < 3e-2, (
            jax.tree_util.keystr(path), float(np.abs(a - b).max()), scale)


def test_train_cli_sp(tmp_path):
    """torchseg-train --sp 2: full CLI run on the dp4 x sp2 mesh —
    synthetic data, one epoch, checkpoint written."""
    from torchseg_tpu.train import main

    state = main([
        "-e", "cityscapes.bisenet.R18", "--synthetic", "--epochs", "1",
        "--iters", "2", "--batch-size", "4", "--crop", "32", "32",
        "--num-workers", "1", "--log-dir", str(tmp_path), "--sp", "2",
    ])
    assert int(state.step) == 2
    snap = tmp_path / "cityscapes.bisenet.R18" / "snapshot"
    assert (snap / "epoch-0.ckpt").exists()
    assert (snap / "epoch-last.ckpt").exists()


def test_spatial_step_validates_divisibility():
    cfg = get_experiment("cityscapes.bisenet.R18")
    model = build_model(cfg, axis_name=None)
    loss_fn = build_loss_fn(cfg, num_shards=1)
    tr = SpatialTrainer(model, loss_fn, PolyLR(0.01, 0.9, 10),
                        mesh=make_dp_sp_mesh(2, 2))
    bad = _tiny_batch(cfg, b=3, hw=32)
    state = tr.init_state(jax.random.PRNGKey(0), bad)
    with pytest.raises(ValueError, match="divisible by the data axis"):
        tr.train_step(state, bad, jax.random.PRNGKey(1))


def test_sp_lr_scales_by_data_axis_not_mesh(tmp_path, monkeypatch):
    """lr_scale_by_world must multiply by the DATA-parallel width (the
    reference's world_size = #replicas), not dp*sp: spatial shards split
    one image's height, they don't enlarge the global batch."""
    import torchseg_tpu.train as train_mod

    captured = {}

    class _Sentinel(Exception):
        pass

    real_polylr = train_mod.PolyLR

    def spy(base_lr, power, total):
        captured["base_lr"] = float(base_lr)
        raise _Sentinel  # abort before any compile — we only need the lr

    monkeypatch.setattr(train_mod, "PolyLR", spy)
    cfg = get_experiment("voc.fcn32s.R101_v1c")
    assert cfg.lr_scale_by_world
    with pytest.raises(_Sentinel):
        train_mod.main([
            "-e", "voc.fcn32s.R101_v1c", "--synthetic", "--epochs", "1",
            "--iters", "1", "--batch-size", "8", "--crop", "32", "32",
            "--num-workers", "1", "--log-dir", str(tmp_path), "--sp", "2",
        ])
    n_dev = len(jax.devices())
    dp = n_dev // 2
    assert captured["base_lr"] == pytest.approx(cfg.lr * dp)
    # and without --sp the full mesh is the data axis, as before
    with pytest.raises(_Sentinel):
        train_mod.main([
            "-e", "voc.fcn32s.R101_v1c", "--synthetic", "--epochs", "1",
            "--iters", "1", "--batch-size", "8", "--crop", "32", "32",
            "--num-workers", "1", "--log-dir", str(tmp_path),
        ])
    assert captured["base_lr"] == pytest.approx(cfg.lr * n_dev)
    monkeypatch.setattr(train_mod, "PolyLR", real_polylr)


def test_whole_eval_spatial_matches_single_device():
    """Whole-protocol GSPMD eval (Evaluator(spatial_shards=4), eval.py
    --sp): the image height sharded over a ("space",) mesh — XLA inserts
    the conv halos — must give the single-device prediction up to
    fp-reassociation argmax ties.  Also covers a height (72) the mesh
    does not divide (GSPMD pads uneven shards)."""
    from torchseg_tpu.engine.evaluator import Evaluator

    cfg = get_experiment("cityscapes.bisenet.R18")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    common = (apply_fn, variables, cfg.num_classes, cfg.image_mean,
              cfg.image_std)
    ev1 = Evaluator(*common)
    evs = Evaluator(*common, spatial_shards=4)
    rng = np.random.default_rng(5)
    for hw in ((64, 128), (72, 96)):
        img = rng.integers(0, 255, (*hw, 3)).astype(np.uint8)
        p1 = ev1.whole_eval(img, output_size=hw)
        ps = evs.whole_eval(img, output_size=hw)
        assert p1.shape == ps.shape == hw
        assert (p1 == ps).mean() > 0.999, (p1 == ps).mean()


def test_space_variables_cached_and_swap_safe():
    """The replicated weight copy on the space mesh is made ONCE per
    weight swap (not per image), and a swap (eval.py's epoch sweep
    reassigns ev.variables) refreshes it — the round-2 shard-crops
    stale-weights class of bug, pinned for the spatial path."""
    from torchseg_tpu.engine.evaluator import Evaluator

    cfg = get_experiment("cityscapes.bisenet.R18")
    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    v0 = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    rngs2 = {"params": jax.random.PRNGKey(7),
             "dropout": jax.random.PRNGKey(8)}
    v1 = model.init(rngs2, jnp.zeros((1, 64, 128, 3)), train=True)

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    ev = Evaluator(apply_fn, v0, cfg.num_classes, cfg.image_mean,
                   cfg.image_std, spatial_shards=4)
    img = np.random.default_rng(3).integers(
        0, 255, (64, 128, 3)).astype(np.uint8)
    p0 = ev.whole_eval(img, output_size=(64, 128))
    cached = ev._sp_vars
    ev.whole_eval(img, output_size=(64, 128))
    assert ev._sp_vars is cached  # no re-transfer for the same weights
    ev.variables = v1  # checkpoint swap
    p1 = ev.whole_eval(img, output_size=(64, 128))
    assert ev._sp_vars is not cached
    assert (p0 != p1).any()  # new weights actually used

    # single-device oracle for the swapped weights
    ev1 = Evaluator(apply_fn, v1, cfg.num_classes, cfg.image_mean,
                    cfg.image_std)
    assert (p1 == ev1.whole_eval(img, output_size=(64, 128))).mean() > 0.999


def test_spatial_shards_validation():
    from torchseg_tpu.engine.evaluator import Evaluator

    with pytest.raises(ValueError, match="mutually exclusive"):
        Evaluator(lambda v, x: x, {}, 3, (0, 0, 0), (1, 1, 1),
                  devices=jax.devices()[:4], shard_crops=True,
                  spatial_shards=2)
    with pytest.raises(ValueError, match="devices"):
        Evaluator(lambda v, x: x, {}, 3, (0, 0, 0), (1, 1, 1),
                  spatial_shards=99)
