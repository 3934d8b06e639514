"""End-to-end integration (SURVEY.md §4d): a real (small) experiment model
trained on synthetic data across the 8-device mesh — loss decreases, OHEM loss
wiring works, and checkpoint-resume is step-exact."""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from torchseg_tpu.data.base import SyntheticDataset
from torchseg_tpu.data.loader import TrainLoader
from torchseg_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
from torchseg_tpu.engine.lr_policy import PolyLR
from torchseg_tpu.engine.optim import (
    make_lr_mult_tree,
    make_wd_tree,
    sgd_init,
    sgd_update,
)
from torchseg_tpu.engine.trainer import Trainer, make_data_mesh
from torchseg_tpu.experiments.registry import (
    build_loss_fn,
    build_model,
    build_preprocess,
    get_experiment,
)
import dataclasses
import pytest


def _tiny_cfg():
    cfg = get_experiment("cityscapes.bisenet.X39")  # from-scratch backbone
    return dataclasses.replace(
        cfg, image_height=32, image_width=32, batch_size=8, lr=5e-2
    )


def _setup(cfg):
    mesh = make_data_mesh(jax.devices()[:8])
    model = build_model(cfg, axis_name="data")
    loss_fn = build_loss_fn(cfg, num_shards=8)
    trainer = Trainer(
        model, loss_fn, PolyLR(cfg.lr, cfg.lr_power, 200),
        sgd_momentum=cfg.momentum, mesh=mesh,
    )
    pre = build_preprocess(cfg)
    ds = SyntheticDataset(
        num_items=16, image_hw=(48, 48), num_classes=cfg.num_classes,
        preprocess=pre,
    )
    loader = TrainLoader(ds, cfg.batch_size, num_workers=2, seed=0)
    return trainer, loader


def _jnp_batch(b):
    return {
        k: jnp.asarray(v) for k, v in b.items() if isinstance(v, np.ndarray)
    }


def test_bisenet_ohem_train_and_resume():
    cfg = _tiny_cfg()
    trainer, loader = _setup(cfg)
    loader.set_epoch(0)
    batches = [_jnp_batch(b) for b in loader]
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    trainer.configure_groups(
        make_lr_mult_tree(state.params, cfg.business_lr_mult),
        make_wd_tree(state.params, cfg.weight_decay),
    )

    losses = []
    mid_state = None
    for step in range(8):
        batch = batches[step % len(batches)]
        state, loss, _ = trainer.train_step(
            state, batch, jax.random.PRNGKey(100 + step)
        )
        losses.append(float(loss))
        if step == 3:
            with tempfile.TemporaryDirectory() as d:
                path = save_checkpoint(d, state, epoch=0)
                template = jax.tree.map(jnp.zeros_like, state)
                mid_state, _, _ = restore_checkpoint(path, template)

    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses

    # resume from the step-4 checkpoint and replay: must match exactly
    state2 = mid_state
    for step in range(4, 8):
        batch = batches[step % len(batches)]
        state2, loss2, _ = trainer.train_step(
            state2, batch, jax.random.PRNGKey(100 + step)
        )
        assert float(loss2) == losses[step], (step, float(loss2), losses[step])
    k1 = np.asarray(
        jax.tree.leaves(state.params)[0]
    )
    k2 = np.asarray(jax.tree.leaves(state2.params)[0])
    np.testing.assert_array_equal(k1, k2)


def test_standard_sgd_lr_scaled_momentum():
    """StandardSGD (reference seg_opr/sgd.py:29-50): lr enters the momentum
    buffer."""
    p = {"w": jnp.ones((3,))}
    g = {"w": jnp.full((3,), 2.0)}
    buf = sgd_init(p)
    # step1: buf = lr*g = 0.2 ; p = 1 - 0.2
    p1, buf = sgd_update(p, g, buf, 0.1, momentum=0.9,
                         lr_scaled_momentum=True)
    np.testing.assert_allclose(np.asarray(p1["w"]), 0.8, rtol=1e-6)
    # step2: buf = 0.9*0.2 + 0.2 = 0.38 ; p = 0.8 - 0.38
    p2, buf = sgd_update(p1, g, buf, 0.1, momentum=0.9,
                         lr_scaled_momentum=True)
    np.testing.assert_allclose(np.asarray(p2["w"]), 0.42, rtol=1e-6)


def test_parallel_helpers():
    from torchseg_tpu.parallel import make_data_mesh as mk, shard_batch

    mesh = mk(jax.devices()[:8])
    batch = {"image": jnp.zeros((16, 4, 4, 3))}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["image"].sharding.device_set) == 8


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_dfn_train_step_with_aux_labels():
    """DFN: CE smooth heads + focal border heads against the Canny aux label
    batch key, through the full shard_map step."""
    cfg = get_experiment("cityscapes.dfn.R101_v1c")
    cfg = dataclasses.replace(
        cfg, image_height=32, image_width=32, batch_size=8,
    )
    mesh = make_data_mesh(jax.devices()[:8])
    # slim backbone (r18) — same DFN wiring, minutes less CPU compile
    import functools
    from torchseg_tpu.models import DFN
    from torchseg_tpu.models.resnet import resnet18
    from torchseg_tpu.ops.norm import BatchNorm

    norm = functools.partial(BatchNorm, axis_name="data")
    model = DFN(cfg.num_classes, resnet18(norm=norm), smooth_inner=64,
                norm=norm)
    loss_fn = build_loss_fn(cfg, num_shards=8)
    trainer = Trainer(model, loss_fn, PolyLR(cfg.lr, cfg.lr_power, 100),
                      sgd_momentum=cfg.momentum, mesh=mesh)
    pre = build_preprocess(cfg)
    assert type(pre).__name__ == "DFNTrainPre"
    ds = SyntheticDataset(num_items=8, image_hw=(40, 40),
                          num_classes=cfg.num_classes, preprocess=pre)
    loader = TrainLoader(ds, 8, num_workers=2)
    loader.set_epoch(0)
    batch = _jnp_batch(next(iter(loader)))
    assert "aux_label" in batch
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, loss, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.slow  # heavy tier: whole-graph compile dominates (TESTING.md)
def test_pspnet_train_step_with_dropout():
    """PSPNet: dilated backbone + PPM + dropout rng + log-softmax CE."""
    cfg = get_experiment("ade.pspnet.R50_v1c")
    cfg = dataclasses.replace(
        cfg, image_height=48, image_width=48, batch_size=8,
    )
    mesh = make_data_mesh(jax.devices()[:8])
    # slim backbone (dilated r18) — same PPM/dropout/log-softmax wiring
    import functools
    from torchseg_tpu.models import PSPNet
    from torchseg_tpu.models.resnet import resnet18
    from torchseg_tpu.ops.norm import BatchNorm

    norm = functools.partial(BatchNorm, axis_name="data")
    model = PSPNet(
        cfg.num_classes,
        resnet18(norm=norm, layer_strides=(1, 2, 1, 1),
                 layer_dilations=(1, 1, 2, 4)),
        norm=norm,
    )
    loss_fn = build_loss_fn(cfg, num_shards=8)
    trainer = Trainer(model, loss_fn, PolyLR(cfg.lr, cfg.lr_power, 100),
                      sgd_momentum=cfg.momentum, mesh=mesh)
    pre = build_preprocess(cfg)
    ds = SyntheticDataset(num_items=8, image_hw=(56, 56),
                          num_classes=cfg.num_classes, preprocess=pre)
    loader = TrainLoader(ds, 8, num_workers=2)
    loader.set_epoch(0)
    batch = _jnp_batch(next(iter(loader)))
    assert int(batch["label"].min()) >= -1  # ADE shift applied
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, loss, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
