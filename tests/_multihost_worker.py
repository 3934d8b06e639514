"""Worker process for the 2-process multi-host integration test
(tests/test_multihost.py). Runs the REAL Trainer + Evaluator + gather
paths over a global mesh spanning both processes."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import functools

    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from torchseg_tpu.data.base import SyntheticDataset
    from torchseg_tpu.engine.evaluator import Evaluator
    from torchseg_tpu.engine.lr_policy import PolyLR
    from torchseg_tpu.engine.trainer import Trainer, make_data_mesh
    from torchseg_tpu.ops.blocks import ConvBnRelu
    from torchseg_tpu.ops.losses import cross_entropy_with_ignore
    from torchseg_tpu.ops.norm import BatchNorm
    from torchseg_tpu.parallel import gather_metrics, shard_batch

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 per process, global mesh of 4

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            norm = functools.partial(BatchNorm, axis_name="data")
            x = ConvBnRelu(8, 3, 1, 1, norm=norm, name="c1")(x, train)
            return {"main": nn.Conv(3, (1, 1), name="out")(x)}

    def loss_fn(outs, batch):
        return cross_entropy_with_ignore(outs["main"], batch["label"], 255)

    mesh = make_data_mesh()  # all 4 global devices
    trainer = Trainer(Tiny(), loss_fn, PolyLR(0.2, 0.9, 100), mesh=mesh,
                      donate=False)

    # every process builds the SAME global batch (synthetic data, fixed
    # seed); shard_batch slices out the local shards
    rng = np.random.default_rng(0)
    images = rng.normal(size=(8, 8, 8, 3)).astype(np.float32)
    labels = (images[..., 0] > 0).astype(np.int32)
    batch = shard_batch({"image": images, "label": labels}, mesh)

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    for i in range(4):
        state, loss, _ = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(10 + i))
        losses.append(float(loss))

    # per-process sharded eval + cross-process accumulator merge
    model = Tiny()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ev = Evaluator(
        lambda v, x: jax.nn.log_softmax(
            model.apply(v, x, train=False)["main"], axis=-1
        ),
        variables, 3, np.zeros(3, np.float32), np.ones(3, np.float32),
    )
    ds = SyntheticDataset(num_items=6, image_hw=(8, 8), num_classes=3)
    acc = ev.run_dataset(ds, mode="whole")  # shards by process automatically
    local_pixels = int(acc.hist.sum())
    merged = gather_metrics(acc.hist)

    # dp2 x sp2 leg over the SAME cross-process mesh: GSPMD spatial
    # trainer (parallel/spatial.py) with the batch on "data" (spanning
    # both processes) and image height on "space" — the gloo/DCN
    # counterpart of the single-process dp x sp dryrun
    from torchseg_tpu.parallel import SpatialTrainer, make_dp_sp_mesh

    sp_mesh = make_dp_sp_mesh(2, 2)  # all 4 global devices

    class TinyG(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            # axis_name=None: GSPMD global-batch BN (SpatialTrainer rule)
            x = ConvBnRelu(8, 3, 1, 1, norm=BatchNorm, name="c1")(x, train)
            return {"main": nn.Conv(3, (1, 1), name="out")(x)}

    sp_trainer = SpatialTrainer(TinyG(), loss_fn, PolyLR(0.2, 0.9, 100),
                                mesh=sp_mesh)
    # multihost: lift the (identical) host batches into GLOBAL arrays on
    # the cross-process mesh — numpy inputs cannot take non-addressable
    # shardings
    from torchseg_tpu.parallel.spatial import batch_shardings

    hbatch = {"image": images, "label": labels}
    gbatch = jax.tree.map(
        lambda x, sh: jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx]),
        hbatch, batch_shardings(sp_mesh, hbatch))
    sp_state = sp_trainer.init_state(jax.random.PRNGKey(0),
                                     {"image": images[:1]})
    sp_losses = []
    for i in range(4):
        sp_state, sp_loss, _ = sp_trainer.train_step(
            sp_state, gbatch, jax.random.PRNGKey(20 + i))
        sp_losses.append(float(sp_loss))

    print(json.dumps({
        "pid": pid,
        "losses": losses,
        "local_pixels": local_pixels,
        "merged_pixels": int(merged.sum()),
        "sp_losses": sp_losses,
    }), flush=True)


if __name__ == "__main__":
    main()
