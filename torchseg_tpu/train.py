"""Training entrypoint — the single CLI replacing the reference's per-
experiment ``train.py`` scripts + ``torch.distributed.launch`` (SURVEY.md
§3.1): one process drives the whole device mesh via shard_map; multi-host
pods initialize jax.distributed and run the same script per host.

Usage:
  python -m torchseg_tpu.train -e cityscapes.bisenet.R18 \
      --img-root /data/cityscapes --gt-root /data/cityscapes \
      --train-source /data/cityscapes/config_new/train.txt
  python -m torchseg_tpu.train -e cityscapes.bisenet.R18 --synthetic \
      --epochs 1 --iters 10          # smoke run without data
  ... -c log/<exp>/snapshot/epoch-last.ckpt   # resume
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .data.base import SyntheticDataset
from .data.loader import TrainLoader
from .engine.checkpoint import restore_checkpoint, save_checkpoint
from .engine.logger import get_logger
from .engine.lr_policy import PolyLR
from .engine.optim import make_lr_mult_tree, make_wd_tree
from .engine.trainer import Trainer, make_data_mesh
from .experiments.registry import (
    DATASETS,
    build_loss_fn,
    build_model,
    build_preprocess,
    get_experiment,
)


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("--img-root", default=None)
    p.add_argument("--gt-root", default=None)
    p.add_argument("--train-source", default=None)
    p.add_argument("--eval-source", default=None)
    p.add_argument("-c", "--continue-from", dest="continue_from", default=None)
    p.add_argument("--log-dir", default="log")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke/bench)")
    p.add_argument("--epochs", type=int, default=None, help="override nepochs")
    p.add_argument("--iters", type=int, default=None,
                   help="override niters_per_epoch")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--crop", type=int, nargs=2, default=None,
                   metavar=("H", "W"), help="override train crop size")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: split each shard's batch "
                        "into N sequential microbatches (activation-memory "
                        "lever for big crops)")
    p.add_argument("--device-augment", action="store_true",
                   help="run mirror/scale/crop/normalize on the TPU "
                        "(uniform-size datasets, e.g. Cityscapes)")
    p.add_argument("--pretrained", default=None,
                   help="torch .pth backbone checkpoint to graft")
    p.add_argument("--orbax", action="store_true",
                   help="async preemption-safe Orbax checkpointing "
                        "(engine/checkpoint_orbax.py) instead of msgpack")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial-parallel mesh axis: shard image height "
                        "over SP devices (mesh = data x space, "
                        "parallel/spatial.py) — for crops/batches too "
                        "large for pure data parallelism")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address for "
                        "jax.distributed.initialize")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from .utils.misc import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the ~1 min compile
    cfg = get_experiment(args.experiment)
    if args.crop:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, image_height=args.crop[0], image_width=args.crop[1]
        )
    logger = get_logger(
        os.path.join(args.log_dir, cfg.name),
        f"log_{time.strftime('%Y_%m_%d_%H_%M_%S')}.log",
    )

    if args.num_processes:
        from .parallel import initialize_multihost

        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)

    nepochs = args.epochs or cfg.nepochs
    niters = args.iters or cfg.niters_per_epoch
    batch_size = args.batch_size or cfg.batch_size

    sp = args.sp
    if sp > 1:
        from .parallel import make_dp_sp_mesh

        n_total = len(jax.devices())
        if n_total % sp:
            raise ValueError(f"--sp {sp} does not divide {n_total} devices")
        if args.accum_steps != 1:
            raise SystemExit("--sp does not support --accum-steps; the "
                             "space axis already multiplies the per-step "
                             "memory headroom")
        if args.device_augment:
            raise SystemExit("--sp does not support --device-augment "
                             "(host preprocessing feeds the dp x sp mesh)")
        if cfg.image_height % sp:
            raise ValueError(
                f"crop height {cfg.image_height} not divisible by sp={sp}")
        mesh = make_dp_sp_mesh(n_total // sp, sp)
        dp = n_total // sp
        if batch_size % dp:
            raise ValueError(
                f"batch {batch_size} not divisible by data axis {dp}")
        n_dev = n_total
    else:
        mesh = make_data_mesh()
        n_dev = mesh.devices.size
        dp = n_dev
        if batch_size % n_dev:
            raise ValueError(
                f"batch {batch_size} not divisible by {n_dev} devices")
    logger.info("experiment %s on %d device(s): %s%s", cfg.name, n_dev,
                jax.devices()[0].platform,
                f" (mesh data={n_dev // sp} x space={sp})" if sp > 1 else "")

    dtype = jnp.bfloat16 if args.bf16 else None
    # sp mode: GSPMD global-batch BN (axis_name=None) — the partitioner's
    # cross-device stat reduction IS SyncBN; shard_map mode does the pmean
    # explicitly over "data"
    model = build_model(cfg, axis_name=None if sp > 1 else "data",
                        dtype=dtype)
    # OHEM min_kept follows the per-forward batch (the reference's per-GPU
    # rule, train.py:48-52): with grad accumulation each forward sees
    # batch / (devices * accum_steps) images.  The GSPMD sp trainer's loss
    # sees the GLOBAL batch, so num_shards=1 keeps the reference's kept
    # FRACTION (min_kept scales with the forward's batch either way).
    loss_fn = build_loss_fn(
        cfg, num_shards=1 if sp > 1 else n_dev * args.accum_steps)
    device_aug = None
    if args.device_augment:
        from .data.device_augment import make_device_augment

        if cfg.preprocess == "dfn":
            raise SystemExit(
                "--device-augment does not support DFN experiments: the DFN "
                "pipeline derives Canny border aux labels on the host "
                "(data/preprocess.py DFNTrainPre); drop --device-augment"
            )
        preprocess = None  # host only decodes; TPU does the transforms
        device_aug = make_device_augment(
            (cfg.image_height, cfg.image_width),
            cfg.train_scale_array or (1.0,),
            cfg.image_mean,
            cfg.image_std,
            gt_pad=cfg.ignore_label if cfg.ignore_label >= 0 else 255,
            gt_down=cfg.gt_down_sampling,
        )
    else:
        preprocess = build_preprocess(cfg)

    if args.synthetic:
        dataset = SyntheticDataset(
            num_items=batch_size * niters,
            image_hw=(cfg.image_height, cfg.image_width),
            num_classes=cfg.num_classes,
            preprocess=preprocess,
        )
    else:
        ds_cls = DATASETS[cfg.dataset]
        setting = {
            "img_root": args.img_root,
            "gt_root": args.gt_root or args.img_root,
            "train_source": args.train_source,
            "eval_source": args.eval_source or args.train_source,
        }
        dataset = ds_cls(setting, "train", preprocess,
                         file_length=batch_size * niters)

    loader = TrainLoader(dataset, batch_size, num_workers=args.num_workers,
                         seed=args.seed)

    base_lr = cfg.lr
    if cfg.lr_scale_by_world:
        # the reference scales base_lr by the number of data-parallel shards
        # (engine.world_size = #GPUs, fcn train.py:60-62); on TPU that is the
        # DATA axis width — spatial shards split one image's height, not the
        # batch, so they must not inflate the lr
        base_lr = cfg.lr * dp * 1.0  # FCN rule
    lr_schedule = PolyLR(base_lr, cfg.lr_power, nepochs * niters)

    if sp > 1:
        from .parallel import SpatialTrainer

        trainer = SpatialTrainer(
            model,
            loss_fn,
            lr_schedule,
            sgd_momentum=cfg.momentum,
            mesh=mesh,
        )
    else:
        trainer = Trainer(
            model,
            loss_fn,
            lr_schedule,
            sgd_momentum=cfg.momentum,
            mesh=mesh,
            accum_steps=args.accum_steps,
        )

    # one host batch to shape-init
    loader.set_epoch(0)
    first_batch = next(iter(loader))
    batch_jnp = {k: jnp.asarray(v) for k, v in first_batch.items()
                 if isinstance(v, np.ndarray)}
    if device_aug is not None:
        img, lab = device_aug(
            jax.random.PRNGKey(0), batch_jnp["image"], batch_jnp["label"]
        )
        batch_jnp = {"image": img, "label": lab}
    state = trainer.init_state(jax.random.PRNGKey(args.seed), batch_jnp)

    # param groups need the realized params
    trainer.configure_groups(
        make_lr_mult_tree(state.params, cfg.business_lr_mult),
        make_wd_tree(state.params, cfg.weight_decay),
    )

    if args.pretrained:
        if args.pretrained.endswith(".params"):
            # GluonCV model-zoo checkpoint (the v1c deep-stem source) —
            # the role of reference tools/gluon2pytorch.py, direct
            from .utils.gluon_convert import graft_gluon_backbone

            state = state.replace(
                params=graft_gluon_backbone(args.pretrained, state.params)
            )
        else:
            from .utils.torch_convert import graft_torch_checkpoint

            state = state.replace(
                params=graft_torch_checkpoint(args.pretrained, state.params)
            )

    start_epoch = 0
    snapshot_dir = os.path.join(args.log_dir, cfg.name, "snapshot")
    orbax_ck = None
    if args.orbax:
        from .engine.checkpoint_orbax import OrbaxCheckpointer

        orbax_ck = OrbaxCheckpointer(snapshot_dir + "-orbax", keep=20)
        if args.continue_from == "orbax" and orbax_ck.latest_step() is not None:
            saved_epoch = orbax_ck.latest_step()
            state = orbax_ck.restore(state, saved_epoch)
            start_epoch = saved_epoch + 1
            logger.info("orbax: resumed at epoch %d", start_epoch)
    if args.continue_from and args.continue_from != "orbax":
        state, saved_epoch, _ = restore_checkpoint(args.continue_from, state)
        start_epoch = saved_epoch + 1
        logger.info("restored %s, resuming at epoch %d", args.continue_from,
                    start_epoch)

    from .data.loader import prefetch_to_device

    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, nepochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        # batches arrive already mesh-sharded, with the NEXT batch's H2D
        # overlapping this step's compute (the DistributedSampler split +
        # pinned-memory prefetch, TPU-style)
        if sp > 1:
            from .parallel import place_batch

            batches = prefetch_to_device(
                loader, mesh, place=lambda b: place_batch(b, mesh))
        else:
            batches = prefetch_to_device(loader, mesh)
        for it, batch_jnp in enumerate(batches):
            rng, step_rng = jax.random.split(rng)
            if device_aug is not None:
                rng, aug_rng = jax.random.split(rng)
                img, lab = device_aug(
                    aug_rng, batch_jnp["image"], batch_jnp["label"]
                )
                batch_jnp = {"image": img, "label": lab}
            state, loss, lr = trainer.train_step(state, batch_jnp, step_rng)
            if it % 10 == 0:
                logger.info(
                    "Epoch %d/%d Iter %d/%d: lr=%.2e loss=%.4f (%.2fs/it)",
                    epoch, nepochs, it + 1, niters, float(lr), float(loss),
                    (time.time() - t0) / (it + 1),
                )
        if jax.process_index() == 0 and (
            epoch > nepochs - 20 or epoch % cfg.snapshot_iter == 0
        ):
            if orbax_ck is not None:
                orbax_ck.save(epoch, state)  # async
                logger.info("orbax: saved epoch %d (async)", epoch)
            else:
                path = save_checkpoint(snapshot_dir, state, epoch)
                logger.info("saved %s", path)
    if orbax_ck is not None:
        orbax_ck.wait()
        orbax_ck.close()
    return state


if __name__ == "__main__":
    main()
