"""Evaluation entrypoint — replaces the reference's per-experiment ``eval.py``
(SURVEY.md §3.2): loads checkpoints (single epoch, range 'a-b', or open 'a-'),
runs the experiment's TTA protocol over the val set, prints the per-class IoU
table, appends to val_*.log with a val_last.log link, and optionally dumps
prediction PNGs.

Usage:
  python -m torchseg_tpu.eval -e cityscapes.bisenet.R18 \
      --img-root ... --eval-source ... --snapshot-dir log/.../snapshot \
      --epochs 79            # or 60-79, or 60-
"""

import argparse
import glob
import os
import re
import time

import jax.numpy as jnp
import numpy as np

from .data.base import SyntheticDataset
from .engine.checkpoint import restore_checkpoint
from .engine.evaluator import Evaluator
from .engine.logger import get_logger
from .engine.trainer import TrainState
from .experiments.registry import (
    DATASETS,
    build_model,
    get_experiment,
)
from .utils.visualize import print_iou


def parse_epochs(spec: str, snapshot_dir: str):
    """'5' | '5-8' | '5-' | 'last' -> checkpoint paths
    (reference engine/evaluator.py:43-94 modes)."""
    if spec == "last":
        return [os.path.join(snapshot_dir, "epoch-last.ckpt")]
    if os.path.exists(spec):
        return [spec]
    m = re.fullmatch(r"(\d+)-(\d*)", spec)
    if m:
        lo = int(m.group(1))
        if m.group(2):
            hi = int(m.group(2))
        else:
            hi = max(
                int(re.search(r"epoch-(\d+)", p).group(1))
                for p in glob.glob(os.path.join(snapshot_dir, "epoch-*.ckpt"))
                if re.search(r"epoch-(\d+)", p)
            )
        return [
            os.path.join(snapshot_dir, f"epoch-{e}.ckpt")
            for e in range(lo, hi + 1)
            if os.path.exists(os.path.join(snapshot_dir, f"epoch-{e}.ckpt"))
        ]
    return [os.path.join(snapshot_dir, f"epoch-{int(spec)}.ckpt")]


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("--img-root", default=None)
    p.add_argument("--gt-root", default=None)
    p.add_argument("--eval-source", default=None)
    p.add_argument("--snapshot-dir", default=None)
    p.add_argument("--epochs", default="last")
    p.add_argument("--log-dir", default="log")
    p.add_argument("-p", "--save-path", default=None,
                   help="dump prediction PNGs here")
    p.add_argument("--submit", default=None, metavar="DIR",
                   help="write server-submission PNGs (train ids remapped "
                        "via the dataset's transform_label, e.g. Cityscapes "
                        "label ids) into DIR")
    p.add_argument("-s", "--show-image", nargs="?", const="window",
                   default=None, metavar="DIR",
                   help="composite [image|gt|pred] overlays: no value opens "
                        "an interactive window (reference eval.py -s); a DIR "
                        "value writes the composites there (headless)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="evaluate N synthetic images (smoke)")
    p.add_argument("--msf", action="store_true",
                   help="multi-scale + flip TTA protocol")
    p.add_argument("--torch-checkpoint", default=None,
                   help="evaluate a reference torch .pth directly (full-model "
                        "key grafting, utils/torch_convert.py)")
    p.add_argument("-d", "--devices", default=None,
                   help="local device selection, e.g. '0-3' or '*' "
                        "(reference eval.py -d)")
    p.add_argument("--shard-crops", action="store_true",
                   help="with -d: devices team up on each image (the "
                        "sliding crop grid shards over the mesh, canvases "
                        "psum-merged) instead of splitting images — lower "
                        "single-image latency for big inputs")
    p.add_argument("--sp", type=int, default=1,
                   help="whole-protocol GSPMD: shard each image's HEIGHT "
                        "over SP devices (conv halos inserted by XLA) — "
                        "single-image full-res latency scales with the "
                        "mesh; the whole-mode counterpart of "
                        "--shard-crops")
    p.add_argument("--eval-crop", type=int, default=None,
                   help="override cfg.eval_crop_size (off-protocol sizes: "
                        "small drills, other-resolution datasets)")
    p.add_argument("--eval-base", type=int, default=None,
                   help="override cfg.eval_base_size (with --eval-crop)")
    p.add_argument("--eval-dtype", choices=("f32", "bf16"), default="f32",
                   help="model compute dtype for accuracy eval: f32 is the "
                        "reference protocol; bf16 shaves ~10% device "
                        "ms/img (agreement bound: docs/MODEL_ZOO.md)")
    p.add_argument("-speed", "--speed", action="store_true",
                   help="run the FPS benchmark instead of accuracy eval")
    p.add_argument("--summary", action="store_true",
                   help="print per-module parameter/FLOPs table")
    p.add_argument("--input-size", default="1x1024x2048x3",
                   help="input shape for --speed/--summary")
    return p


def make_evaluator(cfg, variables, msf=False, devices=None,
                   shard_crops=False, spatial_shards=1, eval_dtype="f32"):
    """eval_dtype: "f32" (reference protocol — the reference evaluates
    in f32, furnace/engine/evaluator.py:186-275) or "bf16" (compute
    dtype only: params stay f32, flax casts at use).  bf16 roughly
    halves device ms/img on the sliding/msf protocols; measured
    agreement bound in docs/MODEL_ZOO.md "bf16 eval arm"."""
    import jax.numpy as jnp

    dtype = {"f32": None, "bf16": jnp.bfloat16}[eval_dtype]
    model = build_model(cfg, axis_name=None, dtype=dtype)

    def apply_fn(v, x):
        return model.apply(v, x, train=False)

    return Evaluator(
        apply_fn,
        variables,
        cfg.num_classes,
        cfg.image_mean,
        cfg.image_std,
        multi_scales=cfg.eval_ms_scale_array if msf else cfg.eval_scale_array,
        is_flip=True if msf else cfg.eval_flip,
        crop_size=cfg.eval_crop_size,
        stride_rate=cfg.eval_stride_rate,
        devices=devices,
        shard_crops=shard_crops,
        spatial_shards=spatial_shards,
    )


def evaluate_checkpoint(cfg, variables, dataset, save_path=None, msf=False,
                        ev=None, submit_dir=None, show_image=None):
    if ev is None:
        ev = make_evaluator(cfg, variables, msf)
    else:
        ev.variables = variables  # reuse compiled fns across the epoch sweep
    extras = {}
    if submit_dir is not None:
        transform = getattr(type(dataset), "transform_label", None)
        if transform is None:
            raise SystemExit(
                f"--submit needs a dataset with a transform_label remap; "
                f"{type(dataset).__name__} has none (Cityscapes only)"
            )
        extras.update(submit_dir=submit_dir, transform_label=transform)
    if show_image is not None:
        colors_fn = getattr(type(dataset), "get_class_colors", None)
        colors = (colors_fn() if colors_fn is not None else
                  [[(37 * i) % 256, (97 * i) % 256, (173 * i) % 256]
                   for i in range(cfg.num_classes)])
        extras.update(
            show_image=show_image,
            class_colors=colors,
            background=cfg.ignore_label,
        )
    acc = ev.run_dataset(
        dataset,
        mode=cfg.eval_mode,
        gt_down_sampling=cfg.eval_gt_down_sampling,
        resize_to=cfg.eval_resize_to,
        save_pred_dir=save_path,
        label_offset=cfg.eval_label_offset,
        **extras,
    )
    import jax

    if jax.process_count() > 1:
        # run_dataset shards the val set by process; merge the partial
        # accumulators so every host logs the FULL-dataset result (the
        # allgather replacing the reference's results_queue,
        # evaluator.py:123-128)
        from .parallel import gather_metrics

        acc.hist = gather_metrics(acc.hist)
        acc.labeled, acc.correct = (
            int(v)
            for v in gather_metrics(
                np.asarray([acc.labeled, acc.correct], np.int64)
            )
        )
    return acc


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from .utils.misc import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the ~1 min compile
    cfg = get_experiment(args.experiment)
    if args.eval_crop or args.eval_base:
        import dataclasses

        over = {}
        if args.eval_crop:
            over["eval_crop_size"] = args.eval_crop
        if args.eval_base:
            over["eval_base_size"] = args.eval_base
        cfg = dataclasses.replace(cfg, **over)
    if args.sp > 1 and cfg.eval_mode != "whole":
        raise SystemExit(
            f"--sp shards the whole-image forward; {cfg.name} evaluates "
            f"with the '{cfg.eval_mode}' protocol — use --shard-crops "
            "for sliding experiments"
        )
    log_dir = os.path.join(args.log_dir, cfg.name)
    logger = get_logger(log_dir, None)

    if args.speed or args.summary:
        # reference -speed/--summary hooks (model/bisenet/*.speed/eval.py)
        if args.sp > 1:
            raise SystemExit(
                "-speed/--summary benchmarks the single-device forward; "
                "--sp does not apply (drop it, or time the sharded path "
                "with torchseg-eval --sp N on real images)"
            )
        from .tools import speed as speed_tool

        speed_args = ["-e", args.experiment, "--input-size", args.input_size]
        if args.summary:
            speed_args.append("--summary")
        return speed_tool.main(speed_args)

    if args.synthetic:
        dataset = SyntheticDataset(
            num_items=args.synthetic,
            image_hw=(cfg.eval_base_size, cfg.eval_base_size),
            num_classes=cfg.num_classes,
        )
    else:
        ds_cls = DATASETS[cfg.dataset]
        setting = {
            "img_root": args.img_root,
            "gt_root": args.gt_root or args.img_root,
            "train_source": args.eval_source,
            "eval_source": args.eval_source,
        }
        dataset = ds_cls(setting, "val", preprocess=None)

    # template state for checkpoint restore
    model = build_model(cfg, axis_name=None)
    import jax

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    # params are shape-independent: init at a tiny size for speed (PSANet
    # included — off-size inputs resize the attention grid, models/psanet.py)
    template_vars = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    template = TrainState.create(template_vars)

    snapshot_dir = args.snapshot_dir or os.path.join(log_dir, "snapshot")
    val_log = os.path.join(
        log_dir, f"val_{time.strftime('%Y_%m_%d_%H_%M_%S')}.log"
    )
    os.makedirs(log_dir, exist_ok=True)
    devices = None
    if args.devices:
        from .utils.misc import parse_devices

        all_dev = jax.devices()
        devices = [all_dev[i] for i in parse_devices(args.devices)
                   if i < len(all_dev)]
    results = []
    ev = None

    if args.torch_checkpoint:
        from .utils.torch_convert import graft_full_checkpoint, model_family

        family = model_family(cfg.model)
        variables = graft_full_checkpoint(
            args.torch_checkpoint,
            {"params": template_vars["params"],
             "batch_stats": template_vars["batch_stats"]},
            family,
        )
        ev = make_evaluator(cfg, variables, msf=args.msf, devices=devices,
                            shard_crops=args.shard_crops,
                            spatial_shards=args.sp,
                            eval_dtype=args.eval_dtype)
        acc = evaluate_checkpoint(cfg, variables, dataset, args.save_path,
                                  msf=args.msf, ev=ev,
                                  submit_dir=args.submit,
                                  show_image=args.show_image)
        iou, miou, _, pixacc = acc.scores()
        names = (DATASETS[cfg.dataset].get_class_names()
                 if not args.synthetic else None)
        table = print_iou(iou, pixacc, names,
                          show_no_back=cfg.dataset != "cityscapes")
        line = f"== torch ckpt: mIoU {miou * 100:.2f} ==\n{table}\n"
        logger.info("\n%s", line)
        with open(val_log, "a") as f:
            f.write(line)
        return [("torch", miou)]

    for path in parse_epochs(str(args.epochs), snapshot_dir):
        state, epoch, _ = restore_checkpoint(path, template)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if ev is None:
            ev = make_evaluator(cfg, variables, msf=args.msf,
                                devices=devices,
                                shard_crops=args.shard_crops,
                                spatial_shards=args.sp,
                                eval_dtype=args.eval_dtype)
        acc = evaluate_checkpoint(
            cfg, variables, dataset, args.save_path, msf=args.msf, ev=ev,
            submit_dir=args.submit, show_image=args.show_image,
        )
        iou, miou, miou_nb, pixacc = acc.scores()
        names = DATASETS[cfg.dataset].get_class_names() if not args.synthetic \
            else None
        table = print_iou(iou, pixacc, names,
                          show_no_back=cfg.dataset != "cityscapes")
        line = f"== epoch {epoch}: mIoU {miou * 100:.2f} ==\n{table}\n"
        logger.info("\n%s", line)
        with open(val_log, "a") as f:
            f.write(line)
        results.append((epoch, miou))

    link = os.path.join(log_dir, "val_last.log")
    if os.path.lexists(link):
        os.remove(link)
    try:
        os.symlink(os.path.basename(val_log), link)
    except OSError:
        pass
    return results


if __name__ == "__main__":
    main()
