"""Eval-protocol throughput: wall ms/img of the FULL Evaluator pipeline
(host lookahead resize + device sliding/whole compute + histogram) on
synthetic val-sized inputs.

The eval-side analog of tools/speed: the reference has no such tool — its
only eval timing is the per-process progress print in the mp loop
(furnace/engine/evaluator.py:138-146).  This drives the real
``Evaluator.run_dataset`` path (including the one-item lookahead thread
that precomputes every msf scale of image k+1 while the device works on
image k), so the number is what a user sees per val image.

Protocol: one full warm pass over the synthetic set (compiles every
per-scale/per-grid graph), then N timed passes; reports best-pass
ms/img.  Input size defaults to the experiment's real val geometry
(Cityscapes 1024x2048, else eval_base_size square).

Usage:
  python -m torchseg_tpu.tools.eval_speed -e cityscapes.bisenet.R18 --msf
  python -m torchseg_tpu.tools.eval_speed -e cityscapes.bisenet.R18.speed
"""

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("--n", type=int, default=6, help="images per pass")
    p.add_argument("--passes", type=int, default=2,
                   help="timed passes (best is reported)")
    p.add_argument("--msf", action="store_true",
                   help="full multi-scale+flip protocol "
                        "(cfg.eval_ms_scale_array) instead of single-scale")
    p.add_argument("--size", default=None, help="HxW input size override")
    p.add_argument("--mode", default=None, choices=["sliding", "whole"],
                   help="protocol override (default: cfg.eval_mode)")
    p.add_argument("--shard-crops", action="store_true")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial shards for the whole protocol")
    p.add_argument("--eval-dtype", choices=("f32", "bf16"), default="f32",
                   help="model compute dtype (eval.py --eval-dtype); bf16 "
                        "shaves ~10% device ms/img — agreement bound in "
                        "docs/MODEL_ZOO.md")
    p.add_argument("--device-time", action="store_true",
                   help="also report per-image DEVICE time (sum of XLA "
                        "module durations over one profiled pass) — the "
                        "production number; wall ms/img through the dev "
                        "tunnel includes ~35 ms per dispatch that real "
                        "deployments don't pay")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils.misc import enable_compile_cache

    enable_compile_cache()

    from ..data.base import SyntheticDataset
    from ..eval import make_evaluator
    from ..experiments.registry import build_model, get_experiment

    cfg = get_experiment(args.experiment)
    if args.size:
        h, w = (int(s) for s in args.size.split("x"))
    elif cfg.dataset == "cityscapes" and cfg.eval_resize_to is None:
        h, w = 1024, 2048
    elif cfg.eval_resize_to is not None:
        # speed protocol resizes the input anyway; feed the resize target
        h, w = cfg.eval_resize_to
    else:
        h = w = cfg.eval_base_size

    model = build_model(cfg, axis_name=None)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)

    dataset = SyntheticDataset(num_items=args.n, image_hw=(h, w),
                               num_classes=cfg.num_classes)
    ev = make_evaluator(cfg, variables, msf=args.msf,
                        shard_crops=args.shard_crops,
                        spatial_shards=args.sp,
                        eval_dtype=args.eval_dtype)
    mode = args.mode or cfg.eval_mode
    if args.sp > 1 and mode != "whole":
        # mirror eval.py:193's guard — spatial shards only support the
        # whole protocol; failing here beats failing deep in run_dataset
        raise SystemExit(
            f"--sp {args.sp} requires the whole protocol (effective mode "
            f"is '{mode}'); pass --mode whole or drop --sp"
        )
    kw = dict(mode=mode, gt_down_sampling=cfg.eval_gt_down_sampling,
              resize_to=cfg.eval_resize_to)

    scales = ev.multi_scales
    flip = ev.is_flip
    print(f"{args.experiment} eval protocol: mode={mode} input {h}x{w} "
          f"scales={scales} flip={flip} crop={ev.crop_size} "
          f"sp={args.sp} shard_crops={args.shard_crops}")

    t0 = time.perf_counter()
    ev.run_dataset(dataset, **kw)  # warm pass: compiles
    warm = time.perf_counter() - t0
    print(f"  warm pass (incl. compiles): {warm / args.n * 1000:.1f} ms/img")

    best = float("inf")
    for _ in range(args.passes):
        t0 = time.perf_counter()
        ev.run_dataset(dataset, **kw)
        best = min(best, time.perf_counter() - t0)
    ms = best / args.n * 1000
    tag = "msf" if args.msf else "ss"
    print(f"  {tag} {mode}: {ms:.1f} ms/img ({1000.0 / ms:.2f} img/s)")
    out = {"ms_per_img": ms, "mode": mode, "msf": args.msf,
           "dtype": args.eval_dtype}

    if args.device_time:
        import glob

        logdir = "/tmp/eval_speed_trace"
        with jax.profiler.trace(logdir):
            ev.run_dataset(dataset, **kw)

        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        path = sorted(
            glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        total_ms = 0.0
        for plane in space.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    total_ms += sum(
                        ev_.duration_ps / 1e9 for ev_ in line.events)
        dms = total_ms / args.n
        print(f"  {tag} {mode} DEVICE time: {dms:.1f} ms/img "
              f"({1000.0 / dms:.2f} img/s) — wall - device = "
              f"{ms - dms:.0f} ms/img host+dispatch")
        out["device_ms_per_img"] = dms
    return out


if __name__ == "__main__":
    main()
