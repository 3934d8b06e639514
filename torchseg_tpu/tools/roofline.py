"""Roofline / speed-of-light analysis for any experiment's forward or
train step.

XLA's HLO cost analysis of the compiled program gives exact post-fusion
FLOPs and bytes-accessed; dividing by the chip's peak compute and HBM
bandwidth gives the two speed-of-light bounds.  The larger bound is the
roofline latency — a measured time close to it means the graph runs at
hardware speed (the reference has no such tool; its closest analog is the
MAdd column of furnace/tools/benchmark/reporter.py:22-93, which counts
module-level multiply-adds pre-fusion).

v5e defaults: 197 bf16 TFLOP/s, 819 GB/s HBM (394 int8 TOP/s — pass
--peak-tflops 394 for int8 graphs).

Caveat: FLOPs are backend-independent; bytes-accessed reflects the
compiling backend's fusion/layout choices, so run on the target backend
for a true bandwidth bound (a CPU-backend compile still gives a usable
estimate).

Usage:
    python -m torchseg_tpu.tools.roofline -e cityscapes.bisenet.R18.speed \
        --input-size 1x1024x2048x3 --measured-ms 4.608
    python -m torchseg_tpu.tools.roofline -e cityscapes.bisenet.R18 \
        --train --batch-size 2 --measured-ms 34.15
"""

import argparse
import dataclasses

import numpy as np


def _cost(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return (float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("--input-size", default=None,
                   help="NxHxWxC for the forward graph (default: 1 x the "
                        "experiment's eval crop)")
    p.add_argument("--train", action="store_true",
                   help="analyze the full train step (fwd+loss+bwd+SGD) "
                        "instead of the serving forward")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--f32", dest="bf16", action="store_false")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="chip peak TFLOP/s (v5e bf16 197; int8 394)")
    p.add_argument("--peak-gbs", type=float, default=819.0,
                   help="chip peak HBM GB/s (v5e 819)")
    p.add_argument("--measured-ms", type=float, default=None,
                   help="measured device time to compare against the "
                        "roofline bound")
    p.add_argument("--trace", action="store_true",
                   help="ALSO execute the graph on the attached device "
                        "under the profiler and report measured per-run "
                        "HBM bytes (xprof op_profile memory breakdown) "
                        "and device ms — a far tighter bandwidth bound "
                        "than the cost-analysis bytes upper bound.  "
                        "Caveat: Pallas custom-call traffic is not "
                        "modeled by XLA's cost model (counted as 0); "
                        "the tool reports the custom-call share so the "
                        "gap is visible")
    p.add_argument("--trace-runs", type=int, default=6)
    p.add_argument("--deploy", action="store_true",
                   help="analyze the bf16 fused-stem SERVING graph "
                        "(s2d input + argmax epilogue, deploy/fused_stem) "
                        "— the graph bench.py's bf16 number measures — "
                        "instead of the plain forward")
    p.add_argument("--int8-through", action="store_true",
                   help="analyze the int8-through serving graph "
                        "(deploy/int8_serve) — bench.py's headline.  "
                        "NOTE: pass --peak-tflops 394 for the int8 MXU "
                        "bound; the bf16 decoder tail means the true "
                        "compute bound sits between 197 and 394")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..experiments.registry import build_loss_fn, build_model, \
        get_experiment

    cfg = get_experiment(args.experiment)
    if args.crop:
        cfg = dataclasses.replace(cfg, image_height=args.crop[0],
                                  image_width=args.crop[1])
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    dtype = jnp.bfloat16 if args.bf16 else None

    rng = np.random.default_rng(0)
    if args.train:
        model = build_model(cfg, axis_name=None, dtype=dtype)
        loss_fn = build_loss_fn(cfg, num_shards=1)
        b = args.batch_size or 2
        batch = {
            "image": jnp.asarray(rng.normal(size=(
                b, cfg.image_height, cfg.image_width, 3)).astype(np.float32)),
            "label": jnp.asarray(rng.integers(0, cfg.num_classes, size=(
                b, cfg.image_height // cfg.gt_down_sampling,
                cfg.image_width // cfg.gt_down_sampling)).astype(np.int32)),
        }
        if cfg.loss == "dfn":
            batch["aux_label"] = jnp.asarray(rng.integers(0, 2, size=(
                b, cfg.image_height, cfg.image_width)).astype(np.int32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch["image"][:1], train=True)

        def step(params, bstats, batch):
            def loss_wrapped(params):
                outs, mut = model.apply(
                    {"params": params, "batch_stats": bstats},
                    batch["image"], train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)})
                return loss_fn(outs, batch), mut["batch_stats"]

            (loss, st), grads = jax.value_and_grad(
                loss_wrapped, has_aux=True)(params)
            new_params = jax.tree.map(lambda p, g: p - 0.01 * g,
                                      params, grads)
            return loss, new_params, st

        fn, fargs = step, (variables["params"], variables["batch_stats"],
                           batch)
        lowered = jax.jit(step).lower(*fargs)
        what = (f"train step bs={b} "
                f"@{cfg.image_height}x{cfg.image_width}")
    else:
        model = build_model(cfg, axis_name=None, dtype=dtype)
        if args.input_size:
            shape = tuple(int(s) for s in args.input_size.split("x"))
        else:
            shape = (1, cfg.image_height, cfg.image_width, 3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 128, 3)), train=True)
        if dtype is not None:
            variables = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, variables)
        b, h, w, _ = shape
        what = f"forward @{'x'.join(map(str, shape))}"

        if args.int8_through:
            from ..deploy.int8_serve import (
                build_int8_serving_for_experiment,
            )

            infer, run_pkg, prepare, _ = build_int8_serving_for_experiment(
                cfg, model, variables,
                calib_images=[rng.integers(0, 255, (b, h // 2, w // 2, 3))
                              .astype(np.uint8) for _ in range(2)])
            xs = prepare(rng.integers(0, 255, shape).astype(np.uint8))
            fn, fargs = infer, (run_pkg, xs)
            lowered = jax.jit(infer).lower(run_pkg, xs)
            what += " [int8-through serving]"
        elif args.deploy:
            from ..deploy.fused_stem import (
                _fused_stem_s2d,
                prepare_s2d_input,
            )

            def fwd(variables, xs):
                stems = _fused_stem_s2d(variables, xs, cfg.bn_eps)
                dummy = jnp.zeros((b, h, w, 3), xs.dtype)
                scores = model.apply(variables, dummy, train=False,
                                     stem_outs=stems)
                return jnp.argmax(scores, axis=-1).astype(jnp.int32)

            xs = prepare_s2d_input(
                rng.normal(size=shape).astype(np.float32),
                dtype=dtype or jnp.float32)
            fn, fargs = fwd, (variables, xs)
            lowered = jax.jit(fwd).lower(variables, xs)
            what += " [bf16 fused-stem serving]"
        else:
            x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
            if dtype is not None:
                x = x.astype(dtype)

            def fwd(variables, x):
                return model.apply(variables, x, train=False)

            fn, fargs = fwd, (variables, x)
            lowered = jax.jit(fwd).lower(variables, x)

    flops, bytes_acc = _cost(lowered.compile())
    sol_c = flops / (args.peak_tflops * 1e12) * 1e3
    sol_b = bytes_acc / (args.peak_gbs * 1e9) * 1e3
    sol = max(sol_c, sol_b)
    bound = "compute" if sol_c >= sol_b else "bandwidth"
    ai = flops / max(bytes_acc, 1.0)
    print(f"{args.experiment} {what} "
          f"({'bf16' if args.bf16 else 'f32'}, backend "
          f"{jax.local_devices()[0].platform}):")
    print(f"  FLOPs {flops:.3e}  bytes {bytes_acc:.3e}  "
          f"arithmetic intensity {ai:.1f} FLOP/B")
    print(f"  SOL compute {sol_c:.3f} ms @ {args.peak_tflops:.0f} TFLOP/s | "
          f"SOL bandwidth {sol_b:.3f} ms @ {args.peak_gbs:.0f} GB/s "
          f"-> roofline {sol:.3f} ms ({bound}-bound)")
    res = {"flops": flops, "bytes": bytes_acc, "sol_ms": sol,
           "bound": bound}
    if args.measured_ms:
        util = sol / args.measured_ms
        print(f"  measured {args.measured_ms:.3f} ms -> "
              f"{100 * util:.0f}% of speed-of-light")
        res["sol_fraction"] = util
    if args.trace:
        res.update(_trace_hbm(fn, fargs, args.trace_runs, args.peak_gbs,
                              args.peak_tflops))
    return res


def _trace_hbm(fn, fargs, runs, peak_gbs, peak_tflops):
    """Execute ``runs`` forwards under the profiler; report measured
    device ms + per-run HBM bytes from xprof's op_profile memory
    breakdown (rawBytesAccessedArray[0] == HBM for the TPU plane)."""
    import glob
    import json as _json
    import tempfile

    import jax

    compiled = jax.jit(fn)
    jax.block_until_ready(compiled(*fargs))  # compile + warm
    logdir = tempfile.mkdtemp(prefix="roofline_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(runs):
            jax.block_until_ready(compiled(*fargs))

    path = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]

    # device ms: min XLA-module duration over the runs
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    times = []
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                times.extend(ev.duration_ps / 1e9 for ev in line.events)
    dev_ms = min(times) if times else float("nan")
    n_mod = max(len(times), 1)

    from xprof.convert import raw_to_tool_data as rtd

    data, _ctype = rtd.xspace_to_tool_data([path], "op_profile", {})
    d = _json.loads(data)
    root = d.get("byProgram") or d
    progs = [c for c in root.get("children", [])
             if c.get("name") != "IDLE"]
    if not progs:
        print("  (trace: no program nodes in op_profile)")
        return {}
    prog = max(progs, key=lambda c: c["metrics"].get("rawTime", 0))
    m = prog["metrics"]
    hbm_total = float(m["rawBytesAccessedArray"][0])
    hbm_run = hbm_total / n_mod
    sol_meas = hbm_run / (peak_gbs * 1e9) * 1e3
    cc_ps = sum(c["metrics"].get("rawTime", 0)
                for c in prog.get("children", [])
                if "custom-call" in c.get("name", ""))
    cc_ms = cc_ps / 1e9 / n_mod
    print(f"  traced {n_mod} runs: device {dev_ms:.3f} ms | measured HBM "
          f"{hbm_run:.3e} B/run -> bandwidth bound {sol_meas:.3f} ms "
          f"@ {peak_gbs:.0f} GB/s")
    if cc_ms > 0:
        print(f"  (custom-call [Pallas] time {cc_ms:.3f} ms/run carries "
              f"UNMODELED HBM traffic — the measured-bytes bound excludes "
              f"it)")
    return {"trace_device_ms": dev_ms, "trace_hbm_bytes_per_run": hbm_run,
            "trace_sol_bandwidth_ms": sol_meas,
            "trace_custom_call_ms": cc_ms}


if __name__ == "__main__":
    main()
