"""Headline benchmark: BiSeNet-R18 real-time single-scale inference FPS at
1024x2048 on one TPU chip (BASELINE.md north star: >= 200 FPS/chip on v5e).

The headline path is the shipped int8-through serving artifact
(deploy/int8_serve.py: uint8 s2d input, int8 stems+spatial+body) — the
production serving configuration, with 97.5% argmax agreement vs bf16 on
random weights (docs/MODEL_ZOO.md; recalibrate on val images for a real
checkpoint).  The bf16 fused-stem deploy number is reported alongside.

Measurement (the tunnel to the chip has ~35 ms dispatch overhead, caches
identical executions, and its block_until_ready is unreliable — see
docs/DESIGN.md):
  1. primary: XLA-profiler device time — run K inferences on DISTINCT
     pre-uploaded inputs under jax.profiler.trace and read the per-module
     device duration from the xplane (pure compute, no host artifacts);
  2. secondary, conservative: N forwards chained in one fori_loop with an
     inter-iteration data dependency, best-of-R wall time / N (includes
     the chain's carry-update work + the dispatch amortized over N).

Compiles are cached in the repo-local .jax_ccache/ (shared with the test
suite), so a bench run after any session run is warm (~seconds/graph).

Prints ONE JSON line.
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

_T0 = time.time()


def _mark(stage):
    """Stage timing to stderr (stdout stays the single JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {stage}", file=sys.stderr,
          flush=True)


def _enable_cache():
    try:
        from torchseg_tpu.utils.misc import enable_compile_cache

        enable_compile_cache()
    except Exception:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(_REPO, ".jax_ccache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2)
        except Exception:
            pass


def build(args, experiment=None, height=None, width=None):
    """bf16 fused-stem deploy graph (deploy/fused_stem.py)."""
    import jax
    import jax.numpy as jnp

    _enable_cache()

    from torchseg_tpu.deploy.fused_stem import (
        _fused_stem_s2d,
        prepare_s2d_input,
    )
    from torchseg_tpu.experiments.registry import build_model, get_experiment

    cfg = get_experiment(experiment or args.experiment)
    dtype = None if args.f32 else jnp.bfloat16
    model = build_model(cfg, axis_name=None, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    if dtype is not None:
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32
            else x,
            variables,
        )
    h = height if height is not None else args.height
    w = width if width is not None else args.width

    @jax.jit
    def infer(variables, xs):
        # deploy path: both 7x7 stems as one 4x4 stride-1 conv over the s2d
        # serving input format (deploy/fused_stem.py)
        stems = _fused_stem_s2d(variables, xs, cfg.bn_eps)
        dummy = jnp.zeros((1, h, w, 3), xs.dtype)  # unused, DCE'd
        scores = model.apply(variables, dummy, train=False, stem_outs=stems)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    in_dtype = jnp.float32 if args.f32 else jnp.bfloat16

    def make_input(seed):
        img = (
            np.random.default_rng(seed)
            .normal(size=(1, h, w, 3))
            .astype(np.float32)
        )
        return prepare_s2d_input(img, dtype=in_dtype)

    return infer, variables, make_input


def build_int8(args, experiment=None, height=None, width=None):
    """int8-through serving graph (deploy/int8_serve.py) for a classic-stem
    BiSeNet speed experiment.  Calibration runs at half size — activation
    absmax is size-robust and the plain-graph compile is 4x cheaper."""
    import jax
    import jax.numpy as jnp

    _enable_cache()

    from torchseg_tpu.deploy.int8_serve import (
        build_int8_package,
        calibrate_channelwise,
        make_int8_through_infer,
        prepare_s2d_input_u8,
    )
    from torchseg_tpu.experiments.registry import build_model, get_experiment

    cfg = get_experiment(experiment or args.experiment)
    model = build_model(cfg, axis_name=None, dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    h = height if height is not None else args.height
    w = width if width is not None else args.width
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (1, h, w, 3)).astype(np.uint8)
            for _ in range(8)]
    calib = [jnp.asarray(
        (u[:, ::2, ::2].astype(np.float32) / 255.0 - mean) / std,
        jnp.bfloat16) for u in imgs[:2]]
    _mark("int8: model init done, calibrating")
    stats = calibrate_channelwise(model, variables, calib)
    _mark("int8: calibration done, building package")
    # decoder default int8: round-4 chip A/B (docs/DESIGN.md) — int8
    # ARM/refine/FFM/head beat bf16 on both classic-stem models
    pkg = build_int8_package(
        variables, stats, eps=cfg.bn_eps, image_mean=mean, image_std=std,
        decoder="bf16" if args.bf16_decoder else "int8")
    infer, run_pkg = make_int8_through_infer(model, variables, pkg)
    run_pkg = jax.device_put(run_pkg)
    _mark("int8: package built")

    def make_input(seed):
        return prepare_s2d_input_u8(imgs[seed % len(imgs)], image_mean=mean)

    return (lambda p, xs: infer(p, xs)), run_pkg, make_input


def measure_profiler(infer, variables, make_input, k=8):
    import jax

    xs_list = [make_input(i) for i in range(k)]
    _mark("profiler: inputs ready, compiling")
    infer(variables, xs_list[0]).block_until_ready()  # compile + warm
    _mark("profiler: compiled, tracing")
    logdir = "/tmp/bench_trace"
    with jax.profiler.trace(logdir):
        for xs in xs_list:
            infer(variables, xs).block_until_ready()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
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
    if len(times) < k // 2:
        raise RuntimeError("no device modules captured")
    return min(times)  # ms


def measure_chain(infer_parts, args):
    """Conservative estimator: args.chain forwards serialized inside one
    fori_loop with a one-element inter-iteration input perturbation (cannot
    be elided/cached), best-of-reps wall / chain.  Handles float inputs
    (additive 1e-8 delta) and integer inputs (xor delta)."""
    import jax
    import jax.numpy as jnp

    infer, variables, make_input = infer_parts
    xs0 = make_input(0)
    is_float = jnp.issubdtype(jnp.asarray(xs0).dtype, jnp.floating)
    n = args.chain

    @jax.jit
    def chained(variables, xs, seed):
        def body(i, carry):
            xs, acc = carry
            pred = infer(variables, xs)
            acc = acc + pred[0, 0, 0]
            if is_float:
                delta = ((acc % 2).astype(xs.dtype) * 1e-8).reshape(
                    1, 1, 1, 1)
                upd = xs[:1, :1, :1, :1] + delta
            else:
                delta = (acc % 2).astype(xs.dtype).reshape(1, 1, 1, 1)
                upd = xs[:1, :1, :1, :1] ^ delta
            xs = jax.lax.dynamic_update_slice(xs, upd, (0, 0, 0, 0))
            return (xs, acc)

        if is_float:
            # cast the seed INTO the input dtype: a strongly-typed f32
            # scalar would promote the whole chain (and every iteration's
            # carry) to f32, silently measuring an f32 graph on the bf16
            # path (round-4 advisor finding)
            xs = xs + seed.astype(xs.dtype)
        else:
            xs = xs ^ seed.astype(xs.dtype)
        return jax.lax.fori_loop(0, n, body, (xs, jnp.int32(0)))[1]

    def seed_val(r):
        return jnp.float32(1e-4 * r) if is_float else jnp.int32(r)

    _mark("chain: compiling")
    int(chained(variables, xs0, seed_val(0)))
    _mark("chain: compiled, timing")
    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        int(chained(variables, xs0, seed_val(r + 1)))
        times.append(time.perf_counter() - t0)
    return min(times) / n * 1000  # ms


def _bench_train(args, k=6):
    """Profiler ms/step of the full BiSeNet-R18 train step (OHEM x3 +
    BN stats + SGD update) at the DESIGN.md protocol: bs2 @ 1024x1024
    bf16 on one chip — the training-throughput headline as a
    driver-visible artifact."""
    import jax
    import jax.numpy as jnp

    from torchseg_tpu.engine.lr_policy import PolyLR
    from torchseg_tpu.engine.optim import sgd_update
    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        build_model,
        get_experiment,
    )

    cfg = get_experiment("cityscapes.bisenet.R18")
    rng = np.random.default_rng(0)
    B, H, W = 2, 1024, 1024
    imgs = [jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32),
                        jnp.bfloat16) for _ in range(k)]
    lbls = jnp.asarray(rng.integers(0, 19, (B, H, W)).astype(np.int32))
    loss_fn = build_loss_fn(cfg, num_shards=1)
    lr = PolyLR(cfg.lr, cfg.lr_power, 10000)
    model = build_model(cfg, axis_name=None, dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           imgs[0][:1], train=True)
    params, stats = variables["params"], variables["batch_stats"]
    mom = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def step(params, stats, mom, imgs, lbls, it):
        def lw(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": stats}, imgs, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return loss_fn(outs, {"image": imgs, "label": lbls}), mut

        (loss, mut), grads = jax.value_and_grad(lw, has_aux=True)(params)
        params, mom = sgd_update(params, grads, mom, lr(it),
                                 momentum=cfg.momentum)
        return params, mut["batch_stats"], mom, loss

    _mark("train: compiling")
    jax.block_until_ready(step(params, stats, mom, imgs[0], lbls, 0))
    _mark("train: compiled, tracing")
    logdir = "/tmp/bench_trace_train"
    with jax.profiler.trace(logdir):
        for x in imgs:
            jax.block_until_ready(step(params, stats, mom, x, lbls, 1))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
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
    if len(times) < k // 2:
        raise RuntimeError("no device modules captured")
    return min(times)  # ms/step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=400,
                   help="iterations per chained run; long chains amortize "
                        "the ~35 ms tunnel dispatch to <0.1 ms/iter")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--f32", action="store_true",
                   help="bf16-path dtype override (headline int8 path "
                        "unaffected)")
    p.add_argument("--experiment", default="cityscapes.bisenet.R18.speed",
                   help="any classic/xception-stem BiSeNet speed experiment "
                        "(e.g. cityscapes.bisenet.X39.speed)")
    p.add_argument("--bf16-decoder", action="store_true",
                   help="headline int8 package keeps the decoder bf16 "
                        "(A/B arm; shipped default is the int8 decoder "
                        "per the round-4 chip A/B)")
    p.add_argument("--bf16-headline", action="store_true",
                   help="use the bf16 fused-stem deploy graph as the "
                        "headline instead of the int8-through artifact")
    p.add_argument("--skip-extras", action="store_true",
                   help="headline only: skip the X39 / bf16 / train extras")
    args = p.parse_args()

    t_start = time.time()
    out = {}

    # --- headline: int8-through serving artifact (fallback: bf16 deploy)
    parts = None
    if not args.bf16_headline:
        try:
            parts = build_int8(args)
            out["path"] = "int8-through"
        except Exception as e:
            out["int8_build_error"] = f"{type(e).__name__}: {e}"
    if parts is None:
        parts = build(args)
        out["path"] = "bf16-fused-stem"

    ms = err = None
    try:
        ms = measure_profiler(*parts)
    except Exception as e:
        err = e
    chain_ms = None
    try:
        chain_ms = measure_chain(parts, args)
    except Exception as chain_exc:
        if err is not None:
            # both estimators failed: surface the primary (profiler)
            # failure as the root cause, chained to the fallback's
            raise err from chain_exc
    primary = ms if ms is not None else chain_ms
    fps = 1000.0 / primary
    tag = args.experiment.split(".")[-2].lower()  # R18 / X39
    out.update({
        "metric": f"bisenet_{tag}_{args.height}x{args.width}_fps_per_chip",
        "value": round(fps, 2),
        "unit": "FPS",
        "vs_baseline": round(fps / 200.0, 3),
    })
    if ms is not None and chain_ms is not None:
        # secondary, conservative estimator: wall time of a serialized
        # chained loop (includes carry updates + amortized dispatch)
        out["chained_fps"] = round(1000.0 / chain_ms, 2)

    extras = (args.experiment == "cityscapes.bisenet.R18.speed"
              and not args.skip_extras)

    # --- extras, strict priority order against ONE shared deadline: if a
    # higher-priority extra is skipped for budget, everything below it is
    # skipped too (no priority inversion).  With the repo-local compile
    # cache warm these are seconds each; the deadline only bites on a cold
    # cache or a degraded tunnel.
    deadline = t_start + 1100
    budget_dead = [False]

    def budget_left(_gate=None):
        budget_dead[0] = budget_dead[0] or time.time() > deadline
        return not budget_dead[0]

    if extras:
        # X39 headline at its own protocol (reference
        # model/bisenet/cityscapes.bisenet.X39.speed/eval.py): 768x1536.
        # bf16 fused-stem deploy — measured FASTER than int8-through for
        # X39 (1.75 vs 1.94 ms device: depthwise convs gain nothing from
        # int8 and the per-channel requants add work, docs/DESIGN.md).
        # TOP-priority extra (round-3 verdict: the artifact must carry an
        # X39 number), so it is checked FIRST.
        if budget_left():
            try:
                _mark("extra: X39 build")
                x39 = build(args, experiment="cityscapes.bisenet.X39.speed",
                            height=768, width=1536)
                out["x39_768x1536_fps"] = round(
                    1000.0 / measure_profiler(*x39), 2)
                # both estimators, like the headline: the X39 estimator
                # spread is the widest in the zoo (~17%), so the artifact
                # carries the conservative chained number too
                out["x39_chained_fps"] = round(
                    1000.0 / measure_chain(x39, args), 2)
                out["x39_path"] = "bf16-fused-stem"
            except Exception as e:
                out["x39_error"] = f"{type(e).__name__}: {e}"
        else:
            out["x39_skipped"] = (
                f"headline pass took {time.time() - t_start:.0f}s; "
                "skipping to stay inside the bench budget"
            )

        # bf16 fused-stem deploy sibling of the headline (the round-3
        # headline path), for continuity across rounds.
        if out.get("path") == "int8-through" and budget_left():
            try:
                _mark("extra: bf16 deploy build")
                out["bf16_fps"] = round(
                    1000.0 / measure_profiler(*build(args)), 2)
            except Exception as e:
                out["bf16_error"] = f"{type(e).__name__}: {e}"

        # training-throughput headline (DESIGN.md: bs2 @ 1024² bf16 full
        # train step).
        if budget_left():
            try:
                tms = _bench_train(args)
                out["train_ms_per_step"] = round(tms, 2)
                out["train_img_per_s_chip"] = round(2 * 1000.0 / tms, 1)
            except Exception as e:
                out["train_error"] = f"{type(e).__name__}: {e}"
    _mark("done")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
