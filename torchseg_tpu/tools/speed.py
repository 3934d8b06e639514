"""FPS benchmark for any registered experiment — replaces the reference's
``compute_speed`` (furnace/tools/benchmark/compute_speed.py:17-48; CLI hook
model/bisenet/*.speed/eval.py:90-106).

Uses the chained-fori_loop methodology (see /bench.py): N forwards inside one
compiled loop with an inter-iteration data dependency, so dispatch overhead
amortizes and nothing can be elided or cached.

Usage: python -m torchseg_tpu.tools.speed -e cityscapes.bisenet.R18.speed \
           --input-size 1x1024x2048x3
"""

import argparse
import time

import numpy as np


def compute_speed(model, variables, input_shape, chain=150, reps=3,
                  dtype=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(variables, x, seed):
        def body(i, carry):
            x, acc = carry
            scores = model.apply(variables, x, train=False)
            pred = jnp.argmax(scores, axis=-1)
            acc = acc + pred[0, 0, 0]
            # minimal inter-iteration dependency: touch one input element
            # (a full-tensor add would bill extra HBM traffic to the model)
            delta = ((acc % 2).astype(x.dtype) * 1e-8).reshape(
                (1,) * x.ndim
            )
            x = jax.lax.dynamic_update_slice(
                x, x[(slice(0, 1),) * x.ndim] + delta, (0,) * x.ndim
            )
            return (x, acc)

        return jax.lax.fori_loop(0, chain, body, (x + seed, jnp.int32(0)))[1]

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=input_shape).astype(np.float32)
    )
    if dtype is not None:
        x = x.astype(dtype)
    int(chained(variables, x, 0.0))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        int(chained(variables, x, 1e-4 * (r + 1)))
        times.append(time.perf_counter() - t0)
    dt = min(times) / chain
    return {"ms_per_iter": dt * 1000, "fps": 1.0 / dt}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("--input-size", default="1x1024x2048x3")
    p.add_argument("--chain", type=int, default=150,
                   help="iterations per chained run (long chains amortize "
                        "the tunnel dispatch overhead)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--summary", action="store_true",
                   help="print per-module stats table too")
    p.add_argument("--deploy", action="store_true",
                   help="classic-stem BiSeNet only: fused-stem + s2d-input "
                        "serving path (deploy/fused_stem.py)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization of the conv body "
                        "(deploy/quantize.py; calibrated on random inputs "
                        "here — real serving calibrates on val images)")
    p.add_argument("--int8-through", action="store_true",
                   help="int8-THROUGH serving graph (deploy/int8_serve.py): "
                        "uint8 s2d input, int8 activations end-to-end "
                        "through stems+spatial+backbone, bf16 decoder. "
                        "covers the whole zoo (all BiSeNet/PSPNet/PSANet/DFN/FCN).")
    p.add_argument("--int8-decoder", dest="int8_decoder",
                   action="store_true", default=None,
                   help="with --int8-through: force the ARM/refine/FFM/"
                        "head decoder int8 (classic-stem BiSeNet only). "
                        "Default: auto per the round-4 chip A/B (int8 on "
                        "classic-stem, bf16 elsewhere — docs/DESIGN.md)")
    p.add_argument("--bf16-decoder", dest="int8_decoder",
                   action="store_false",
                   help="with --int8-through: force the bf16 decoder "
                        "(the pre-round-4 default; A/B arm)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..experiments.registry import build_model, get_experiment

    cfg = get_experiment(args.experiment)
    dtype = None if args.f32 else jnp.bfloat16
    model = build_model(cfg, axis_name=None, dtype=dtype)
    shape = tuple(int(s) for s in args.input_size.split("x"))

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    if dtype is not None:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32
            else a,
            variables,
        )

    if args.summary:
        from .stats import print_stats

        print_stats(build_model(cfg, axis_name=None), shape)
        # per-op runtime table from a short on-device trace — the reference
        # stat tool's duration column (tools/benchmark/reporter.py:22-93)
        try:
            from .profile import print_op_report

            fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
            x = jnp.zeros(shape, dtype or jnp.float32)
            print(f"--- top ops @ {args.input_size} ---")
            print_op_report(fwd, variables, x, runs=3, n=20)
        except Exception as e:  # profiler unavailable (e.g. tunnel outage)
            print(f"(per-op runtime table unavailable: {e})")

    if args.int8_through:
        from ..deploy.int8_serve import build_int8_serving_for_experiment

        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, shape).astype(np.uint8)
                for _ in range(2)]
        try:
            decoder = (None if args.int8_decoder is None
                       else ("int8" if args.int8_decoder else "bf16"))
            infer, run_pkg, prepare, prep = \
                build_int8_serving_for_experiment(
                    cfg, model, variables, decoder=decoder,
                    calib_images=imgs,
                )
        except ValueError as e:
            raise SystemExit(f"--int8-through: {e}")
        xs = prepare(imgs[0])

        @jax.jit
        def chained(pkg, xs, seed):
            def body(i, carry):
                xs, acc = carry
                pred = infer(pkg, xs)
                acc = acc + pred[0, 0, 0]
                # one-element int8 perturbation: inter-iteration dependency
                # that defeats result caching without billing HBM traffic
                delta = (acc % 2).astype(jnp.int8).reshape(1, 1, 1, 1)
                xs = jax.lax.dynamic_update_slice(
                    xs, xs[:1, :1, :1, :1] ^ delta, (0, 0, 0, 0)
                )
                return (xs, acc)

            return jax.lax.fori_loop(
                0, args.chain, body, (xs ^ seed, jnp.int32(0))
            )[1]

        int(chained(run_pkg, xs, jnp.int8(0)))
        times = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            int(chained(run_pkg, xs, jnp.int8(r + 1)))
            times.append(time.perf_counter() - t0)
        dt = min(times) / args.chain
        res = {"ms_per_iter": dt * 1000, "fps": 1.0 / dt}
        # resolve the EFFECTIVE decoder (the auto default lands on int8
        # for classic-stem, i.e. the s2d prep — same resolution as
        # deploy/export.py) so printed tags name the graph actually run
        eff_int8_dec = (args.int8_decoder if args.int8_decoder is not None
                        else prep["format"] == "s2d")
        tag = ("int8-through+dec" if eff_int8_dec
               else "int8-through(bf16-dec)")
        print(
            f"{args.experiment} [{tag}] @ {args.input_size}: "
            f"{res['ms_per_iter']:.3f} ms/iter, {res['fps']:.1f} FPS"
        )
        return res

    apply_fn = model.apply
    tag = ""
    if args.int8:
        from ..deploy.quantize import calibrate, quantized_apply_fn

        rng = np.random.default_rng(0)
        calib = [
            jnp.asarray(rng.normal(size=shape).astype(np.float32))
            for _ in range(2)
        ]
        scales = calibrate(model, variables, calib)
        apply_fn = quantized_apply_fn(model, scales)
        tag = " [int8]"

    class _Model:
        apply = staticmethod(
            lambda v, x, train=False, **kw: apply_fn(v, x, **kw)
        )

    model_for_speed = _Model if args.int8 else model

    if args.deploy:
        import jax.numpy as _jnp

        from ..deploy.fused_stem import _fused_stem_s2d

        p = variables["params"]
        if ("spatial_path" not in p
                or "conv1" not in p.get("backbone", {})):
            raise SystemExit(
                f"--deploy needs a classic-stem BiSeNet experiment "
                f"(spatial_path conv_7x7 + backbone conv1); "
                f"'{args.experiment}' ({cfg.model}) has neither — "
                f"run without --deploy."
            )

        b, h, w, _ = shape

        class _DeployModel:
            """model-like shim consuming the s2d serving input format
            (1, H/2, W/2, 12); see deploy/prepare_s2d_input.  With --int8
            the body convs run quantized (the fused stem stays bf16 — the
            first layer is the standard skip)."""

            @staticmethod
            def apply(v, xs, train=False):
                del train
                stems = _fused_stem_s2d(v, xs, cfg.bn_eps)
                dummy = _jnp.zeros((b, h, w, 3), xs.dtype)  # DCE'd
                return apply_fn(v, dummy, train=False, stem_outs=stems)

        res = compute_speed(_DeployModel, variables,
                            (b, h // 2, w // 2, 12), args.chain,
                            args.reps, dtype)
        print(
            f"{args.experiment} [deploy]{tag} @ {args.input_size}: "
            f"{res['ms_per_iter']:.3f} ms/iter, {res['fps']:.1f} FPS"
        )
        return res

    res = compute_speed(model_for_speed, variables, shape, args.chain,
                        args.reps, dtype)
    print(
        f"{args.experiment}{tag} @ {args.input_size}: "
        f"{res['ms_per_iter']:.3f} ms/iter, {res['fps']:.1f} FPS"
    )
    return res


if __name__ == "__main__":
    main()
