"""Training-throughput benchmark: steps/s and images/s of the full
data-parallel train step (forward + OHEM/CE loss + backward + grad pmean +
SGD) for any experiment, with N steps chained inside one compiled scan so
dispatch overhead amortizes.

Usage: python -m torchseg_tpu.tools.train_speed -e cityscapes.bisenet.R18 \
          --crop 512 512 --batch-size 8 --steps 20
"""

import argparse
import dataclasses
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", dest="remat", action="store_true",
                   default=None,
                   help="force jax.checkpoint on backbone blocks (A/B the "
                        "activation-memory/recompute trade)")
    p.add_argument("--no-remat", dest="remat", action="store_false")
    p.add_argument("--top-ops", type=int, default=0,
                   help="print the top-N ops by device time from a short "
                        "XLA trace of the train step (tools/profile)")
    p.add_argument("--fused-loss", dest="fused_loss", action="store_true",
                   default=None,
                   help="A/B the fused upsample+loss gate "
                        "(ops/losses.FUSED_UPSAMPLE_LOSS): raw train heads, "
                        "loss owns the x-scale upsample row-tiled")
    p.add_argument("--no-fused-loss", dest="fused_loss",
                   action="store_false")
    p.add_argument("--memory", action="store_true",
                   help="print XLA's compile-time memory analysis of the "
                        "train step (per-device temp/arg/output bytes — "
                        "the HBM high-water estimate; works through the "
                        "tunnel, which hides runtime memory_stats)")
    p.add_argument("--memory-only", action="store_true",
                   help="like --memory but skip execution entirely "
                        "(compile-only; safe for configs near/over HBM)")
    args = p.parse_args(argv)

    if args.fused_loss is not None:
        from ..ops import losses as _losses
        _losses.FUSED_UPSAMPLE_LOSS = args.fused_loss

    import jax

    from ..utils.misc import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the compile
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..engine.lr_policy import PolyLR
    from ..engine.optim import make_lr_mult_tree, make_wd_tree, sgd_update
    from ..engine.trainer import TrainState, make_data_mesh
    from ..experiments.registry import (
        build_loss_fn,
        build_model,
        get_experiment,
    )

    cfg = get_experiment(args.experiment)
    if args.crop:
        cfg = dataclasses.replace(
            cfg, image_height=args.crop[0], image_width=args.crop[1]
        )
    if args.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.remat is not None:
        cfg = dataclasses.replace(cfg, remat=args.remat)

    mesh = make_data_mesh()
    n_dev = mesh.devices.size
    dtype = jnp.bfloat16 if args.bf16 else None
    model = build_model(cfg, axis_name="data", dtype=dtype)
    loss_fn = build_loss_fn(cfg, num_shards=n_dev)
    lr_schedule = PolyLR(cfg.lr, cfg.lr_power, 10000)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.normal(
                size=(cfg.batch_size, cfg.image_height, cfg.image_width, 3)
            ).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(
                0,
                cfg.num_classes,
                size=(
                    cfg.batch_size,
                    cfg.image_height // cfg.gt_down_sampling,
                    cfg.image_width // cfg.gt_down_sampling,
                ),
            ).astype(np.int32)
        ),
    }
    if cfg.loss == "dfn":
        batch["aux_label"] = jnp.asarray(
            rng.integers(
                0, 2, size=(cfg.batch_size, cfg.image_height, cfg.image_width)
            ).astype(np.int32)
        )

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["image"][:1],
        train=True,
    )
    state = TrainState.create(variables)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    lr_mult = make_lr_mult_tree(state.params, cfg.business_lr_mult)
    wd = make_wd_tree(state.params, cfg.weight_decay)
    n_steps = args.steps

    def one_step(state, batch, drng):
        def loss_wrapped(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drng},
            )
            return loss_fn(outs, batch), mutated["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, "data")
        lr = lr_schedule(state.step)
        params, mom = sgd_update(
            state.params, grads, state.momentum, lr,
            momentum=cfg.momentum, lr_mult=lr_mult, wd=wd,
        )
        return (
            TrainState(params, stats, mom, state.step + 1),
            jax.lax.pmean(loss, "data"),
        )

    def chain(state, batch, key):
        def body(i, carry):
            state, acc = carry
            state, loss = one_step(state, batch, jax.random.fold_in(key, i))
            return (state, acc + loss)

        return jax.lax.fori_loop(
            0, n_steps, body, (state, jnp.float32(0))
        )

    sharded = shard_map(
        chain,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    fn = jax.jit(sharded)

    if args.memory or args.memory_only:
        t0 = time.perf_counter()
        compiled = fn.lower(state, batch, jax.random.PRNGKey(2)).compile()
        print(f"compile (AOT) {time.perf_counter() - t0:.1f}s")
        mem = {}
        try:
            ma = compiled.memory_analysis()
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes"):
                mem[k] = int(getattr(ma, k, 0) or 0)
        except Exception as e:
            print(f"(memory analysis unavailable: {e})")
        if mem:
            gib = 1024 ** 3
            # arguments alias into outputs (donated state); high-water is
            # live args + temporaries
            hw = mem["temp_size_in_bytes"] + mem["argument_size_in_bytes"]
            print(
                f"memory analysis (per device): "
                f"temp {mem['temp_size_in_bytes'] / gib:.2f} GiB, "
                f"args {mem['argument_size_in_bytes'] / gib:.2f} GiB, "
                f"out {mem['output_size_in_bytes'] / gib:.2f} GiB, "
                f"aliased {mem['alias_size_in_bytes'] / gib:.2f} GiB "
                f"-> high-water ~{hw / gib:.2f} GiB"
            )
        if args.memory_only:
            return {"memory": mem}

    t0 = time.perf_counter()
    out_state, acc = fn(state, batch, jax.random.PRNGKey(2))
    float(acc)
    print(f"compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        _, acc = fn(state, batch, jax.random.PRNGKey(3 + r))
        float(acc)
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_steps
    if args.top_ops:
        try:
            from .profile import collect_op_times, top_ops_table

            _, ops = collect_op_times(
                lambda: fn(state, batch, jax.random.PRNGKey(9)), runs=1
            )
            # divide by the chained step count for per-step attribution
            ops = {k: v / n_steps for k, v in ops.items()}
            print(f"--- top train ops (ms/step over {n_steps}-step chain) ---")
            print(top_ops_table(ops, args.top_ops))
        except Exception as e:
            print(f"(top-ops table unavailable: {e})")
    peak_gb = None
    try:  # HBM high-water (not available on all backends)
        stats = jax.local_devices()[0].memory_stats()
        peak_gb = stats.get("peak_bytes_in_use", 0) / 1024 ** 3
    except Exception:
        pass
    print(
        f"{args.experiment} bs={cfg.batch_size} "
        f"{cfg.image_height}x{cfg.image_width} on {n_dev} dev: "
        f"{dt * 1000:.1f} ms/step, {cfg.batch_size / dt:.1f} img/s"
        + (f", peak HBM {peak_gb:.2f} GiB/dev" if peak_gb else "")
    )
    return {"ms_per_step": dt * 1000, "img_per_s": cfg.batch_size / dt,
            "peak_hbm_gib": peak_gb}


if __name__ == "__main__":
    main()
