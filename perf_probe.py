"""Per-variant device-time probe on the real chip — the measurement harness
behind docs/DESIGN.md's round-2 tables.

Reports XLA-module device time (min over K distinct pre-uploaded inputs,
read from the profiler xplane — wall times through the dev tunnel are
unreliable) and optionally the top XLA ops by summed duration.

Variants:
  base / pool / sep / seppool / nosplit / mpslice / prepad  — stem epilogue
    alternatives for the BiSeNet-R18.speed serving graph (all measured
    slower than or equal to base; see DESIGN.md);
  batchN       — batch-N serving;
  chain/chainu — the serialized chained-loop estimator's device+wall cost;
  fullres[-fused] — non-speed full-res serving, XLA vs Pallas epilogue;
  train[-remat|-nondonate] — one train step with per-op attribution;
  augment      — the device-side augmentation pipeline.

Usage: python perf_probe.py --variant train --top-ops 20
"""

import argparse
import glob
import shutil

import numpy as np


def measure(infer, variables, make_input, k=6, tag="", top_ops=0):
    import jax

    xs_list = [make_input(i) for i in range(k)]
    infer(variables, xs_list[0]).block_until_ready()
    logdir = "/tmp/probe_trace_" + tag
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for xs in xs_list:
            infer(variables, xs).block_until_ready()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    times = []
    ops = {}
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                times.extend(ev.duration_ps / 1e9 for ev in line.events)
            if line.name == "XLA Ops" and top_ops:
                names = {e.id: e.name for e in plane.event_metadata.values()}
                for ev in line.events:
                    nm = names.get(ev.metadata_id, str(ev.metadata_id))
                    ops[nm] = ops.get(nm, 0.0) + ev.duration_ps / 1e9
    if top_ops and ops:
        print(f"--- top ops [{tag}] (summed over {k} runs, ms) ---")
        for nm, t in sorted(ops.items(), key=lambda kv: -kv[1])[:top_ops]:
            print(f"  {t / k:8.3f}  {nm}")
    return min(times)


def train_probe(args):
    """Profile one train step (bs2 @ 1024x1024 bf16 BiSeNet-R18, the round-1
    reference point) with per-op attribution.
    variants: train (baseline) | train-remat | train-nondonate"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from torchseg_tpu.engine.lr_policy import PolyLR
    from torchseg_tpu.engine.optim import make_lr_mult_tree, make_wd_tree
    from torchseg_tpu.engine.trainer import Trainer, make_data_mesh
    from torchseg_tpu.experiments.registry import (
        build_loss_fn,
        build_model,
        get_experiment,
    )

    cfg = get_experiment("cityscapes.bisenet.R18")
    cfg = dataclasses.replace(cfg, image_height=args.height,
                              image_width=args.height, batch_size=2,
                              remat="remat" in args.variant)
    mesh = make_data_mesh()
    model = build_model(cfg, axis_name="data", dtype=jnp.bfloat16)
    loss_fn = build_loss_fn(cfg, num_shards=1)
    trainer = Trainer(model, loss_fn, PolyLR(cfg.lr, cfg.lr_power, 10000),
                      sgd_momentum=cfg.momentum, mesh=mesh,
                      donate="nondonate" not in args.variant)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(
            size=(2, cfg.image_height, cfg.image_width, 3)
        ).astype(np.float32)),
        "label": jnp.asarray(rng.integers(
            0, cfg.num_classes, size=(2, cfg.image_height, cfg.image_width)
        ).astype(np.int32)),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    trainer.configure_groups(
        make_lr_mult_tree(state.params, cfg.business_lr_mult),
        make_wd_tree(state.params, cfg.weight_decay),
    )
    state, loss, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    float(loss)

    import shutil

    logdir = "/tmp/probe_trace_" + args.variant
    shutil.rmtree(logdir, ignore_errors=True)
    k = 4
    with jax.profiler.trace(logdir):
        for i in range(k):
            state, loss, _ = trainer.train_step(
                state, batch, jax.random.PRNGKey(2 + i)
            )
            float(loss)

    import glob as _g

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(_g.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    times = []
    ops = {}
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                times.extend(ev.duration_ps / 1e9 for ev in line.events)
            if line.name == "XLA Ops" and args.top_ops:
                names = {e.id: e.name for e in plane.event_metadata.values()}
                for ev in line.events:
                    nm = names.get(ev.metadata_id, str(ev.metadata_id))
                    ops[nm] = ops.get(nm, 0.0) + ev.duration_ps / 1e9
    # keep only train-step modules (init/eval modules are tiny)
    big = [t for t in times if t > max(times) * 0.5]
    if args.top_ops and ops:
        print(f"--- top train ops (avg ms over {k} steps) ---")
        for nm, t in sorted(ops.items(), key=lambda kv: -kv[1])[
            : args.top_ops
        ]:
            print(f"  {t / k:8.3f}  {nm[:160]}")
    ms = min(big)
    imgs = 2 * 1000 / ms
    print(f"[{args.variant}] device {ms:.1f} ms/step, {imgs:.2f} img/s/chip")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="base",
                   help="base|pool|batch2|batch4|flags")
    p.add_argument("--top-ops", type=int, default=0)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    args = p.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    if not os.environ.get("PROBE_NO_CCACHE"):
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_ccache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.variant.startswith("train"):
        train_probe(args)
        return

    if args.variant == "sliding":
        # ss sliding-eval device time per 1024x2048 image (non-speed R18)
        from torchseg_tpu.engine.evaluator import Evaluator
        from torchseg_tpu.experiments.registry import (
            build_model as _bm,
            get_experiment as _ge,
        )

        cfg = _ge("cityscapes.bisenet.R18")
        model = _bm(cfg, axis_name=None)
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
        ev = Evaluator(
            lambda v, x: model.apply(v, x, train=False),
            variables, cfg.num_classes, cfg.image_mean, cfg.image_std,
            multi_scales=cfg.eval_scale_array, is_flip=cfg.eval_flip,
            crop_size=cfg.eval_crop_size, stride_rate=cfg.eval_stride_rate,
        )
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (1024, 2048, 3)).astype(np.uint8)
                for _ in range(3)]
        ev.sliding_eval(imgs[0])  # compile
        import shutil
        import time as _t

        shutil.rmtree("/tmp/probe_trace_sliding", ignore_errors=True)
        t0 = _t.perf_counter()
        with jax.profiler.trace("/tmp/probe_trace_sliding"):
            for im in imgs:
                ev.sliding_eval(im)
        wall = (_t.perf_counter() - t0) / len(imgs) * 1000
        import glob as _g

        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        path = sorted(
            _g.glob("/tmp/probe_trace_sliding/plugins/profile/*/*.xplane.pb")
        )[-1]
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        dev_total = 0.0
        for plane in space.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    dev_total += sum(
                        ev_.duration_ps / 1e9 for ev_ in line.events
                    )
        print(f"[sliding] {wall:.0f} ms/img wall, "
              f"{dev_total / len(imgs):.0f} ms/img device")
        return

    if args.variant == "augment":
        from torchseg_tpu.data.device_augment import make_device_augment

        fn = make_device_augment(
            (1024, 1024), (0.75, 1.0, 1.5),
            np.array([0.485, 0.456, 0.406], np.float32),
            np.array([0.229, 0.224, 0.225], np.float32),
        )
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.integers(0, 256, (2, 1024, 2048, 3)).astype(np.uint8))
        gts = jnp.asarray(
            rng.integers(0, 19, (2, 1024, 2048)).astype(np.uint8))
        ms = measure(
            lambda _v, k: fn(k, imgs, gts)[0],
            None,
            lambda seed: jax.random.PRNGKey(seed),
            tag="augment", top_ops=args.top_ops,
        )
        print(f"[augment] device {ms:.3f} ms for bs2 1024x2048 -> 1024^2")
        return

    if args.variant.startswith("int8"):
        # int8-through serving graph per-op profile (the round-5 kernel
        # chain's measurement harness).  "int8" = shipped defaults;
        # "int8-xla" forces the round-4 XLA arms (stem_mode="s8");
        # "int8-l1nr16" / "int8-l2nr16" / "int8-nr16" override the fused
        # stage kernels' block sizes for the halo-amortization A/B.
        from torchseg_tpu.deploy import int8_serve as _i8
        from torchseg_tpu.deploy.int8_serve import (
            build_int8_serving_for_experiment,
        )

        if "nr16" in args.variant:
            both = ("l1nr16" not in args.variant
                    and "l2nr16" not in args.variant)
            if "l1nr16" in args.variant or both:
                _i8._L1_NR = 16
            if "l2nr16" in args.variant or both:
                _i8._L2_NR = 16
                _i8._L3_NR = 16
                _i8._L4_NR = 16
        if "l3" in args.variant:
            _i8._L3_ENABLE = True
        if "l4" in args.variant or "l34" in args.variant:
            _i8._L4_ENABLE = True
        if "pin" in args.variant:
            from torchseg_tpu.ops.pallas import int8_serve_kernels as _ik
            _ik._PIN_X32_LAYOUT = True
        from torchseg_tpu.experiments.registry import (
            build_model as _bm,
            get_experiment as _ge,
        )

        cfg = _ge("cityscapes.bisenet.R18.speed")
        model = _bm(cfg, axis_name=None, dtype=jnp.bfloat16)
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)),
                               train=True)
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, variables)
        rng = np.random.default_rng(0)
        shape = (1, args.height, args.width, 3)
        calib = [rng.integers(0, 255, shape).astype(np.uint8)
                 for _ in range(2)]
        stem_mode = "s8" if args.variant == "int8-xla" else None
        infer, run_pkg, prepare, _prep = build_int8_serving_for_experiment(
            cfg, model, variables, calib_images=calib,
            stem_mode=stem_mode)
        ms = measure(
            infer, run_pkg,
            lambda seed: jnp.asarray(prepare(
                np.random.default_rng(seed + 1).integers(
                    0, 255, shape).astype(np.uint8))),
            tag=args.variant, top_ops=args.top_ops,
        )
        print(f"[{args.variant}] device {ms:.3f} ms "
              f"({1000.0 / ms:.1f} FPS) @ {args.height}x{args.width}")
        return

    from torchseg_tpu.deploy.fused_stem import (
        _fused_stem_s2d,
        prepare_s2d_input,
    )
    from torchseg_tpu.experiments.registry import build_model, get_experiment

    exp = ("cityscapes.bisenet.R18" if args.variant.startswith("fullres")
           else "cityscapes.bisenet.R18.speed")
    cfg = get_experiment(exp)
    model = build_model(cfg, axis_name=None, dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )
    h, w = args.height, args.width
    batch = 1
    pool = False
    if args.variant == "pool":
        pool = True
    elif args.variant.startswith("batch"):
        batch = int(args.variant[5:])

    from torchseg_tpu.deploy.fused_stem import fold_bn_affine

    def _sep_stems(variables, xs, pool_bb):
        """Two separate s2d convs (one per stem) instead of one 128ch conv +
        split: each output is born in its consumer's layout."""
        p, s = variables["params"], variables["batch_stats"]
        outs = []
        for k, bnp, bns in (
            (p["spatial_path"]["conv_7x7"]["conv"]["kernel"],
             p["spatial_path"]["conv_7x7"]["bn"],
             s["spatial_path"]["conv_7x7"]["bn"]),
            (p["backbone"]["conv1"]["kernel"],
             p["backbone"]["bn1"], s["backbone"]["bn1"]),
        ):
            a, b = fold_bn_affine(bnp, bns, cfg.bn_eps)
            dt = xs.dtype
            c, cout = k.shape[2], k.shape[3]
            wpad = jnp.pad(k.astype(dt), ((1, 0), (1, 0), (0, 0), (0, 0)))
            wk = wpad.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
            wk = wk.reshape(4, 4, 4 * c, cout)
            o = jax.lax.conv_general_dilated(
                xs, wk, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            outs.append(jnp.maximum(o * a.astype(dt) + b.astype(dt), 0))
        sp, bb = outs
        if pool_bb:
            from flax import linen as nn

            bb_p = nn.max_pool(bb, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])
            return sp, None, bb_p
        return sp, bb, None

    def _nosplit_stems(variables, xs):
        """No-split serving: full 128ch stem activation with ONE layout; the
        spatial branch's first conv reads it with a zero-extended (128-in)
        kernel, the backbone maxpools the full tensor and slices after."""
        from flax import linen as nn

        p, st = variables["params"], variables["batch_stats"]
        k_sp = p["spatial_path"]["conv_7x7"]["conv"]["kernel"]
        k_bb = p["backbone"]["conv1"]["kernel"]
        a_sp, b_sp = fold_bn_affine(
            p["spatial_path"]["conv_7x7"]["bn"],
            st["spatial_path"]["conv_7x7"]["bn"], cfg.bn_eps)
        a_bb, b_bb = fold_bn_affine(p["backbone"]["bn1"],
                                    st["backbone"]["bn1"], cfg.bn_eps)
        dt = xs.dtype
        kernel = jnp.concatenate([k_sp, k_bb], axis=-1).astype(dt)
        a = jnp.concatenate([a_sp, a_bb]).astype(dt)
        b = jnp.concatenate([b_sp, b_bb]).astype(dt)
        c, cout = kernel.shape[2], kernel.shape[3]
        wpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        wk = wpad.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
        wk = wk.reshape(4, 4, 4 * c, cout)
        y = jax.lax.conv_general_dilated(
            xs, wk, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y * a + b, 0)  # full 128ch, ONE tensor

        n = k_sp.shape[-1]
        # spatial branch: conv_3x3_1 with in-channels zero-extended to 128
        k1 = p["spatial_path"]["conv_3x3_1"]["conv"]["kernel"].astype(dt)
        k1 = jnp.pad(k1, ((0, 0), (0, 0), (0, cout - n), (0, 0)))
        a1, b1 = fold_bn_affine(p["spatial_path"]["conv_3x3_1"]["bn"],
                                st["spatial_path"]["conv_3x3_1"]["bn"],
                                cfg.bn_eps)
        sp = jax.lax.conv_general_dilated(
            y, k1, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sp = jnp.maximum(sp * a1.astype(dt) + b1.astype(dt), 0)
        for name, stride in (("conv_3x3_2", 2), ("conv_1x1", 1)):
            k = p["spatial_path"][name]["conv"]["kernel"].astype(dt)
            pad = (k.shape[0] - 1) // 2
            ai, bi = fold_bn_affine(p["spatial_path"][name]["bn"],
                                    st["spatial_path"][name]["bn"],
                                    cfg.bn_eps)
            sp = jax.lax.conv_general_dilated(
                sp, k, (stride, stride), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            sp = jnp.maximum(sp * ai.astype(dt) + bi.astype(dt), 0)
        # backbone: pool the full tensor, slice the bb half after
        bbp = nn.max_pool(y, (3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)])[..., n:]
        return sp, bbp

    def maxpool_slices(x):
        """3x3/2 pad-1 maxpool as a max of 9 strided slices — fuses into one
        kLoop with layout freedom (reduce_window pins a layout + copy)."""
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, x.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=neg)
        b, hp, wp, c = xp.shape
        oh, ow = x.shape[1] // 2, x.shape[2] // 2
        m = None
        for dy in range(3):
            for dx in range(3):
                v = jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (b, dy + 2 * (oh - 1) + 1, dx + 2 * (ow - 1) + 1, c),
                    (1, 2, 2, 1),
                )
                m = v if m is None else jnp.maximum(m, v)
        return m

    def _fused_stem_s2d_valid(variables, xs):
        """Like _fused_stem_s2d but expects the host to pre-pad the s2d input
        by (2,1)x(2,1), so the conv runs VALID (no pad mask in the fusion)."""
        p, s = variables["params"], variables["batch_stats"]
        k_sp = p["spatial_path"]["conv_7x7"]["conv"]["kernel"]
        k_bb = p["backbone"]["conv1"]["kernel"]
        a_sp, b_sp = fold_bn_affine(
            p["spatial_path"]["conv_7x7"]["bn"],
            s["spatial_path"]["conv_7x7"]["bn"], cfg.bn_eps)
        a_bb, b_bb = fold_bn_affine(p["backbone"]["bn1"],
                                    s["backbone"]["bn1"], cfg.bn_eps)
        dt = xs.dtype
        kernel = jnp.concatenate([k_sp, k_bb], axis=-1).astype(dt)
        a = jnp.concatenate([a_sp, a_bb]).astype(dt)
        b = jnp.concatenate([b_sp, b_bb]).astype(dt)
        c, cout = kernel.shape[2], kernel.shape[3]
        wpad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        wk = wpad.reshape(4, 2, 4, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
        wk = wk.reshape(4, 4, 4 * c, cout)
        out = jax.lax.conv_general_dilated(
            xs, wk, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jnp.maximum(out * a + b, 0)
        n = k_sp.shape[-1]
        return out[..., :n], out[..., n:], None

    @jax.jit
    def infer(variables, xs):
        if args.variant.startswith("fullres"):
            # non-speed model (x8 main head): full-res prediction serving
            stems = _fused_stem_s2d(variables, xs, cfg.bn_eps)
            b, h2, w2, _ = xs.shape
            dummy = jnp.zeros((b, h2 * 2, w2 * 2, 3), xs.dtype)
            if args.variant == "fullres-fused":
                from torchseg_tpu.ops.pallas.upsample_argmax import (
                    fused_upsample_argmax,
                )

                raw = model.apply(variables, dummy, train=False,
                                  stem_outs=stems, raw_logits=True)
                return fused_upsample_argmax(
                    raw, (raw.shape[1] * 8, raw.shape[2] * 8)
                )
            scores = model.apply(variables, dummy, train=False,
                                 stem_outs=stems)
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        if args.variant == "prepad":
            stems = _fused_stem_s2d_valid(variables, xs)
            dummy = jnp.zeros((batch, h, w, 3), xs.dtype)
            scores = model.apply(variables, dummy, train=False,
                                 stem_outs=stems)
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        if args.variant == "mpslice":
            sp, bb, _ = _fused_stem_s2d(variables, xs, cfg.bn_eps)
            bbp = maxpool_slices(bb)
            dummy = jnp.zeros((batch, h, w, 3), xs.dtype)
            scores = model.apply(variables, dummy, train=False,
                                 stem_outs=(sp, None, bbp))
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        if args.variant == "nosplit":
            sp, bbp = _nosplit_stems(variables, xs)
            dummy = jnp.zeros((batch, h, w, 3), xs.dtype)
            scores = model.apply(variables, dummy, train=False,
                                 stem_outs=(None, None, bbp),
                                 spatial_out=sp)
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        if args.variant in ("sep", "seppool"):
            stems = _sep_stems(variables, xs, args.variant == "seppool")
        else:
            stems = _fused_stem_s2d(variables, xs, cfg.bn_eps, pool=pool)
        dummy = jnp.zeros((batch, h, w, 3), xs.dtype)
        scores = model.apply(variables, dummy, train=False, stem_outs=stems)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    def make_input(seed):
        img = (
            np.random.default_rng(seed)
            .normal(size=(batch, h, w, 3))
            .astype(np.float32)
        )
        xs = prepare_s2d_input(img, dtype=jnp.bfloat16)
        if args.variant == "prepad":
            xs = jnp.asarray(np.pad(np.asarray(xs),
                                    ((0, 0), (2, 1), (2, 1), (0, 0))))
        return xs

    if args.variant == "chainu":
        # unrolled chain: same serialized data dependency, fewer loop
        # boundaries — isolates the fori_loop's per-iteration sync cost
        import time as _t

        n = 48

        @jax.jit
        def chained(variables, xs, seed):
            def body(i, carry):
                xs, acc = carry
                pred = infer(variables, xs)
                acc = acc + pred[0, 0, 0]
                delta = ((acc % 2).astype(xs.dtype) * 1e-8).reshape(
                    1, 1, 1, 1)
                xs = jax.lax.dynamic_update_slice(
                    xs, xs[:1, :1, :1, :1] + delta, (0, 0, 0, 0)
                )
                return (xs, acc)

            return jax.lax.fori_loop(0, n, body, (xs + seed, jnp.int32(0)),
                                     unroll=8)[1]

        xs = make_input(0)
        int(chained(variables, xs, 0.0))
        import shutil

        logdir = "/tmp/probe_trace_chainu"
        shutil.rmtree(logdir, ignore_errors=True)
        walls = []
        with jax.profiler.trace(logdir):
            for r in range(3):
                t0 = _t.perf_counter()
                int(chained(variables, xs, 1e-4 * (r + 1)))
                walls.append(_t.perf_counter() - t0)
        import glob as _g

        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        path = sorted(_g.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
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
        dev = min(times) / n
        wall = min(walls) / n * 1000
        print(f"[chainu] device {dev:.3f} ms/iter, wall {wall:.3f} ms/iter "
              f"({1000 / dev:.1f} / {1000 / wall:.1f} FPS)")
        return

    if args.variant == "chain":
        # device time of the whole chained loop (the conservative estimator's
        # graph), per iteration — isolates loop/carry overhead from host time
        import time as _t

        n = 25

        @jax.jit
        def chained(variables, xs, seed):
            def body(i, carry):
                xs, acc = carry
                pred = infer(variables, xs)
                acc = acc + pred[0, 0, 0]
                delta = ((acc % 2).astype(xs.dtype) * 1e-8).reshape(
                    1, 1, 1, 1)
                xs = jax.lax.dynamic_update_slice(
                    xs, xs[:1, :1, :1, :1] + delta, (0, 0, 0, 0)
                )
                return (xs, acc)

            return jax.lax.fori_loop(0, n, body, (xs + seed, jnp.int32(0)))[1]

        xs = make_input(0)
        int(chained(variables, xs, 0.0))
        import shutil

        logdir = "/tmp/probe_trace_chain"
        shutil.rmtree(logdir, ignore_errors=True)
        walls = []
        with jax.profiler.trace(logdir):
            for r in range(3):
                t0 = _t.perf_counter()
                int(chained(variables, xs, 1e-4 * (r + 1)))
                walls.append(_t.perf_counter() - t0)
        import glob as _g

        from tensorflow.tsl.profiler.protobuf import xplane_pb2

        path = sorted(_g.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
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
        dev = min(times) / n
        wall = min(walls) / n * 1000
        print(f"[chain] device {dev:.3f} ms/iter, wall {wall:.3f} ms/iter "
              f"({1000 / dev:.1f} / {1000 / wall:.1f} FPS)")
        return

    ms = measure(infer, variables, make_input, tag=args.variant,
                 top_ops=args.top_ops)
    per_img = ms / batch
    print(f"[{args.variant}] device {ms:.3f} ms/call, {per_img:.3f} ms/img, "
          f"{1000 / per_img:.1f} FPS/img")


if __name__ == "__main__":
    main()
