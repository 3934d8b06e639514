"""AOT serving artifacts via ``jax.export`` — code-free deployment.

The reference has no export story: deploying TorchSeg means shipping the
model source tree plus a ``.pth`` and re-running python
(``model/*/eval.py`` imports ``network.py`` at serve time).  A TPU
production service wants the opposite: an ahead-of-time artifact —
weights embedded as constants, the uint8→normalized-float preprocessing
inside the graph, serialized StableHLO that any process with jax
installed can load and call.  No torchseg_tpu, no flax, no model code,
no checkpoint format at the serving site; the graph is also
platform-checked (a CPU build refuses to run an artifact exported only
for TPU) and version-stamped by jax.export's calling-convention
contract.

Artifact layout (a directory):
    graph.bin   jax.export serialized Exported (weights are constants)
    meta.json   experiment/shape/output contract + provenance

Usage:
    torchseg-export -e cityscapes.bisenet.R18.speed -o /tmp/r18.art \
        --checkpoint snapshot/epoch-last.ckpt
    # at the serving site:
    from torchseg_tpu.deploy.export import load_artifact   # or 8 lines
    infer, meta = load_artifact("/tmp/r18.art")            # of raw jax
    labels = infer(u8_image)                               # (1,H,W) int32
"""

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

GRAPH_FILE = "graph.bin"
PREPARE_FILE = "prepare.bin"
META_FILE = "meta.json"


def build_serving_fn(
    model,
    variables,
    *,
    image_mean: Sequence[float],
    image_std: Sequence[float],
    output: str = "labels",
    dtype=jnp.bfloat16,
) -> Callable:
    """``fn(img_u8: uint8 NHWC) -> int32 labels`` (or log-softmax scores).

    The whole serving contract lives inside the graph: uint8 input, the
    reference's normalize (img/255 - mean)/std (datasets' preprocess,
    ref furnace/datasets/BaseDataset + per-experiment config norm), the
    eval forward, and the argmax epilogue.  ``variables`` are closed
    over, so jax.export embeds them as constants → self-contained
    artifact.
    """
    if output not in ("labels", "scores"):
        raise ValueError(f"output must be 'labels'|'scores', got {output!r}")
    mean = jnp.asarray(image_mean, dtype)
    std = jnp.asarray(image_std, dtype)

    def fn(img_u8):
        x = (img_u8.astype(dtype) / jnp.asarray(255.0, dtype) - mean) / std
        scores = model.apply(variables, x, train=False)
        if output == "labels":
            return jnp.argmax(scores, axis=-1).astype(jnp.int32)
        return scores

    return fn


def make_prepare_graph(prep: Dict[str, Any]) -> Callable:
    """jax twin of the host-side int8 input prep (int8_serve.prepare_*),
    built from its declarative description — so the int8 artifact keeps
    the uint8-image contract without shipping numpy code.  Exported as a
    SEPARATE graph: fusing the s2d rearrangement into the conv graph pins
    hostile layouts on TPU (docs/DESIGN.md); as its own dispatch it is a
    cheap elementwise shuffle and halves H2D bytes (u8 3ch in)."""
    mean = np.asarray(prep["image_mean"], np.float64)
    padv_rgb = (np.round(mean * 255.0) - 128).astype(np.int16)

    if prep["format"] == "s2d":
        (pt, pb), (pl, pr) = prep["pads"]
        padv = np.tile(padv_rgb, 4)

        def fn(img_u8):
            b, h, w, c = img_u8.shape
            xs = img_u8.reshape(b, h // 2, 2, w // 2, 2, c)
            xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
                b, h // 2, w // 2, 4 * c
            )
            xi = xs.astype(jnp.int16) - 128
            out = jnp.broadcast_to(
                jnp.asarray(padv),
                (b, h // 2 + pt + pb, w // 2 + pl + pr, 4 * c),
            )
            out = out.at[:, pt:pt + h // 2, pl:pl + w // 2, :].set(xi)
            return jnp.clip(out, -128, 127).astype(jnp.int8)

    elif prep["format"] == "pad":
        p = int(prep["pad"])

        def fn(img_u8):
            b, h, w, c = img_u8.shape
            out = jnp.broadcast_to(
                jnp.asarray(padv_rgb), (b, h + 2 * p, w + 2 * p, c)
            )
            out = out.at[:, p:p + h, p:p + w, :].set(
                img_u8.astype(jnp.int16) - 128
            )
            return jnp.clip(out, -128, 127).astype(jnp.int8)

    else:
        raise ValueError(f"unknown prep format {prep['format']!r}")
    return fn


def export_serving(
    fn: Callable,
    example_args: Tuple,
    *,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> jax_export.Exported:
    """Lower + serialize ``fn`` for the given platforms (no compile, no
    device needed — TPU lowering works from a CPU host)."""
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype
                                       if not hasattr(a, "dtype") else a.dtype),
        tuple(example_args),
    )
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*specs)


def save_artifact(
    path: str,
    exported: jax_export.Exported,
    meta: Optional[Dict[str, Any]] = None,
    prepare: Optional[jax_export.Exported] = None,
) -> str:
    """Write the artifact directory (graph.bin [+ prepare.bin] +
    meta.json)."""
    os.makedirs(path, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(path, GRAPH_FILE), "wb") as f:
        f.write(blob)
    if prepare is not None:
        with open(os.path.join(path, PREPARE_FILE), "wb") as f:
            f.write(prepare.serialize())
    full_meta = {
        "format": "torchseg-tpu-serving/1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "graph_bytes": len(blob),
        "has_prepare": prepare is not None,
        **(meta or {}),
    }
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(full_meta, f, indent=2, sort_keys=True)
    return path


def load_artifact(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an artifact → (jitted callable, meta).

    Needs only jax at the serving site; jax.export checks the platform
    and calling-convention version on call.  If the artifact carries a
    prepare graph (int8-through exports), the returned callable runs it
    as its own dispatch before the main graph — deliberately NOT traced
    into one program (in-graph s2d pins hostile conv layouts on TPU;
    see make_prepare_graph) — so the contract stays uint8-image-in.
    """
    with open(os.path.join(path, GRAPH_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta: Dict[str, Any] = {}
    meta_path = os.path.join(path, META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    main = jax.jit(exported.call)
    prep_path = os.path.join(path, PREPARE_FILE)
    if os.path.exists(prep_path):
        with open(prep_path, "rb") as f:
            prep = jax.jit(jax_export.deserialize(f.read()).call)

        def infer(img_u8):
            return main(prep(img_u8))

        return infer, meta
    return main, meta


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Export an AOT serving artifact (StableHLO, weights "
                    "embedded; uint8 image in, labels out)."
    )
    p.add_argument("-e", "--experiment", required=True)
    p.add_argument("-o", "--out", required=True, help="artifact directory")
    p.add_argument("--checkpoint", default=None,
                   help="msgpack checkpoint to embed (default: random init "
                        "— smoke/testing only)")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference .pth to graft and embed")
    p.add_argument("--input-size", default=None,
                   help="NxHxWxC; default is the experiment's deploy "
                        "resolution (eval_resize_to for .speed variants, "
                        "else the train crop) — pass your real serving "
                        "size, the artifact's input shape is fixed")
    p.add_argument("--scores", action="store_true",
                   help="emit log-softmax scores instead of argmax labels")
    p.add_argument("--int8-through", action="store_true",
                   help="export the int8-through serving graph "
                        "(deploy/int8_serve.py) plus its uint8 prepare "
                        "graph — the artifact contract stays uint8 in, "
                        "labels out")
    p.add_argument("--int8-decoder", dest="int8_decoder",
                   action="store_true", default=None,
                   help="with --int8-through: force the int8 decoder "
                        "(classic-stem BiSeNet only). Default: auto per "
                        "the round-4 chip A/B — int8 on classic-stem, "
                        "bf16 elsewhere (docs/DESIGN.md)")
    p.add_argument("--bf16-decoder", dest="int8_decoder",
                   action="store_false",
                   help="with --int8-through: force the bf16 decoder")
    p.add_argument("--calib-size", default="1x256x512x3",
                   help="--int8-through random-calibration image size "
                        "(production: calibrate on val crops)")
    p.add_argument("--f32", action="store_true",
                   help="serve in float32 (default bfloat16)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--check", action="store_true",
                   help="after export: reload and compare against the live "
                        "forward on the current backend")
    args = p.parse_args(argv)

    from ..experiments.registry import build_model, get_experiment

    cfg = get_experiment(args.experiment)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = build_model(cfg, axis_name=None, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)

    if args.torch_checkpoint:
        from ..utils.torch_convert import graft_full_checkpoint, model_family

        variables = graft_full_checkpoint(
            args.torch_checkpoint, variables, model_family(cfg.model)
        )
        source = args.torch_checkpoint
    elif args.checkpoint:
        from ..engine.checkpoint import restore_checkpoint
        from ..engine.trainer import TrainState

        state, _, _ = restore_checkpoint(
            args.checkpoint, TrainState.create(variables)
        )
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        source = args.checkpoint
    else:
        source = "random-init"
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            variables,
        )

    if args.input_size:
        shape = tuple(int(s) for s in args.input_size.split("x"))
    elif cfg.eval_resize_to is not None:
        shape = (1, *cfg.eval_resize_to, 3)
    else:
        shape = (1, cfg.image_height, cfg.image_width, 3)
    output = "scores" if args.scores else "labels"
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    prep_exported = None
    mode = "bf16" if dtype == jnp.bfloat16 else "f32"

    if args.int8_through:
        if args.scores:
            raise SystemExit("--int8-through emits argmax labels only")
        from .int8_serve import build_int8_serving_for_experiment

        calib_shape = tuple(int(s) for s in args.calib_size.split("x"))
        try:
            infer, run_pkg, prepare, prep = (
                build_int8_serving_for_experiment(
                    cfg, model, variables,
                    decoder=(None if args.int8_decoder is None else
                             "int8" if args.int8_decoder else "bf16"),
                    calib_shape=calib_shape,
                    # multi-platform artifacts keep the plain-XLA stem:
                    # the Pallas kernels (round-5 TPU default) have no
                    # CPU/GPU lowering, so a portable export would fail
                    # at lowering time
                    stem_mode=("pallas" if platforms == ["tpu"]
                               else "bf16"),
                )
            )
        except ValueError as e:
            raise SystemExit(f"--int8-through: {e}")
        xs = prepare(np.zeros(shape, np.uint8))
        exported = export_serving(
            lambda x: infer(run_pkg, x),
            (jax.ShapeDtypeStruct(xs.shape, xs.dtype),),
            platforms=platforms,
        )
        prep_exported = export_serving(
            make_prepare_graph(prep),
            (jax.ShapeDtypeStruct(shape, jnp.uint8),),
            platforms=platforms,
        )
        # auto decoder (None) resolves to int8 exactly on classic-stem
        # packages, which are the s2d-input ones
        dec_int8 = (args.int8_decoder if args.int8_decoder is not None
                    else prep.get("format") == "s2d")
        mode = "int8-through+dec" if dec_int8 else "int8-through"
    else:
        fn = build_serving_fn(
            model, variables, image_mean=cfg.image_mean,
            image_std=cfg.image_std, output=output, dtype=dtype,
        )
        example = jax.ShapeDtypeStruct(shape, jnp.uint8)
        exported = export_serving(fn, (example,), platforms=platforms)
    n_params = sum(
        int(np.prod(a.shape)) for a in jax.tree.leaves(variables["params"])
    )
    save_artifact(
        args.out,
        exported,
        {
            "experiment": cfg.name,
            "model": cfg.model,
            "num_classes": cfg.num_classes,
            "input_shape": list(shape),
            "input_dtype": "uint8",
            "output": output,
            "serve_mode": mode,
            "serve_dtype": str(jnp.dtype(dtype)),
            "weights_source": source,
            "n_params": n_params,
        },
        prepare=prep_exported,
    )
    print(
        f"exported {cfg.name} -> {args.out} "
        f"({os.path.getsize(os.path.join(args.out, GRAPH_FILE)) / 1e6:.1f} "
        f"MB, platforms={platforms}, {output} @ {shape})"
    )

    if args.check:
        # label agreement, not bit-equality: embedding weights as
        # constants lets XLA constant-fold with different bf16 rounding
        # than the runtime-argument graph, flipping near-tied argmaxes
        # (≈0.9% with RANDOM weights; trained weights have real margins)
        loaded, _ = load_artifact(args.out)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, shape).astype(np.uint8)
        got = np.asarray(loaded(jnp.asarray(img)))
        if args.int8_through:
            want = np.asarray(infer(run_pkg, prepare(img)))
        else:
            want = np.asarray(jax.jit(fn)(jnp.asarray(img)))
        if output == "scores":
            ok = np.allclose(got.astype(np.float32),
                             want.astype(np.float32), rtol=2e-2, atol=2e-2)
            msg = "allclose" if ok else "scores diverge"
        else:
            agree = float((got == want).mean())
            ok = agree >= 0.99
            msg = ("exact" if agree == 1.0
                   else f"{agree * 100:.2f}% label agreement")
        if not ok:
            raise SystemExit(f"artifact vs live forward: {msg}")
        print(f"check: artifact vs live forward on "
              f"{jax.devices()[0].platform}: {msg} ✓")
    return args.out


if __name__ == "__main__":
    main()
