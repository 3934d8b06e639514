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
) -> str:
    """Write the artifact directory (graph.bin + meta.json)."""
    os.makedirs(path, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(path, GRAPH_FILE), "wb") as f:
        f.write(blob)
    full_meta = {
        "format": "torchseg-tpu-serving/1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "graph_bytes": len(blob),
        **(meta or {}),
    }
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(full_meta, f, indent=2, sort_keys=True)
    return path


def load_artifact(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an artifact → (jitted callable, meta).

    Needs only jax at the serving site; jax.export checks the platform
    and calling-convention version on call.
    """
    with open(os.path.join(path, GRAPH_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta: Dict[str, Any] = {}
    meta_path = os.path.join(path, META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return jax.jit(exported.call), meta


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
                   help="NxHxWxC, default 1x<eval_h>x<eval_w>x3")
    p.add_argument("--scores", action="store_true",
                   help="emit log-softmax scores instead of argmax labels")
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
    else:
        shape = (1, cfg.image_height, cfg.image_width, 3)
    output = "scores" if args.scores else "labels"
    fn = build_serving_fn(
        model, variables, image_mean=cfg.image_mean,
        image_std=cfg.image_std, output=output, dtype=dtype,
    )
    example = jax.ShapeDtypeStruct(shape, jnp.uint8)
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
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
            "serve_dtype": str(jnp.dtype(dtype)),
            "weights_source": source,
            "n_params": n_params,
        },
    )
    print(
        f"exported {cfg.name} -> {args.out} "
        f"({os.path.getsize(os.path.join(args.out, GRAPH_FILE)) / 1e6:.1f} "
        f"MB, platforms={platforms}, {output} @ {shape})"
    )

    if args.check:
        infer, _ = load_artifact(args.out)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, shape).astype(np.uint8)
        got = np.asarray(infer(jnp.asarray(img)))
        want = np.asarray(jax.jit(fn)(jnp.asarray(img)))
        if not np.array_equal(got, want):
            raise SystemExit("artifact output != live forward")
        print(f"check: artifact == live forward on "
              f"{jax.devices()[0].platform} ✓")
    return args.out


if __name__ == "__main__":
    main()
