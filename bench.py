"""Headline benchmark: BiSeNet-R18 real-time single-scale inference FPS at
1024x2048 on one TPU chip (BASELINE.md north star: >= 200 FPS/chip on v5e).

Mirrors the reference speed protocol (tools/benchmark/compute_speed.py:17-48):
warmup iterations, then a timed loop with device synchronization
(block_until_ready).  Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from torchseg_tpu.experiments.registry import build_model, get_experiment

    cfg = get_experiment("cityscapes.bisenet.R18.speed")
    dtype = None if args.f32 else jnp.bfloat16
    model = build_model(cfg, axis_name=None, dtype=dtype)

    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 64, 128, 3)), train=True)
    if dtype is not None:
        # cast params to bf16 for pure-bf16 inference (weights+activations)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32
            else x,
            variables,
        )

    @jax.jit
    def forward(variables, x):
        scores = model.apply(variables, x, train=False)
        # real-time path: argmax epilogue on device, tiny D2H
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    x = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(1, args.height, args.width, 3))
        .astype(np.float32)
    )
    if dtype is not None:
        x = x.astype(jnp.bfloat16)

    # compile + warmup
    forward(variables, x).block_until_ready()
    for _ in range(args.warmup):
        forward(variables, x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = forward(variables, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "bisenet_r18_1024x2048_fps_per_chip",
                "value": round(fps, 2),
                "unit": "FPS",
                "vs_baseline": round(fps / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
