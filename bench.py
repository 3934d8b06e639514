"""Headline benchmark: BiSeNet-R18 real-time single-scale inference FPS at
1024x2048 on one TPU chip (BASELINE.md north star: >= 200 FPS/chip on v5e).

Methodology (mirrors reference tools/benchmark/compute_speed.py:17-48, adapted
for a remote-tunnel device): N forwards are chained inside ONE compiled
fori_loop with a data dependency between iterations (the next input is
perturbed by the previous argmax), so neither the compiler nor any
result-caching layer can elide iterations; the fixed dispatch/sync overhead of
the tunnel (~35 ms) amortizes over N.  Reports best-of-R wall time / N.

Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int, default=50, help="forwards per dispatch")
    p.add_argument("--reps", type=int, default=4)
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
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32
            else x,
            variables,
        )

    n = args.chain
    from torchseg_tpu.deploy.fused_stem import _fused_stem_s2d, prepare_s2d_input

    h, w = args.height, args.width

    @jax.jit
    def chained(variables, xs, seed):
        def body(i, carry):
            xs, acc = carry
            # deploy path: both 7x7 stems as ONE 4x4 stride-1 conv over the
            # s2d serving input format (deploy/fused_stem.py)
            stems = _fused_stem_s2d(variables, xs, cfg.bn_eps)
            dummy = jnp.zeros((1, h, w, 3), xs.dtype)  # unused, DCE'd
            scores = model.apply(
                variables, dummy, train=False, stem_outs=stems
            )
            pred = jnp.argmax(scores, axis=-1)
            acc = acc + pred[0, 0, 0]
            # data dependency: next input depends on this prediction
            xs = xs + (acc % 2).astype(xs.dtype) * 1e-8
            return (xs, acc)

        return jax.lax.fori_loop(0, n, body, (xs + seed, jnp.int32(0)))[1]

    img = np.random.default_rng(0).normal(size=(1, h, w, 3)).astype(np.float32)
    x = prepare_s2d_input(img, dtype=jnp.bfloat16 if dtype is not None
                          else jnp.float32)

    int(chained(variables, x, 0.0))  # compile + warm
    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        int(chained(variables, x, 1e-4 * (r + 1)))  # int() forces full sync
        times.append(time.perf_counter() - t0)
    dt = min(times) / n
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
