"""3x3/2 pad-1 max pooling with a scatter-free backward.

The stock vjp of ``reduce_window(max)`` lowers to ``select_and_scatter``,
which costs 2.5 ms of the 50.7 ms BiSeNet train step on v5e (round-2
profile, docs/DESIGN.md) — the same class of data-dependent scatter that
made the loss gathers 30-250x slow on this toolchain.  This formulation
routes gradients with 9 tap-equality masks combined with a running
"already taken" or (reproducing select_and_scatter's first-in-scan-order
tie routing exactly) and places them with interior-dilated ``lax.pad`` —
everything is elementwise/pad, which XLA fuses into a handful of kLoop
passes.

Forward is the identical ``reduce_window`` max the models used before
(reference nn.MaxPool2d(3, 2, 1), base_model/resnet.py:134 /
xception.py:108).
"""

import jax
import jax.numpy as jnp


def _fwd_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@jax.custom_vjp
def max_pool_3x3_s2(x):
    """NHWC 3x3 stride-2 pad-1 max pool (the torch MaxPool2d(3, 2, 1))."""
    return _fwd_pool(x)


def _mp_fwd(x):
    y = _fwd_pool(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=neg)
    hp, wp = h + 2, w + 2
    g = g.astype(jnp.float32)
    taken = jnp.zeros(y.shape, bool)
    acc = jnp.zeros((b, hp, wp, c), jnp.float32)
    # row-major tap order matches XLA select_and_scatter's first-match
    # tie routing (select = ge keeps the earlier element in scan order)
    for dy in range(3):
        for dx in range(3):
            xv = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + 2 * (oh - 1) + 1, dx + 2 * (ow - 1) + 1, c),
                (1, 2, 2, 1),
            )
            eq = (xv == y) & ~taken
            taken = taken | eq
            gm = jnp.where(eq, g, 0.0)
            # place gm at padded positions (2i+dy, 2j+dx): interior-dilated
            # pad — pure data movement, no scatter
            acc = acc + jax.lax.pad(
                gm, jnp.float32(0),
                ((0, 0, 0),
                 (dy, hp - dy - 2 * oh + 1, 1),
                 (dx, wp - dx - 2 * ow + 1, 1),
                 (0, 0, 0)),
            )
    return (acc[:, 1:hp - 1, 1:wp - 1, :].astype(x.dtype),)


max_pool_3x3_s2.defvjp(_mp_fwd, _mp_bwd)

# Chip-measurement gate: forward is identical either way; the custom vjp
# only changes the BACKWARD lowering.  Flipped to True once the v5e
# measurement confirms the scatter-free backward beats select_and_scatter
# (queued chip probe; see docs/ROADMAP.md).
SCATTER_FREE_BWD = False


def stem_pool(x):
    """The backbones' stem 3x3/2 pad-1 maxpool (resnet.py / xception.py).
    Dispatches between the stock reduce_window (select_and_scatter
    backward) and the scatter-free custom vjp."""
    if SCATTER_FREE_BWD:
        return max_pool_3x3_s2(x)
    return _fwd_pool(x)
