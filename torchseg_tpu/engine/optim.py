"""Functional SGD with exact ``torch.optim.SGD`` semantics and per-leaf
parameter groups.

The reference builds param groups with ``group_weight`` (furnace/utils/
init_func.py:34-57): conv/linear weights decay, biases and all norm params
don't; non-backbone ("business") modules get a 10x learning rate multiplier
(e.g. model/bisenet/*/train.py:70-84, model/pspnet/*/train.py:63-68).  Here
groups are expressed as two static pytrees — ``lr_mult`` and ``wd`` — with the
same structure as params, applied leaf-wise inside one fused jit update.

torch SGD update (matched exactly, incl. first-step behavior):
    d_p = grad + weight_decay * param
    buf = momentum * buf + d_p          (buf starts at 0 => buf = d_p)
    param -= lr * buf

``StandardSGD`` (reference furnace/seg_opr/sgd.py:29-50) scales d_p by lr
*before* momentum accumulation; available via ``lr_scaled_momentum=True``.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def sgd_init(params):
    """Momentum buffers (zeros, same structure as params)."""
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(
    params,
    grads,
    momentum_buf,
    lr,
    momentum: float = 0.9,
    lr_mult=None,
    wd=None,
    lr_scaled_momentum: bool = False,
):
    """One SGD step.  ``lr`` may be a traced scalar (schedule inside jit).

    lr_mult / wd are pytrees of python floats (or None for all-1 / all-0).
    Returns (new_params, new_momentum_buf).
    """
    if lr_mult is None:
        lr_mult = jax.tree.map(lambda _: 1.0, params)
    if wd is None:
        wd = jax.tree.map(lambda _: 0.0, params)

    def leaf(p, g, buf, lm, w):
        d_p = g + w * p
        if lr_scaled_momentum:
            buf = momentum * buf + (lr * lm) * d_p
            return p - buf, buf
        buf = momentum * buf + d_p
        return p - (lr * lm) * buf, buf

    out = jax.tree.map(leaf, params, grads, momentum_buf, lr_mult, wd)
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_buf


def _is_decay_leaf(path) -> bool:
    """conv/linear kernels decay; biases and norm scale/bias don't
    (reference init_func.py:34-57)."""
    leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf_name == "kernel"


def make_wd_tree(params, weight_decay: float):
    """Weight-decay tree: `weight_decay` on kernels, 0 elsewhere."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: weight_decay if _is_decay_leaf(path) else 0.0, params
    )


def make_lr_mult_tree(
    params,
    business_mult: float = 10.0,
    backbone_key: str = "backbone",
    predicate: Optional[Callable[[Any], bool]] = None,
):
    """LR-multiplier tree: 1.0 under the backbone subtree, ``business_mult``
    everywhere else (the reference's 10x-head rule).  ``predicate(path)``
    overrides the default backbone-prefix test when provided."""

    def is_backbone(path):
        if predicate is not None:
            return predicate(path)
        first = path[0].key if hasattr(path[0], "key") else str(path[0])
        return first == backbone_key

    return jax.tree_util.tree_map_with_path(
        lambda path, _: 1.0 if is_backbone(path) else business_mult, params
    )
