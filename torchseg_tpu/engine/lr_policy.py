"""Learning-rate schedules (reference furnace/engine/lr_policy.py:18-49).

``__call__(step)`` accepts a python int or a traced jnp scalar, so schedules
can live inside the jitted train step.
"""

import jax.numpy as jnp


class PolyLR:
    """lr = start * (1 - iter/total)^power (reference lr_policy.py:18-26)."""

    def __init__(self, start_lr: float, lr_power: float, total_iters: int):
        self.start_lr = float(start_lr)
        self.lr_power = float(lr_power)
        self.total_iters = float(total_iters)

    def __call__(self, cur_iter):
        frac = 1.0 - jnp.asarray(cur_iter, jnp.float32) / self.total_iters
        return self.start_lr * frac**self.lr_power

    get_lr = __call__


class MultiStageLR:
    """Step schedule [[until_iter, lr], ...] (reference lr_policy.py:29-38)."""

    def __init__(self, lr_stages):
        assert len(lr_stages[0]) == 2
        self.stages = [(float(it), float(lr)) for it, lr in lr_stages]

    def __call__(self, cur_iter):
        step = jnp.asarray(cur_iter, jnp.float32)
        lr = jnp.asarray(self.stages[-1][1], jnp.float32)
        # evaluate right-to-left so the earliest matching stage wins
        for boundary, stage_lr in reversed(self.stages):
            lr = jnp.where(step < boundary, stage_lr, lr)
        return lr

    get_lr = __call__


class LinearIncreaseLR:
    """Linear warmup (reference lr_policy.py:41-49)."""

    def __init__(self, start_lr: float, end_lr: float, warm_iters: int):
        self.start_lr = float(start_lr)
        self.delta = (float(end_lr) - float(start_lr)) / float(warm_iters)

    def __call__(self, cur_iter):
        return self.start_lr + jnp.asarray(cur_iter, jnp.float32) * self.delta

    get_lr = __call__
