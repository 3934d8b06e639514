"""Model statistics — parameter counts and FLOPs, per module and total
(replaces the reference's monkey-patching ``stat`` tool,
furnace/tools/benchmark/{statistics,model_hook,stat_tree,reporter}.py).

Two sources, no hooks needed in a functional framework:
  * per-module table from ``flax.linen.tabulate`` (params + per-call FLOPs);
  * exact whole-program FLOPs/bytes from XLA's HLO cost analysis of the
    jitted forward — this is what actually runs after fusion.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


def model_stats(model, input_shape, train: bool = False, depth: int = 2):
    """Returns (table_str, totals dict)."""
    x = jnp.zeros(input_shape, jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    table = nn.tabulate(
        model,
        rngs,
        depth=depth,
        compute_flops=True,
    )(x, train=train)

    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    variables = model.init(rngs, x, train=True)
    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    totals = {
        "flops": float(cost.get("flops", -1.0)) if cost else -1.0,
        "bytes_accessed": float(cost.get("bytes accessed", -1.0))
        if cost
        else -1.0,
        "params": sum(
            int(p.size) for p in jax.tree.leaves(variables["params"])
        ),
    }
    return table, totals


def print_stats(model, input_shape, train: bool = False, depth: int = 2):
    table, totals = model_stats(model, input_shape, train, depth)
    print(table)
    print(
        f"total params: {totals['params']:,} | "
        f"XLA forward FLOPs: {totals['flops']:.3e} | "
        f"bytes accessed: {totals['bytes_accessed']:.3e}"
    )
    return totals
