"""Weight initializers matching the reference's init conventions.

The reference initializes "business layers" with ``nn.init.kaiming_normal_``
(reference furnace/utils/init_func.py:11-31; FCN passes mode='fan_out',
model/fcn/voc.fcn32s.R101_v1c/train.py:57) and leaves everything else at
torch defaults (kaiming_uniform with a=sqrt(5)).  BN is gamma=1 / beta=0,
which is already our BatchNorm default.

Flax conv kernels are HWIO, so flax's fan_in == torch's fan_in
(= in_channels * kh * kw) and likewise for fan_out.
"""

import numpy as np
import jax.numpy as jnp
from jax import random
from flax import linen as nn


def kaiming_normal_init(mode: str = "fan_in"):
    """torch.nn.init.kaiming_normal_(nonlinearity='relu')."""
    return nn.initializers.variance_scaling(2.0, mode, "normal")


# torch Conv2d default: kaiming_uniform_(a=sqrt(5)) == U(-b, b) with
# b = sqrt(1 / fan_in)  -> variance 1/(3 fan_in).
torch_default_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_default_bias_init(fan_in: int):
    """torch Conv2d/Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
