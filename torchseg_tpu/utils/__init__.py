from .init import (
    kaiming_normal_init,
    torch_default_kernel_init,
    torch_default_bias_init,
)
