"""DeConvBnRelu parity with torch ConvTranspose2d (kernel/stride/padding
conventions)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from torchseg_tpu.ops.blocks import DeConvBnRelu


def test_deconv_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    mod = DeConvBnRelu(6, ksize=4, stride=2, pad=1, has_bn=False,
                       has_relu=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(variables["params"]["conv"]["kernel"])  # HWIO

    out = np.asarray(mod.apply(variables, jnp.asarray(x)))

    tconv = torch.nn.ConvTranspose2d(4, 6, 4, 2, 1, bias=False)
    with torch.no_grad():
        # torch ConvTranspose weight: (in, out, kh, kw); flax ConvTranspose
        # kernel (kh, kw, in, out) applies the kernel unflipped, so flip
        # spatial dims for torch's correlation convention.
        w = torch.from_numpy(
            np.transpose(kernel[::-1, ::-1], (2, 3, 0, 1)).copy()
        )
        tconv.weight.copy_(w)
        want = (
            tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    assert out.shape == want.shape == (1, 16, 16, 6)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
