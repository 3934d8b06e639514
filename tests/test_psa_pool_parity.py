"""Orientation-sensitive math parity: the PSA attention einsum (NHWC) vs the
reference's torch bmm formulation, and adaptive_avg_pool vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from torchseg_tpu.ops.pool import adaptive_avg_pool


def test_psa_einsum_matches_torch_bmm():
    """reference model/psanet/*/network.py:121-137:
      collect_fm[b,c,i] = bmm(x_flat (b,c,hw), softmax(att (b,hw_j,hw_i), dim=1))
    NHWC equivalent: einsum('bij,bjc->bic', softmax(att_n, -1), x_n)."""
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 5, 4, 7
    hw = h * w
    x_n = rng.normal(size=(b, h, w, c)).astype(np.float32)
    att_n = rng.normal(size=(b, h, w, hw)).astype(np.float32)

    # our formulation (psanet.py PSABranch)
    att_sm = jax.nn.softmax(
        jnp.asarray(att_n).reshape(b, hw, hw), axis=-1
    )
    ours = jnp.einsum(
        "bij,bjc->bic", att_sm, jnp.asarray(x_n).reshape(b, hw, c),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, h, w, c)

    # torch formulation: channels-first layout
    x_t = torch.from_numpy(x_n).permute(0, 3, 1, 2).reshape(b, c, hw)
    att_t = torch.from_numpy(att_n).permute(0, 3, 1, 2).reshape(b, hw, hw)
    fm = torch.bmm(x_t, torch.softmax(att_t, dim=1))  # (b, c, hw)
    want = fm.reshape(b, c, h, w).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-4, atol=1e-5)


def test_adaptive_pool_matches_torch():
    rng = np.random.default_rng(1)
    for (h, w), s in [((60, 60), 6), ((33, 45), 3), ((7, 5), 2), ((8, 8), 1)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), s))
        want = (
            F.adaptive_avg_pool2d(
                torch.from_numpy(x).permute(0, 3, 1, 2), s
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
