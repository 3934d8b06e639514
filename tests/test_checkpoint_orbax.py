"""Orbax checkpoint manager roundtrip."""

import numpy as np
import jax.numpy as jnp

from torchseg_tpu.engine.checkpoint_orbax import OrbaxCheckpointer


def test_orbax_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    ck = OrbaxCheckpointer(str(tmp_path), keep=2)
    ck.save(1, state)
    ck.save(2, state)
    ck.wait()
    assert ck.latest_step() == 2
    template = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.int32(0)}
    restored = ck.restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["step"]) == 7
    ck.close()
