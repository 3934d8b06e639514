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


def test_preemption_drill_step_exact_resume(tmp_path):
    """Simulated preemption: train 3 steps, orbax-save, drop ALL state,
    rebuild from scratch, restore, continue 2 steps — must be bit-identical
    to an uninterrupted 5-step run with the same rng stream."""
    import functools

    import jax
    from flax import linen as nn

    from torchseg_tpu.engine.lr_policy import PolyLR
    from torchseg_tpu.engine.trainer import Trainer, make_data_mesh
    from torchseg_tpu.ops.blocks import ConvBnRelu
    from torchseg_tpu.ops.losses import cross_entropy_with_ignore
    from torchseg_tpu.ops.norm import BatchNorm

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            norm = functools.partial(BatchNorm, axis_name="data")
            x = ConvBnRelu(8, 3, 1, 1, norm=norm, name="c1")(x, train)
            return {"main": nn.Conv(3, (1, 1), name="out")(x)}

    def loss_fn(outs, batch):
        return cross_entropy_with_ignore(outs["main"], batch["label"], 255)

    mesh = make_data_mesh(jax.devices()[:4])
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.array(rng.normal(size=(8, 8, 8, 3)).astype(np.float32)),
        "label": jnp.array(rng.integers(0, 3, size=(8, 8, 8)).astype(np.int32)),
    }

    def make():
        t = Trainer(Tiny(), loss_fn, PolyLR(0.1, 0.9, 100), mesh=mesh,
                    donate=False)
        return t, t.init_state(jax.random.PRNGKey(0), batch)

    keys = [jax.random.PRNGKey(100 + i) for i in range(5)]

    # uninterrupted run
    t, s = make()
    for k in keys:
        s, _, _ = t.train_step(s, batch, k)
    want = np.asarray(s.params["c1"]["conv"]["kernel"])

    # interrupted run: 3 steps, async save, simulate kill
    t, s = make()
    for k in keys[:3]:
        s, _, _ = t.train_step(s, batch, k)
    ck = OrbaxCheckpointer(str(tmp_path / "snap"), keep=2)
    ck.save(3, s)
    ck.wait()
    ck.close()
    del t, s

    # fresh process: rebuild everything, restore, continue
    t2, template = make()
    ck2 = OrbaxCheckpointer(str(tmp_path / "snap"), keep=2)
    assert ck2.latest_step() == 3
    s2 = ck2.restore(template, 3)
    ck2.close()
    assert int(s2.step) == 3
    for k in keys[3:]:
        s2, _, _ = t2.train_step(s2, batch, k)
    got = np.asarray(s2.params["c1"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, want)
