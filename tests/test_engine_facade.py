"""Engine facade: state registry, checkpoint save/restore with epoch bump."""

import jax.numpy as jnp

from torchseg_tpu.engine.engine import Engine
from torchseg_tpu.engine.trainer import TrainState


def test_engine_roundtrip(tmp_path):
    state = TrainState(
        params={"w": jnp.ones((2,))},
        batch_stats={},
        momentum={"w": jnp.zeros((2,))},
        step=jnp.int32(5),
    )
    with Engine(snapshot_dir=str(tmp_path), argv=[]) as eng:
        eng.register_state(state=state)
        eng.update_iteration(epoch=3, iteration=42)
        path = eng.save_and_link_checkpoint()

    with Engine(snapshot_dir=str(tmp_path), argv=["-c", path]) as eng2:
        eng2.register_state(
            state=TrainState(
                params={"w": jnp.zeros((2,))},
                batch_stats={},
                momentum={"w": jnp.zeros((2,))},
                step=jnp.int32(0),
            )
        )
        eng2.restore_checkpoint()
        assert eng2.state.epoch == 4  # resume AFTER saved epoch
        assert eng2.state.iteration == 42
        assert float(eng2.state.state.params["w"][0]) == 1.0
