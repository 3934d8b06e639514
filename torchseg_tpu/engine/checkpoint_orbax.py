"""Orbax-backed checkpointing — the preemption-safe, async, multi-host option
(SURVEY.md §7.7 "resilience extras", beyond reference parity).

The msgpack path in engine/checkpoint.py mirrors the reference's torch.save
semantics; this module adds what TPU pods actually need: atomic directory
commits, async saves overlapping training, and keep-N garbage collection.
"""

import os
from typing import Any, Optional


def _manager(directory: str, keep: int = 20):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=True
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


class OrbaxCheckpointer:
    """save(step, state) / restore(state_template, step=None) / close()."""

    def __init__(self, directory: str, keep: int = 20):
        self._mgr = _manager(directory, keep)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        import orbax.checkpoint as ocp

        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )

    def restore(self, state_template: Any, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
