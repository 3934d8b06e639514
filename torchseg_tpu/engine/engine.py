"""Engine — a context-manager facade bundling run setup, state registry and
checkpoint save/restore, mirroring the reference's ``Engine`` API surface
(furnace/engine/engine.py:23-163) on top of the functional pieces.

The reference Engine parses -d/-c/--local_rank, binds the process to one GPU
and does the NCCL rendezvous; on TPU a single process drives the whole mesh,
so Engine mainly carries run state:

    with Engine(snapshot_dir="log/exp/snapshot") as engine:
        engine.register_state(state=train_state, loader=loader)
        if engine.continue_state_object:
            engine.restore_checkpoint(engine.continue_state_object)
        ...
        engine.update_iteration(epoch, it)
        engine.save_and_link_checkpoint(epoch)
"""

import argparse
import os
from typing import Optional

import jax

from .checkpoint import restore_checkpoint, save_checkpoint
from .logger import get_logger


class State:
    """epoch / iteration / registered objects (reference engine.py:23-35)."""

    def __init__(self):
        self.epoch = 0
        self.iteration = 0
        self.state = None  # TrainState
        self.loader = None

    def register(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)


class Engine:
    def __init__(
        self,
        custom_parser: Optional[argparse.ArgumentParser] = None,
        snapshot_dir: str = "snapshot",
        argv=None,
    ):
        self.logger = get_logger()
        parser = custom_parser or argparse.ArgumentParser()
        parser.add_argument("-d", "--devices", default="*",
                            help="device selection (reference -d)")
        parser.add_argument("-c", "--continue", dest="continue_fpath",
                            default=None, help="checkpoint to resume from")
        self.args, _ = parser.parse_known_args(argv)
        self.snapshot_dir = snapshot_dir
        self.state = State()
        self.continue_state_object = self.args.continue_fpath
        self.devices = self._parse_devices(self.args.devices)
        self.world_size = jax.process_count()
        self.local_rank = jax.process_index()
        self.distributed = self.world_size > 1

    @staticmethod
    def _parse_devices(spec: str):
        from ..utils.misc import parse_devices

        all_devices = jax.devices()
        idx = parse_devices(spec)
        return [all_devices[i] for i in idx if i < len(all_devices)]

    # ------------------------------------------------------------------
    def register_state(self, **kwargs):
        self.state.register(**kwargs)

    def update_iteration(self, epoch: int, iteration: int):
        self.state.epoch = epoch
        self.state.iteration = iteration

    def save_and_link_checkpoint(self, epoch: Optional[int] = None) -> str:
        epoch = self.state.epoch if epoch is None else epoch
        assert self.state.state is not None, "register_state(state=...) first"
        path = save_checkpoint(
            self.snapshot_dir,
            self.state.state,
            epoch,
            extra={"iteration": self.state.iteration},
        )
        self.logger.info("saved checkpoint %s", path)
        return path

    def restore_checkpoint(self, path: Optional[str] = None):
        path = path or self.continue_state_object
        assert self.state.state is not None, "register_state(state=...) first"
        restored, epoch, extra = restore_checkpoint(path, self.state.state)
        self.state.state = restored
        self.state.epoch = epoch + 1  # resume after the saved epoch (:145)
        self.state.iteration = int(extra.get("iteration", 0))
        self.logger.info("restored %s (epoch %d)", path, epoch)
        return restored

    # ------------------------------------------------------------------
    def __enter__(self):
        os.makedirs(self.snapshot_dir, exist_ok=True)
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            self.logger.error("run failed: %s", exc)
        return False
