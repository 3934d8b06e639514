"""Checkpoint save/restore — replaces reference ``Engine.save_checkpoint`` /
``restore_checkpoint`` (furnace/engine/engine.py:89-152) and the
``epoch-last.pth`` symlink convention (:117-126).

Format: msgpack (flax.serialization) of the numpy-materialized state pytree
plus metadata.  Works for any pytree (TrainState or raw variables).
"""

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

LAST_LINK = "epoch-last.ckpt"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(
    snapshot_dir: str, state: Any, epoch: int, extra: Optional[dict] = None
) -> str:
    os.makedirs(snapshot_dir, exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "epoch": epoch,
        "extra": extra or {},
    }
    path = os.path.join(snapshot_dir, f"epoch-{epoch}.ckpt")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    link_last(snapshot_dir, path)
    return path


def link_last(snapshot_dir: str, path: str):
    link = os.path.join(snapshot_dir, LAST_LINK)
    try:
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(os.path.basename(path), link)
    except OSError:
        pass  # filesystems without symlink support


def restore_checkpoint(path: str, state_template: Any, strict: bool = True):
    """Restore into the template's pytree structure.  Returns
    (state, epoch, extra).  ``epoch`` is the epoch that WAS saved; resume at
    epoch+1 like the reference (engine.py:145-146).

    strict=True raises on array-shape mismatches (msgpack restore would
    otherwise silently swap in wrong-shaped arrays)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    if strict:
        mismatches = []

        def chk(path_, a, b):
            if hasattr(a, "shape") and hasattr(b, "shape"):
                if tuple(a.shape) != tuple(b.shape):
                    mismatches.append(
                        (jax.tree_util.keystr(path_), a.shape, b.shape)
                    )

        jax.tree_util.tree_map_with_path(chk, state_template, state)
        if mismatches:
            raise ValueError(
                f"checkpoint {path} shape mismatches: {mismatches[:5]}"
                f" (+{max(len(mismatches) - 5, 0)} more)"
            )
    return state, int(payload["epoch"]), payload.get("extra", {})
