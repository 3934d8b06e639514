"""Device-mesh and collective helpers — the TPU-native replacement for the
reference's distributed layer (SURVEY.md §2.1/§5):

  * NCCL process-group init (furnace/engine/engine.py:59-69)  ->
    ``initialize_multihost`` (jax.distributed over DCN) + a 1-D ``Mesh``;
  * ``all_reduce_tensor``/``reduce_tensor`` (furnace/utils/pyt_utils.py:25-39)
    -> psum/pmean over the mesh axis (must be called inside shard_map);
  * per-GPU mp.Queue metric gathering (furnace/engine/evaluator.py:96-146)
    -> ``gather_metrics`` over hosts;
  * DistributedSampler batch split -> ``shard_batch`` NamedSharding.

All single-node multi-chip communication rides ICI; multi-host crossings ride
DCN — XLA picks the transport from the mesh layout, no NCCL/MPI analog needed.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host rendezvous (replaces dist.init_process_group('nccl'),
    engine/engine.py:66).  No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def all_reduce_tensor(x, axis: str = "data", op: str = "mean"):
    """psum/pmean over the mesh axis — inside shard_map/pmap only
    (pyt_utils.py:34-39 semantics: mean over world)."""
    if op == "mean":
        return jax.lax.pmean(x, axis)
    if op == "sum":
        return jax.lax.psum(x, axis)
    raise ValueError(op)


reduce_mean = all_reduce_tensor


def gather_metrics(local_hist: np.ndarray):
    """Sum confusion-matrix style metrics across hosts (replaces the
    evaluator's results_queue).  Works on host numpy values."""
    if jax.process_count() == 1:
        return local_hist
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(jnp.asarray(local_hist))
    return np.asarray(stacked).sum(axis=0)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host-global batch dict with the leading dim sharded over the
    mesh (the DistributedSampler equivalent)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
