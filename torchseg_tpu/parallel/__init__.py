from .mesh import (
    make_data_mesh,
    initialize_multihost,
    all_reduce_tensor,
    reduce_mean,
    gather_metrics,
    shard_batch,
)
