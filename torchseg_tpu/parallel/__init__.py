from .mesh import (
    make_data_mesh,
    initialize_multihost,
    all_reduce_tensor,
    reduce_mean,
    gather_metrics,
    shard_batch,
)
from .spatial import (
    SpatialTrainer,
    batch_shardings,
    make_dp_sp_mesh,
    place_batch,
    space_unshard_interceptor,
)
