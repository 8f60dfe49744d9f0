from recondet3d.parallel.distributed import init_distributed, is_distributed, process_info
from recondet3d.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    autoscale_lr,
    data_sharding,
    get_active_mesh,
    local_mesh_context,
    make_mesh,
    replicated,
    shard_batch,
    world_size,
)
