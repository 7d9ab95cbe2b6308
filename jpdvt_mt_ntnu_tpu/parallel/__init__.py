from .mesh import (  # noqa: F401
    MeshSpec,
    batch_axes,
    initialize_distributed,
    local_batch_size,
    make_mesh,
    maybe_initialize_distributed,
    process_shard,
)
from .sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicate,
    shard_batch,
    state_shardings,
)
