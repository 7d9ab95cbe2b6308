from .mesh import (  # noqa: F401
    MeshSpec,
    batch_axes,
    initialize_distributed,
    local_batch_size,
    make_mesh,
    maybe_initialize_distributed,
    process_shard,
)
from .pipeline import (  # noqa: F401
    convert_state,
    make_pipeline_apply,
    pipeline_param_shardings,
    pipeline_state_shardings,
    stack_block_params,
    unstack_block_params,
)
from .sequence import (  # noqa: F401
    ring_attention,
    sequence_sharding,
)
from .sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    replicate,
    shard_batch,
    state_shardings,
)
