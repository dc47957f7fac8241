from .mesh import make_mesh, make_param_specs, shard_pytree, batch_spec
from .multihost import (
    global_batch,
    host_batch_slice,
    initialize as initialize_multihost,
    is_coordinator,
)
from .pipeline import (
    make_pipeline_train_step,
    pipeline_blocks,
    pipeline_vit_forward,
    stack_block_variables,
)
from .seq_parallel import (
    seq_parallel_linear_attention,
    ring_kerple_attention,
    ring_softmax_attention,
)
from .train_parallel import (
    make_parallel_train_step,
    make_parallel_multi_step,
    create_sharded_train_state,
    parallel_train_epoch,
)

__all__ = [
    "global_batch",
    "host_batch_slice",
    "initialize_multihost",
    "is_coordinator",
    "make_mesh",
    "make_param_specs",
    "shard_pytree",
    "batch_spec",
    "make_parallel_train_step",
    "make_parallel_multi_step",
    "create_sharded_train_state",
    "parallel_train_epoch",
    "make_pipeline_train_step",
    "pipeline_blocks",
    "pipeline_vit_forward",
    "stack_block_variables",
    "seq_parallel_linear_attention",
    "ring_kerple_attention",
    "ring_softmax_attention",
]
