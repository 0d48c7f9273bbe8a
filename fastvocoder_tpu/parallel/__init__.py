from fastvocoder_tpu.parallel.distributed import (
    is_main_process,
    maybe_initialize_distributed,
    multihost_env_requested,
)
from fastvocoder_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    compile_train_step,
    compile_train_step_no_weight,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "compile_train_step",
    "compile_train_step_no_weight",
    "is_main_process",
    "make_mesh",
    "maybe_initialize_distributed",
    "multihost_env_requested",
    "replicate_state",
    "replicated",
    "shard_batch",
]
