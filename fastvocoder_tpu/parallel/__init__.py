from fastvocoder_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    compile_train_step,
    compile_train_step_no_weight,
    make_mesh,
    pad_batch_to_devices,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "compile_train_step",
    "compile_train_step_no_weight",
    "make_mesh",
    "pad_batch_to_devices",
    "replicate_state",
    "replicated",
    "shard_batch",
]
