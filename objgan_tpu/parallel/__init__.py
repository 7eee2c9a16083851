from objgan_tpu.parallel.sharding import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    maybe_initialize_distributed,
    process_local_batch_slice,
    replicate,
    replicated,
    shard_batch,
)
