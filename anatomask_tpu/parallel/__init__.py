from anatomask_tpu.parallel.mesh import (
    maybe_initialize_distributed,
    make_data_mesh,
    compute_shard_batch_and_oversample,
)
