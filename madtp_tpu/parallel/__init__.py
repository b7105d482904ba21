from madtp_tpu.parallel.mesh import (
    make_mesh,
    data_mesh,
    shard_batch,
    shard_batch_padded,
    replicate,
    model_parallel_param_shardings,
)
from madtp_tpu.parallel.dist import (
    init_distributed,
    process_count,
    process_index,
    all_gather_with_grad,
    concat_all_gather,
)
