from msa_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    initialize_multihost,
)
from msa_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
