from .mesh import (  # noqa: F401
    batch_ipm_solve,
    make_mesh,
    model_sharded_step,
    shard_batch,
)
