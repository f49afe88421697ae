from .mesh import create_mesh, shard_batch, replicate  # noqa: F401
from .train_parallel import (  # noqa: F401
    make_parallel_store_step,
    make_parallel_train_step,
)
