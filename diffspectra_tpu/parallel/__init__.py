from .mesh import create_mesh, shard_batch, replicate  # noqa: F401
from .train_parallel import make_parallel_train_step  # noqa: F401
