"""Device mesh + sharding helpers.

TPU-native replacement for the reference's ``torch.nn.DataParallel``
(ref models/utils.py:27): a 1-D ``data`` mesh with batch-sharded inputs,
replicated parameters, and ``psum`` gradient reduction over ICI. Multi-host
DP extends the same program over DCN via ``jax.distributed.initialize``.

TP/PP/SP are intentionally out of scope at this model scale (~10M params,
sequences <= 29 atoms / <= 347 spectra patches): parameter or sequence
sharding would put collectives on the critical path of sub-millisecond
matmuls. Scaling axis is the batch (SURVEY §2.12).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is None or n_devices == 0:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh.

    Multi-host: states are replicated-consistent by construction (same init
    seed / restored checkpoint on every process), so build the global arrays
    from process-local data directly — jax.device_put's cross-process
    equality assert mishandles python-scalar leaves (EMA decay et al.)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
