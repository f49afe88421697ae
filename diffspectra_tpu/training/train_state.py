"""Train state: params + batch stats + optimizer + EMA + step as one pytree.

Replaces the reference's mutable ``{'optimizer','model','ema','step'}`` dict
(ref run_lib.py:191, losses.py:106-125) with an immutable structure that
lives on-device and shards cleanly.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp

from ..models import ema as ema_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: ema_lib.EMAState


def create_train_state(variables, tx, ema_decay: float) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema_lib.init(params, ema_decay),
    )
