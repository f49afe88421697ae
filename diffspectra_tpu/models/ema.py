"""Exponential moving average of parameters as a pure pytree transform.

JAX rewrite of ref models/ema.py:4-85 (which mutates shadow tensors in
place). Here EMA state is an immutable pytree living inside the jitted train
state; decay warms up as ``min(decay, (1+n)/(10+n))`` (ref :37).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    decay: float
    num_updates: jnp.ndarray  # int32 scalar
    shadow_params: Any


def init(params, decay: float, use_num_updates: bool = True) -> EMAState:
    if decay < 0.0 or decay > 1.0:
        raise ValueError("Decay must be between 0 and 1")
    return EMAState(
        decay=decay,
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
        # materialize a DISTINCT buffer per leaf (jnp.asarray would alias
        # params, and the train step donates the whole state — donating the
        # same buffer via both params and shadow_params is an XLA error)
        shadow_params=jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).copy(), params
        ),
    )


def update(state: EMAState, params) -> EMAState:
    """shadow <- shadow - (1 - decay_t) (shadow - param) (ref :34-42)."""
    num_updates = jnp.where(state.num_updates >= 0, state.num_updates + 1, -1)
    decay = jnp.where(
        num_updates >= 0,
        jnp.minimum(state.decay, (1.0 + num_updates) / (10.0 + num_updates)),
        state.decay,
    )
    one_minus = 1.0 - decay
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), state.shadow_params, params
    )
    return EMAState(state.decay, num_updates, shadow)


def params(state: EMAState):
    """The averaged parameters (ref copy_to, :44-55)."""
    return state.shadow_params
