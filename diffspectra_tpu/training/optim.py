"""Optimizer: Adam/AdamW(amsgrad) with LR warmup and EDM-style adaptive
gradient clipping, all inside the jitted train step.

JAX rewrite of ref losses.py:14-94. The reference keeps a host-side Python
``Queue`` of the last 50 gradient norms and clips to
``min(1.5 mean + 2 std, max_grad)``; here the queue is a fixed ``[50]``
buffer + counter inside the optimizer state, so the whole optimize step
compiles (no host sync per step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

QUEUE_LEN = 50


class AdaptiveClipState(NamedTuple):
    queue: jnp.ndarray  # [QUEUE_LEN] float32
    count: jnp.ndarray  # int32, number of valid entries


def _global_norm(updates):
    return optax.global_norm(updates)


def adaptive_gradient_clip(max_grad: float, queue_init: float = 3000.0):
    """EDM adaptive clipping (ref losses.py:28-50, 75-94).

    - ``max_grad <= 1``: plain clip-by-global-norm to ``max_grad``.
    - else: allowed = min(1.5*mean(queue) + 2*std(queue), max_grad); clip to
      allowed; push min(grad_norm, allowed) onto the queue.
    - ``max_grad < 0`` disables clipping entirely (ref :89).
    """
    if max_grad < 0:
        return optax.identity()
    if max_grad <= 1.0:
        return optax.clip_by_global_norm(max_grad)

    def init_fn(params):
        del params
        queue = jnp.zeros((QUEUE_LEN,), jnp.float32).at[0].set(queue_init)
        return AdaptiveClipState(queue=queue, count=jnp.asarray(1, jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        valid = (jnp.arange(QUEUE_LEN) < state.count).astype(jnp.float32)
        n = jnp.maximum(state.count.astype(jnp.float32), 1.0)
        mean = jnp.sum(state.queue * valid) / n
        # population std like np.std (ref Queue.std, losses.py:71-72)
        var = jnp.sum(valid * (state.queue - mean) ** 2) / n
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        allowed = jnp.minimum(1.5 * mean + 2.0 * std, max_grad)

        gnorm = _global_norm(updates)
        scale = jnp.minimum(1.0, allowed / jnp.maximum(gnorm, 1e-12))
        updates = jax.tree_util.tree_map(lambda u: u * scale, updates)

        pushed = jnp.minimum(gnorm, allowed)
        # insert at front, drop last (ref Queue.add, losses.py:63-66)
        queue = jnp.concatenate([pushed[None], state.queue[:-1]])
        count = jnp.minimum(state.count + 1, QUEUE_LEN)
        return updates, AdaptiveClipState(queue=queue, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(lr: float, warmup: int):
    """lr * min(step / warmup, 1) (ref losses.py:86-88)."""
    if warmup <= 0:
        return lr

    def schedule(step):
        return lr * jnp.minimum(step / warmup, 1.0)

    return schedule


def get_optimizer(config) -> optax.GradientTransformation:
    """Build the optax chain mirroring ref losses.py:14-25 + 75-94:
    adaptive clip -> Adam/AdamW(amsgrad) with warmup LR."""
    schedule = make_lr_schedule(config.optim.lr, config.optim.warmup)
    name = config.optim.optimizer
    if name == "Adam":
        core = optax.adam(
            learning_rate=schedule,
            b1=config.optim.beta1,
            b2=0.999,
            eps=config.optim.eps,
        )
        if config.optim.weight_decay:
            # torch Adam weight_decay is an L2 term added to the gradient
            core = optax.chain(
                optax.add_decayed_weights(config.optim.weight_decay), core
            )
    elif name == "AdamW":
        # ref: torch.optim.AdamW(lr, amsgrad=True, weight_decay=1e-12)
        core = optax.chain(
            optax.scale_by_amsgrad(),
            optax.add_decayed_weights(1e-12),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise NotImplementedError(f"Optimizer {name} not supported yet!")

    return optax.chain(adaptive_gradient_clip(config.optim.grad_clip), core)
