"""Jitted train / eval step factories (ref losses.py:97-125).

``get_step_fn`` wires loss -> grad -> adaptive-clip optimizer -> EMA into one
pure function ``(state, batch, rng) -> (state, loss)``. Data-parallel
execution over a mesh is layered on top in ``diffspectra_tpu.parallel``.
"""

from __future__ import annotations


import jax
import optax

from ..models import ema as ema_lib
from ..models.dmt import encode_context_train
from .losses import (
    get_sde_2d_loss_fn,
    get_sde_graph_loss_fn,
    get_sde_node_loss_fn,
)
from .train_state import TrainState


def make_loss_fn(noise_scheduler, scaler, config):
    if config.pred_edge:
        if config.only_2D:
            return get_sde_2d_loss_fn(noise_scheduler, scaler, config)
        return get_sde_graph_loss_fn(noise_scheduler, scaler, config)
    return get_sde_node_loss_fn(noise_scheduler, scaler, config)


def _make_apply_fn(model, params, train: bool):
    def apply_fn(rng, batch_stats, *args, **kwargs):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train:
            out, mutated = model.apply(
                variables,
                *args,
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
                **kwargs,
            )
            return out, mutated.get("batch_stats", batch_stats)
        out = model.apply(variables, *args, deterministic=True, **kwargs)
        return out, batch_stats

    return apply_fn


def get_step_fn(
    noise_scheduler, model, tx, scaler, config, train: bool = True,
    axis_name: str | None = None,
):
    """Build the (jittable) step function.

    ``axis_name``: when set, the step is written for ``shard_map`` data
    parallelism — gradients, loss and batch statistics are ``pmean``-reduced
    over that mesh axis before the (replicated) optimizer update, the TPU
    equivalent of the reference's DataParallel gradient gather
    (ref models/utils.py:27).
    """
    loss_fn = make_loss_fn(noise_scheduler, scaler, config)
    # one spectra encode per step, shared by the self-conditioning double
    # call (see losses._maybe_reuse_context); only meaningful with self_cond
    # and a SpecFormer-conditioned model
    reuse_cond_emb = bool(
        train
        and config.model.self_cond
        and config.model.get("reuse_cond_emb", False)
        and hasattr(model, "patch_len")
    )

    def train_step(state: TrainState, batch, rng):
        if axis_name is not None:
            # decorrelate per-shard noise draws
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def loss_wrapped(params):
            apply_fn = _make_apply_fn(model, params, train=True)
            if reuse_cond_emb:
                def encode(r, stats, context):
                    return encode_context_train(model, params, stats, context, r)

                apply_fn.encode = encode
            return loss_fn(apply_fn, state.batch_stats, batch, rng)

        (loss, new_stats), grads = jax.value_and_grad(loss_wrapped, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_lib.update(state.ema, new_params)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema=new_ema,
        )
        return new_state, loss

    def eval_step(state: TrainState, batch, rng):
        # evaluated with EMA parameters, deterministic (ref losses.py:116-123)
        apply_fn = _make_apply_fn(model, ema_lib.params(state.ema), train=False)
        loss, _ = loss_fn(apply_fn, state.batch_stats, batch, rng)
        return state, loss

    return train_step if train else eval_step
