"""Training objectives: VP-SDE diffusion losses over nodes, positions and
dense edges, with Kabsch alignment and stochastic self-conditioning.

JAX rewrite of ref losses.py:97-529. Everything — t sampling, forward
perturbation, batched 3x3 SVD alignment, the 50%-probability two-pass
self-conditioning (``lax.cond`` so only one branch executes), and the
weighted MSE — lives inside one jitted function.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.kabsch import get_align_noise, get_align_position, get_align_position_v2
from ..utils import masks as M
from ..models.dmt import merge_encoder_stats
from ..utils.scalers import get_self_cond_fn

T_EPS = 1e-5


def parse_loss_weights(loss_weights) -> tuple:
    if isinstance(loss_weights, str):
        return tuple(float(w) for w in loss_weights.split(","))
    return tuple(float(w) for w in loss_weights)


def process_edge_batch(batch, scaler, model_name: str, include_charges: bool = True):
    """Normalise and pack a dense batch (ref losses.py:498-529).

    batch keys: positions [B,N,3], atom_mask [B,N], edge_mask [B,N,N],
    atom_one_hot [B,N,A], edge_one_hot [B,N,N,C], formal_charges [B,N,1],
    context (optional).
    Returns xh [B,N,3+A+1], edge_x, node_mask [B,N,1], edge_mask [B,N,N],
    context.
    """
    pos = batch["positions"]
    node_mask = batch["atom_mask"][..., None]
    edge_mask = batch["edge_mask"]
    atom_type = batch["atom_one_hot"]
    edge_type = batch["edge_one_hot"]
    # zero-width fc channel when formal charges are excluded
    # (ref losses.py:505: torch.zeros(0) broadcast)
    fc_charge = (
        batch["formal_charges"]
        if include_charges
        else jnp.zeros(atom_type.shape[:2] + (0,))
    )
    context = batch.get("context", None)

    # DMT normalises to CoM; DMT_WO_EQ keeps the translation augmentation
    # (ref losses.py:517-523)
    if model_name == "DMT":
        pos = M.remove_mean_with_mask(pos, node_mask)
    elif model_name == "DMT_WO_EQ":
        pass
    else:
        raise NotImplementedError(f"{model_name} not supported yet!")
    pos, atom_type, fc_charge, edge_type = scaler(
        pos, atom_type, fc_charge, node_mask, edge_type, edge_mask
    )
    xh = jnp.concatenate([pos, atom_type, fc_charge], axis=2)
    return xh, edge_type, node_mask, edge_mask, context


def process_batch_2d(batch, scaler, include_charges: bool = True):
    """2D variant without positions (ref losses.py:472-495)."""
    node_mask = batch["atom_mask"][..., None]
    edge_mask = batch["edge_mask"]
    atom_type = batch["atom_one_hot"]
    edge_type = batch["edge_one_hot"]
    fc_charge = (
        batch["formal_charges"]
        if include_charges
        else jnp.zeros(atom_type.shape[:2] + (0,))
    )
    context = batch.get("context", None)
    _, atom_type, fc_charge, edge_type = scaler(
        None, atom_type, fc_charge, node_mask, edge_type, edge_mask
    )
    xh = jnp.concatenate([atom_type, fc_charge], axis=2)
    return xh, edge_type, node_mask, edge_mask, context


def _maybe_reuse_context(apply_fn, batch_stats, context, rng):
    """Hoist the spectra encoding out of the self-conditioning double call.

    When the step factory attached a train-mode encoder to ``apply_fn``
    (``config.model.reuse_cond_emb``) and the batch carries spectra, encode
    them ONCE here and hand both model forwards the precomputed
    ``context_emb`` — the reference re-runs SpecFormer inside each of its two
    train-mode forwards on identical input (ref losses.py:341-354); one
    encode per step is the TPU-cheap equivalent (see
    ``models.dmt.encode_context_train`` for the exact semantics delta).

    Returns ``(context_arg, context_emb, batch_stats, rng)`` where
    ``context_arg`` is what to pass as the model's ``context`` (``None`` when
    the embedding path is active).
    """
    encode = getattr(apply_fn, "encode", None)
    if encode is None or context is None:
        return context, None, batch_stats, rng
    rng, k_enc = jax.random.split(rng)
    ctx_emb, new_stats = encode(k_enc, batch_stats, context)
    return None, ctx_emb, new_stats, rng


def get_sde_graph_loss_fn(noise_scheduler, scaler, config):
    """Joint 3D + edge loss (ref losses.py:286-396).

    Returns ``loss_fn(apply_fn, batch_stats, batch, rng) -> (loss, stats')``
    where ``apply_fn(rng, batch_stats, *call_args, **kw)`` closes over the
    differentiated params, applies the model, and returns
    ``((pred, edge_pred), batch_stats')`` — BatchNorm statistics (SpecFormer)
    thread functionally through the self-conditioning double call exactly as
    the reference's two train-mode forwards do (ref losses.py:341-354).
    """
    reduce_mean = config.training.reduce_mean
    noise_align = config.model.noise_align
    pred_data = config.model.pred_data
    loss_weights = parse_loss_weights(config.model.loss_weights)
    self_cond = config.model.self_cond
    cond_process_fn = get_self_cond_fn(config) if self_cond else None
    model_name = config.model.name
    include_charges = bool(config.model.include_fc_charge)

    def loss_fn(apply_fn, batch_stats, batch, rng):
        xh, edge_x, node_mask, edge_mask, context = process_edge_batch(
            batch, scaler, model_name, include_charges
        )
        bs, n_nodes, _ = xh.shape
        n_atoms = jnp.sum(node_mask[..., 0], axis=-1)

        rng, k_t, k_noise, k_edge, k_sc = jax.random.split(rng, 5)
        t = jax.random.uniform(k_t, (bs,)) * (1.0 - T_EPS) + T_EPS
        alpha_t, sigma_t = noise_scheduler.marginal_prob(t)

        noise = M.sample_combined_position_feature_noise(
            k_noise, bs, n_nodes, xh.shape[2] - 3, node_mask
        )
        edge_noise = M.sample_symmetric_edge_feature_noise(
            k_edge, bs, n_nodes, edge_x.shape[-1], edge_mask
        )

        a = alpha_t[:, None, None]
        s = sigma_t[:, None, None]
        z_t = a * xh + s * noise
        edge_z_t = a[..., None] * edge_x + s[..., None] * edge_noise

        # rotation-align the clean positions to the noisy frame
        # (ref losses.py:322-337)
        if noise_align:
            if pred_data:
                if model_name == "DMT":
                    align_pos = get_align_position(z_t, xh)
                elif model_name == "DMT_WO_EQ":
                    pos_0_com = M.remove_mean_with_mask(xh[:, :, :3], node_mask)
                    pos_t_com = M.remove_mean_with_mask(z_t[:, :, :3], node_mask)
                    align_pos = get_align_position_v2(pos_t_com, pos_0_com)
                else:
                    raise NotImplementedError(model_name)
            else:
                noise = get_align_noise(z_t, xh, alpha_t, sigma_t, noise, node_mask)
                align_pos = xh[:, :, :3]
        else:
            align_pos = xh[:, :, :3]

        noise_level = jnp.log(alpha_t**2 / sigma_t**2)

        context_arg, ctx_emb, batch_stats, rng = _maybe_reuse_context(
            apply_fn, batch_stats, context, rng
        )

        def call_model(r, stats, cond_x, cond_edge_x, has_cond):
            out, stats = apply_fn(
                r, stats, t, z_t, node_mask, edge_mask, context_arg,
                edge_x=edge_z_t, noise_level=noise_level,
                cond_x=cond_x, cond_edge_x=cond_edge_x, has_cond=has_cond,
                context_emb=ctx_emb,
            )
            if ctx_emb is not None:
                stats = merge_encoder_stats(stats, batch_stats)
            return out, stats

        if self_cond:
            assert pred_data
            rng, k_m1, k_m2 = jax.random.split(rng, 3)
            use_sc = jax.random.bernoulli(k_sc, 0.5)

            def with_sc(stats):
                (cond_x, cond_edge_x), stats = call_model(
                    k_m1, stats,
                    jnp.zeros_like(xh),
                    jnp.zeros_like(edge_x),
                    jnp.asarray(False),
                )
                cond_x = jax.lax.stop_gradient(cond_x)
                cond_edge_x = jax.lax.stop_gradient(cond_edge_x)
                cond_x, cond_edge_x = cond_process_fn(cond_x, cond_edge_x)
                return call_model(k_m2, stats, cond_x, cond_edge_x, jnp.asarray(True))

            def without_sc(stats):
                return call_model(
                    k_m2, stats,
                    jnp.zeros_like(xh),
                    jnp.zeros_like(edge_x),
                    jnp.asarray(False),
                )

            (pred, edge_pred), batch_stats = jax.lax.cond(
                use_sc, with_sc, without_sc, batch_stats
            )
        else:
            rng, k_m = jax.random.split(rng)
            (pred, edge_pred), batch_stats = call_model(
                k_m, batch_stats, jnp.zeros_like(xh), jnp.zeros_like(edge_x),
                jnp.asarray(False),
            )

        if pred_data:
            losses_pos = jnp.sum(
                jnp.mean(jnp.square(pred[:, :, :3] - align_pos), axis=-1), axis=-1
            )
            losses_atom = jnp.sum(
                jnp.mean(jnp.square(pred[:, :, 3:] - xh[:, :, 3:]), axis=-1), axis=-1
            )
            losses_edge = jnp.sum(
                jnp.mean(jnp.square(edge_x - edge_pred), axis=-1).reshape(bs, -1),
                axis=-1,
            )
        else:
            sq_atom = jnp.square(noise - pred)
            losses_pos = jnp.sum(jnp.mean(sq_atom[:, :, :3], axis=-1), axis=-1)
            losses_atom = jnp.sum(jnp.mean(sq_atom[:, :, 3:], axis=-1), axis=-1)
            losses_edge = jnp.sum(
                jnp.mean(jnp.square(edge_noise - edge_pred), axis=-1).reshape(bs, -1),
                axis=-1,
            )

        if reduce_mean:
            losses_pos = losses_pos / n_atoms
            losses_atom = losses_atom / n_atoms
            losses_edge = losses_edge / (
                jnp.sum(edge_mask.reshape(bs, -1), axis=-1) + 1e-8
            )

        losses = (
            loss_weights[0] * losses_pos
            + loss_weights[1] * losses_atom
            + loss_weights[2] * losses_edge
        )
        if pred_data:
            # sqrt(alpha/sigma) SNR weighting (ref losses.py:390-392)
            losses = jnp.sqrt(alpha_t / sigma_t) * losses
        return jnp.mean(losses), batch_stats

    return loss_fn


def get_sde_2d_loss_fn(noise_scheduler, scaler, config):
    """2D-only variant: atoms + edges, no positions (ref losses.py:210-283)."""
    reduce_mean = config.training.reduce_mean
    pred_data = config.model.pred_data
    loss_weights = parse_loss_weights(config.model.loss_weights)
    self_cond = config.model.self_cond
    include_charges = bool(config.model.include_fc_charge)

    def loss_fn(apply_fn, batch_stats, batch, rng):
        xh, edge_x, node_mask, edge_mask, context = process_batch_2d(
            batch, scaler, include_charges
        )
        bs, n_nodes, _ = xh.shape
        n_atoms = jnp.sum(node_mask[..., 0], axis=-1)

        rng, k_t, k_noise, k_edge, k_sc = jax.random.split(rng, 5)
        t = jax.random.uniform(k_t, (bs,)) * (1.0 - T_EPS) + T_EPS
        alpha_t, sigma_t = noise_scheduler.marginal_prob(t)

        noise = M.sample_gaussian_with_mask(k_noise, xh.shape, node_mask)
        edge_noise = M.sample_symmetric_edge_feature_noise(
            k_edge, bs, n_nodes, edge_x.shape[-1], edge_mask
        )
        a = alpha_t[:, None, None]
        s = sigma_t[:, None, None]
        z_t = a * xh + s * noise
        edge_z_t = a[..., None] * edge_x + s[..., None] * edge_noise
        noise_level = jnp.log(alpha_t**2 / sigma_t**2)

        context_arg, ctx_emb, batch_stats, rng = _maybe_reuse_context(
            apply_fn, batch_stats, context, rng
        )

        def call_model(r, stats, cond_x, cond_edge_x, has_cond):
            out, stats = apply_fn(
                r, stats, t, z_t, node_mask, edge_mask, context_arg,
                edge_x=edge_z_t, noise_level=noise_level,
                cond_x=cond_x, cond_edge_x=cond_edge_x, has_cond=has_cond,
                context_emb=ctx_emb,
            )
            if ctx_emb is not None:
                stats = merge_encoder_stats(stats, batch_stats)
            return out, stats

        if self_cond:
            assert pred_data
            rng, k_m1, k_m2 = jax.random.split(rng, 3)
            use_sc = jax.random.bernoulli(k_sc, 0.5)

            def with_sc(stats):
                (cond_x, cond_edge_x), stats = call_model(
                    k_m1, stats, jnp.zeros_like(xh), jnp.zeros_like(edge_x),
                    jnp.asarray(False),
                )
                return call_model(
                    k_m2, stats,
                    jax.lax.stop_gradient(cond_x),
                    jax.lax.stop_gradient(cond_edge_x),
                    jnp.asarray(True),
                )

            def without_sc(stats):
                return call_model(
                    k_m2, stats, jnp.zeros_like(xh), jnp.zeros_like(edge_x),
                    jnp.asarray(False),
                )

            (pred, edge_pred), batch_stats = jax.lax.cond(
                use_sc, with_sc, without_sc, batch_stats
            )
        else:
            rng, k_m = jax.random.split(rng)
            (pred, edge_pred), batch_stats = call_model(
                k_m, batch_stats, jnp.zeros_like(xh), jnp.zeros_like(edge_x),
                jnp.asarray(False),
            )

        if pred_data:
            losses_atom = jnp.sum(jnp.mean(jnp.square(pred - xh), axis=-1), axis=-1)
            losses_edge = jnp.sum(
                jnp.mean(jnp.square(edge_x - edge_pred), axis=-1).reshape(bs, -1),
                axis=-1,
            )
        else:
            losses_atom = jnp.sum(jnp.mean(jnp.square(noise - pred), axis=-1), axis=-1)
            losses_edge = jnp.sum(
                jnp.mean(jnp.square(edge_noise - edge_pred), axis=-1).reshape(bs, -1),
                axis=-1,
            )

        if reduce_mean:
            losses_atom = losses_atom / n_atoms
            losses_edge = losses_edge / (
                jnp.sum(edge_mask.reshape(bs, -1), axis=-1) + 1e-8
            )
        losses = loss_weights[1] * losses_atom + loss_weights[2] * losses_edge
        if pred_data:
            losses = jnp.sqrt(alpha_t / sigma_t) * losses
        return jnp.mean(losses), batch_stats

    return loss_fn


def get_sde_node_loss_fn(noise_scheduler, scaler, config):
    """Node-features + positions loss, no edges (ref losses.py:128-207).

    Same apply_fn contract as the graph loss; the model is called without
    edge tensors and returns only node predictions.
    """
    reduce_mean = config.training.reduce_mean
    noise_align = config.model.noise_align
    pred_data = config.model.pred_data
    loss_weights = parse_loss_weights(config.model.loss_weights)
    self_cond = config.model.self_cond
    include_charges = bool(config.model.include_fc_charge)

    def loss_fn(apply_fn, batch_stats, batch, rng):
        pos = batch["positions"]
        node_mask = batch["atom_mask"][..., None]
        edge_mask = batch["edge_mask"]
        atom_type = batch["one_hot"] if "one_hot" in batch else batch["atom_one_hot"]
        fc_charge = (
            batch["formal_charges"]
            if include_charges
            else jnp.zeros(atom_type.shape[:2] + (0,))
        )
        pos = M.remove_mean_with_mask(pos, node_mask)
        pos, atom_type, fc_charge = scaler(pos, atom_type, fc_charge, node_mask)
        xh = jnp.concatenate([pos, atom_type, fc_charge], axis=2)
        bs, n_nodes, _ = xh.shape
        n_atoms = jnp.sum(node_mask[..., 0], axis=-1)

        rng, k_t, k_noise, k_sc = jax.random.split(rng, 4)
        t = jax.random.uniform(k_t, (bs,)) * (1.0 - T_EPS) + T_EPS
        alpha_t, sigma_t = noise_scheduler.marginal_prob(t)
        noise = M.sample_combined_position_feature_noise(
            k_noise, bs, n_nodes, xh.shape[2] - 3, node_mask
        )
        a = alpha_t[:, None, None]
        sd = sigma_t[:, None, None]
        z_t = a * xh + sd * noise

        if noise_align:
            if pred_data:
                align_pos = get_align_position(z_t, xh)
            else:
                noise = get_align_noise(z_t, xh, alpha_t, sigma_t, noise, node_mask)
                align_pos = xh[:, :, :3]
        else:
            align_pos = xh[:, :, :3]

        noise_level = jnp.log(alpha_t**2 / sigma_t**2)

        def call_model(r, stats, cond_x, has_cond):
            (pred, _), stats = apply_fn(
                r, stats, t, z_t, node_mask, edge_mask, None,
                edge_x=jnp.zeros(z_t.shape[:2] + (z_t.shape[1], 0)),
                noise_level=noise_level, cond_x=cond_x,
                cond_edge_x=None, has_cond=has_cond,
            )
            return pred, stats

        if self_cond:
            assert pred_data
            rng, k_m1, k_m2 = jax.random.split(rng, 3)
            use_sc = jax.random.bernoulli(k_sc, 0.5)

            def with_sc(stats):
                cond_x, stats = call_model(
                    k_m1, stats, jnp.zeros_like(xh), jnp.asarray(False)
                )
                return call_model(
                    k_m2, stats, jax.lax.stop_gradient(cond_x), jnp.asarray(True)
                )

            def without_sc(stats):
                return call_model(
                    k_m2, stats, jnp.zeros_like(xh), jnp.asarray(False)
                )

            pred, batch_stats = jax.lax.cond(use_sc, with_sc, without_sc, batch_stats)
        else:
            rng, k_m = jax.random.split(rng)
            pred, batch_stats = call_model(
                k_m, batch_stats, jnp.zeros_like(xh), jnp.asarray(False)
            )

        if pred_data:
            losses_pos = jnp.sum(
                jnp.mean(jnp.square(pred[:, :, :3] - align_pos), axis=-1), axis=-1
            )
            losses_atom = jnp.sum(
                jnp.mean(jnp.square(pred[:, :, 3:] - xh[:, :, 3:]), axis=-1), axis=-1
            )
        else:
            sq = jnp.square(noise - pred)
            losses_pos = jnp.sum(jnp.mean(sq[:, :, :3], axis=-1), axis=-1)
            losses_atom = jnp.sum(jnp.mean(sq[:, :, 3:], axis=-1), axis=-1)

        if reduce_mean:
            losses_pos = losses_pos / n_atoms
            losses_atom = losses_atom / n_atoms
        losses = loss_weights[0] * losses_pos + loss_weights[1] * losses_atom
        if pred_data:
            losses = jnp.sqrt(alpha_t / sigma_t) * losses
        return jnp.mean(losses), batch_stats

    return loss_fn
