"""Ancestral reverse-diffusion sampling as a single on-device ``lax.scan``.

JAX rewrite of ref sampling.py:553-695. The reference dispatches each of the
1000 reverse steps from Python (host round-trip per step, schedule math on
host); here the full loop — per-step (alpha, sigma) posterior coefficients,
the DMT forward, self-conditioning carry, and noise injection — compiles
into one XLA program. Per-step coefficients are precomputed as ``[S]``
arrays before the scan.

The spectra conditioning is encoded ONCE (``context_emb``) instead of per
step — SpecFormer over <= 347 tokens costs roughly as much as a DMT forward
over 29 atoms, so this alone nearly halves the per-step cost versus a naive
port.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils import masks as M


def make_time_steps(noise_scheduler, steps: int, eps: float = 1e-3):
    """linspace(T, eps, steps) (ref sampling.py:163, 368)."""
    return jnp.linspace(noise_scheduler.T, eps, steps)


class AncestralSampler:
    """Ancestral sampler for joint 2D & 3D generation (ref sampling.py:553-631).

    ``model_apply(t_vec, x, node_mask, edge_mask, edge_x, noise_level,
    cond_x, cond_edge_x, has_cond, context_emb) -> (pred, edge_pred)`` is a
    pure closure over model variables (EMA params, eval mode).
    """

    def __init__(
        self,
        noise_scheduler,
        time_steps: jnp.ndarray,
        model_pred_data: bool,
        pred_edge: bool = False,
        self_cond: bool = False,
        cond_process_fn: Optional[Callable] = None,
        sampling_temperature: float = 1.0,
        only_2d: bool = False,
    ):
        self.noise_scheduler = noise_scheduler
        self.t_array = time_steps
        self.s_array = jnp.concatenate([time_steps[1:], jnp.zeros(1)])
        self.model_pred_data = model_pred_data
        self.pred_edge = pred_edge
        self.self_cond = self_cond
        self.cond_process_fn = cond_process_fn
        self.sampling_temperature = sampling_temperature
        self.only_2d = only_2d

        # precompute per-step posterior coefficients (ref :571-580) as [S]
        alpha_t, sigma_t = noise_scheduler.marginal_prob(self.t_array)
        alpha_s, sigma_s = noise_scheduler.marginal_prob(self.s_array)
        alpha_t_given_s = alpha_t / alpha_s
        sigma2_t_given_s = sigma_t**2 - alpha_t_given_s**2 * sigma_s**2
        sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
        self.coef_sigma = sigma_t_given_s * sigma_s / sigma_t
        self.coef_noise_level = jnp.log(alpha_t**2 / sigma_t**2)
        if model_pred_data:
            self.coef_x = alpha_t_given_s * sigma_s**2 / sigma_t**2
            self.coef_pred = alpha_s * sigma2_t_given_s / sigma_t**2
        else:
            self.coef_x = 1.0 / alpha_t_given_s
            self.coef_pred = -sigma2_t_given_s / alpha_t_given_s / sigma_t

    def sampling(
        self,
        model_apply,
        rng,
        z_T,
        node_mask,
        edge_mask,
        edge_z_T=None,
        context_emb=None,
    ):
        """Run the reverse loop; returns the final posterior mean(s)."""
        bs, n_nodes = z_T.shape[0], z_T.shape[1]
        feat_nf = z_T.shape[2] - (0 if self.only_2d else 3)
        edge_ch = edge_z_T.shape[-1] if edge_z_T is not None else 0
        steps = self.t_array.shape[0]

        def body(carry, step_inputs):
            x, edge_x, _, _, cond_x, cond_edge_x, has_cond, rng = carry
            (t, coef_x, coef_pred, coef_sigma, noise_level) = step_inputs

            vec_t = jnp.full((bs,), t)
            nl = jnp.full((bs,), noise_level)
            pred_t, edge_pred_t = model_apply(
                vec_t, x, node_mask, edge_mask, edge_x, nl,
                cond_x, cond_edge_x, has_cond, context_emb,
            )
            if self.self_cond:
                if self.cond_process_fn is not None:
                    cond_x, cond_edge_x = self.cond_process_fn(pred_t, edge_pred_t)
                else:
                    cond_x, cond_edge_x = pred_t, edge_pred_t
                has_cond = jnp.asarray(True)

            rng, k_node, k_edge = jax.random.split(rng, 3)
            x_mean = coef_x * x + coef_pred * pred_t
            if self.only_2d:
                noise = M.sample_gaussian_with_mask(k_node, x.shape, node_mask)
            else:
                noise = M.sample_combined_position_feature_noise(
                    k_node, bs, n_nodes, feat_nf, node_mask
                )
            x = x_mean + coef_sigma * noise * self.sampling_temperature

            if self.pred_edge:
                edge_x_mean = coef_x * edge_x + coef_pred * edge_pred_t
                edge_noise = M.sample_symmetric_edge_feature_noise(
                    k_edge, bs, n_nodes, edge_ch, edge_mask
                )
                edge_x = (
                    edge_x_mean + coef_sigma * edge_noise * self.sampling_temperature
                )
            else:
                edge_x_mean = edge_x

            new_carry = (
                x, edge_x, x_mean, edge_x_mean, cond_x, cond_edge_x, has_cond, rng
            )
            return new_carry, None

        init_cond_x = jnp.zeros_like(z_T)
        init_cond_edge = (
            jnp.zeros_like(edge_z_T) if edge_z_T is not None else jnp.zeros(())
        )
        edge0 = edge_z_T if edge_z_T is not None else jnp.zeros(())
        carry0 = (
            z_T,
            edge0,
            jnp.zeros_like(z_T),
            jnp.zeros_like(edge0),
            init_cond_x,
            init_cond_edge,
            jnp.asarray(False),
            rng,
        )
        step_inputs = (
            self.t_array,
            self.coef_x * jnp.ones(steps),
            self.coef_pred * jnp.ones(steps),
            self.coef_sigma,
            self.coef_noise_level,
        )
        carry, _ = jax.lax.scan(body, carry0, step_inputs)
        x_mean, edge_x_mean = carry[2], carry[3]
        if self.pred_edge:
            return x_mean, edge_x_mean
        return x_mean
