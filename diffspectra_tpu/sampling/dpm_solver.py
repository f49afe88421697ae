"""DPM-Solver++(2M) fast sampler — one lax.scan, 10-20x fewer model calls.

TPU-native extension beyond the reference surface: the reference ships the
DPM-Solver noise-schedule wrapper (ref diffusion/noise_schedule.py:1-13 is
the verbatim DPM-Solver docstring) but only ever runs the 1000-step
ancestral sampler (ref sampling.py:553-631, configs/diffspectra_qm9s.py:133).
This module adds the matching solver: DPM-Solver++ second-order multistep
(Lu et al. 2022, arXiv:2211.01095) in data-prediction space, so the same
trained checkpoints sample in 50-100 steps at comparable quality — the 10k
eval protocol drops from ~12 min to ~1 min on one chip.

Update rule (half-logSNR lambda(t), data prediction x0):
  h_i   = lambda_i - lambda_{i-1}                (> 0 going t: T -> eps)
  D_i   = (1 + 1/(2 r)) x0_i - 1/(2 r) x0_{i-1},  r = h_{i-1}/h_i   (2M)
  x_i   = (sigma_i/sigma_{i-1}) x_{i-1} - alpha_i (e^{-h_i} - 1) D_i
First step falls back to order 1 (DDIM in x0 form). Deterministic ODE
solver: ``sampling_temperature`` does not apply. Noise-prediction models are
handled by converting eps-hat -> x0 inside the step.

``stochastic=True`` switches to SDE-DPM-Solver++(2M) (same paper, eta=1) —
the ancestral-like variant that re-injects noise each step, which usually
recovers sample diversity/3D quality the ODE path loses at low step counts:
  x_i = (sigma_i/sigma_{i-1}) e^{-h_i} x_{i-1} + alpha_i (1 - e^{-2 h_i}) D_i
        + sigma_i sqrt(1 - e^{-2 h_i}) z,   z ~ masked CoM-free / symmetric
(same D_i blending; per-step exactness check: with a perfect point-mass
denoiser the marginals stay N(alpha_i x0, sigma_i^2) — mean coefficient
c_x alpha_{i-1} + c_d = alpha_i and variance c_x^2 sigma_{i-1}^2 + c_n^2 =
sigma_i^2, asserted in tests/test_dpm_solver.py). ``sampling_temperature``
scales the injected noise exactly as in the ancestral sampler. Select with
``config.sampling.method = 'dpm_solver_sde'``.

Node and edge tensors advance jointly with the same scalar coefficients;
CoM-free positions stay CoM-free (all updates are linear combinations of
CoM-free arrays). Self-conditioning feeds the previous x0 prediction,
matching the ancestral sampler's carry semantics.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils import masks as M


class DPMSolverPP:
    """Drop-in alternative to ``AncestralSampler`` (same ``sampling`` API)."""

    def __init__(
        self,
        noise_scheduler,
        time_steps: jnp.ndarray,
        model_pred_data: bool,
        pred_edge: bool = False,
        self_cond: bool = False,
        cond_process_fn: Optional[Callable] = None,
        sampling_temperature: float = 1.0,  # ODE path: unused (API parity)
        only_2d: bool = False,
        stochastic: bool = False,
    ):
        self.noise_scheduler = noise_scheduler
        self.model_pred_data = model_pred_data
        self.pred_edge = pred_edge
        self.self_cond = self_cond
        self.cond_process_fn = cond_process_fn
        self.only_2d = only_2d
        self.stochastic = stochastic
        self.sampling_temperature = sampling_temperature

        t = time_steps  # [S] nodes, t_0 = T ... t_{S-1} = eps
        lam = noise_scheduler.marginal_lambda(t)
        alpha, sigma = noise_scheduler.marginal_prob(t)
        self.t_array = t
        self.noise_levels = jnp.log(alpha**2 / sigma**2)
        self.alpha = alpha
        self.sigma = sigma

        # transition i-1 -> i for i = 1..S-1
        h = lam[1:] - lam[:-1]  # [S-1], > 0
        r = jnp.concatenate([jnp.ones(1), h[:-1]]) / h  # r_i = h_{i-1}/h_i
        if stochastic:
            e_h = jnp.exp(-h)
            self.c_x = (sigma[1:] / sigma[:-1]) * e_h
            self.c_d = alpha[1:] * (1.0 - e_h**2)
            self.c_n = sigma[1:] * jnp.sqrt(1.0 - e_h**2)
        else:
            self.c_x = sigma[1:] / sigma[:-1]  # [S-1]
            self.c_d = -alpha[1:] * (jnp.exp(-h) - 1.0)
            self.c_n = jnp.zeros_like(h)
        # 2M blending weights; first transition is order 1
        w_cur = 1.0 + 1.0 / (2.0 * r)
        w_prev = -1.0 / (2.0 * r)
        self.w_cur = w_cur.at[0].set(1.0)
        self.w_prev = w_prev.at[0].set(0.0)

    def _to_x0(self, x, pred, alpha_t, sigma_t):
        if self.model_pred_data:
            return pred
        return (x - sigma_t * pred) / alpha_t  # eps-hat -> x0

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
        bs, n_nodes = z_T.shape[0], z_T.shape[1]
        feat_nf = z_T.shape[2] - (0 if self.only_2d else 3)
        edge_ch = edge_z_T.shape[-1] if edge_z_T is not None else 0

        def call_model(x, edge_x, i, cond_x, cond_edge_x, has_cond):
            vec_t = jnp.full((bs,), self.t_array[i])
            nl = jnp.full((bs,), self.noise_levels[i])
            pred, edge_pred = model_apply(
                vec_t, x, node_mask, edge_mask, edge_x, nl,
                cond_x, cond_edge_x, has_cond, context_emb,
            )
            x0 = self._to_x0(x, pred, self.alpha[i], self.sigma[i])
            if self.pred_edge:
                edge_x0 = self._to_x0(edge_x, edge_pred, self.alpha[i], self.sigma[i])
            else:
                edge_x0 = edge_pred
            return x0, edge_x0

        def body(carry, step_inputs):
            (x, edge_x, prev_x0, prev_e0, cond_x, cond_edge_x, has_cond, k) = carry
            (i, c_x, c_d, c_n, w_cur, w_prev) = step_inputs

            x0, edge_x0 = call_model(x, edge_x, i, cond_x, cond_edge_x, has_cond)
            if self.self_cond:
                if self.cond_process_fn is not None:
                    cond_x, cond_edge_x = self.cond_process_fn(x0, edge_x0)
                else:
                    cond_x, cond_edge_x = x0, edge_x0
                has_cond = jnp.asarray(True)

            d = w_cur * x0 + w_prev * prev_x0
            x = c_x * x + c_d * d
            if self.pred_edge:
                d_e = w_cur * edge_x0 + w_prev * prev_e0
                edge_x = c_x * edge_x + c_d * d_e
            if self.stochastic:
                k, k_node, k_edge = jax.random.split(k, 3)
                if self.only_2d:
                    noise = M.sample_gaussian_with_mask(k_node, x.shape, node_mask)
                else:
                    noise = M.sample_combined_position_feature_noise(
                        k_node, bs, n_nodes, feat_nf, node_mask
                    )
                x = x + c_n * noise * self.sampling_temperature
                if self.pred_edge:
                    edge_noise = M.sample_symmetric_edge_feature_noise(
                        k_edge, bs, n_nodes, edge_ch, edge_mask
                    )
                    edge_x = edge_x + c_n * edge_noise * self.sampling_temperature

            return (x, edge_x, x0, edge_x0, cond_x, cond_edge_x, has_cond, k), None

        edge0 = edge_z_T if edge_z_T is not None else jnp.zeros(())
        carry0 = (
            z_T,
            edge0,
            jnp.zeros_like(z_T),
            jnp.zeros_like(edge0),
            jnp.zeros_like(z_T),
            jnp.zeros_like(edge0),
            jnp.asarray(False),
            rng,
        )
        S = self.t_array.shape[0]
        step_inputs = (
            jnp.arange(S - 1),
            self.c_x,
            self.c_d,
            self.c_n,
            self.w_cur,
            self.w_prev,
        )
        carry, _ = jax.lax.scan(body, carry0, step_inputs)
        x, edge_x = carry[0], carry[1]

        # final denoise-to-zero: one model call at t_{S-1} = eps, return x0
        # (the ancestral sampler's "final mean" analogue, ref sampling.py:626)
        x0, edge_x0 = call_model(
            x, edge_x, S - 1, carry[4], carry[5], carry[6]
        )
        if self.pred_edge:
            return x0, edge_x0
        return x0
