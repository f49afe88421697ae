"""VP-SDE noise schedules (DPM-Solver parameterisation).

JAX rewrite of ref diffusion/noise_schedule.py:6-201. Supports the same four
schedules: 'discrete', 'discrete_poly', 'linear', 'cosine' (T = 0.9946 for
cosine, ref :48-51). All marginal functions are pure jnp and traceable, so
the whole reverse-diffusion loop (including per-step alpha/sigma) compiles
into a single ``lax.scan``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def interpolate_fn(x: jnp.ndarray, xp: jnp.ndarray, yp: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interpolation with linear extrapolation outside the
    keypoint range, matching ref diffusion/noise_schedule.py:129-168.

    x: [N], xp: [K] sorted ascending, yp: [K]. Differentiable.
    """
    K = xp.shape[0]
    # index of the segment: xp[idx-1] <= x < xp[idx]
    idx = jnp.searchsorted(xp, x, side="right")
    # clamp so that outside the range we use the outermost segment (linear
    # extrapolation, like the torch implementation)
    start = jnp.clip(idx - 1, 0, K - 2)
    x0 = xp[start]
    x1 = xp[start + 1]
    y0 = yp[start]
    y1 = yp[start + 1]
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def get_polynomial_schedule(time_steps: int, s: float = 1e-4, power: float = 2.0):
    """alpha^2 schedule 1 - x^power with step clipping (ref :184-201, from E3
    Diffusion). Returns alphas_cumprod (alpha^2) of length ``time_steps``."""
    steps = time_steps + 1
    x = jnp.linspace(0, steps, steps)
    alphas2 = (1 - jnp.power(x / steps, power)) ** 2
    alphas2 = jnp.concatenate([jnp.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = jnp.clip(alphas_step, 0.001, 1.0)
    alphas2 = jnp.cumprod(alphas_step, axis=0)
    precision = 1 - 2 * s
    alphas2 = precision * alphas2 + s
    return alphas2[1:]


class NoiseScheduleVP:
    """Forward VP-SDE wrapper: alpha_t, sigma_t, lambda_t = log(alpha/sigma).

    Mirrors ref diffusion/noise_schedule.py:6-122. Instances hold only static
    floats / jnp constant arrays, so they are safe to close over inside jitted
    functions.
    """

    def __init__(
        self,
        schedule: str = "discrete",
        betas=None,
        alphas_cumprod=None,
        continuous_beta_0: float = 0.1,
        continuous_beta_1: float = 20.0,
    ):
        if schedule not in ("discrete", "linear", "cosine", "discrete_poly"):
            raise ValueError(f"Unsupported noise schedule {schedule}")
        self.schedule = schedule
        if "discrete" in schedule:
            if schedule == "discrete_poly":
                alphas_cumprod = get_polynomial_schedule(1000, power=2)
                log_alphas = 0.5 * jnp.log(alphas_cumprod)
            elif betas is not None:
                log_alphas = 0.5 * jnp.cumsum(jnp.log(1 - betas), axis=0)
            else:
                assert alphas_cumprod is not None
                log_alphas = 0.5 * jnp.log(alphas_cumprod)
            self.total_N = log_alphas.shape[0]
            self.T = 1.0
            self.t_array = jnp.linspace(0.0, 1.0, self.total_N + 1)[1:]
            self.log_alpha_array = log_alphas
        else:
            self.total_N = 1000
            self.beta_0 = continuous_beta_0
            self.beta_1 = continuous_beta_1
            self.cosine_s = 0.008
            self.cosine_beta_max = 999.0
            self.cosine_t_max = (
                math.atan(self.cosine_beta_max * (1.0 + self.cosine_s) / math.pi)
                * 2.0
                * (1.0 + self.cosine_s)
                / math.pi
                - self.cosine_s
            )
            self.cosine_log_alpha_0 = math.log(
                math.cos(self.cosine_s / (1.0 + self.cosine_s) * math.pi / 2.0)
            )
            # cosine schedule is numerically unstable at T=1 (ref :48-51)
            self.T = 0.9946 if schedule == "cosine" else 1.0

    def marginal_log_mean_coeff(self, t: jnp.ndarray) -> jnp.ndarray:
        """log(alpha_t) for continuous t in [0, T] (ref :70-79)."""
        t = jnp.asarray(t)
        if "discrete" in self.schedule:
            return interpolate_fn(
                t.reshape(-1), self.t_array, self.log_alpha_array
            ).reshape(t.shape)
        if self.schedule == "linear":
            return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        # cosine
        log_alpha = jnp.log(
            jnp.cos((t + self.cosine_s) / (1.0 + self.cosine_s) * math.pi / 2.0)
        )
        return log_alpha - self.cosine_log_alpha_0

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_prob(self, t):
        """(alpha_t, sigma_t) (ref :89-91)."""
        log_mean = self.marginal_log_mean_coeff(t)
        return jnp.exp(log_mean), jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean))

    def marginal_lambda(self, t):
        """lambda_t = log(alpha_t) - log(sigma_t) (ref :93-99)."""
        log_mean = self.marginal_log_mean_coeff(t)
        log_std = 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_mean))
        return log_mean - log_std

    def inverse_lambda(self, lamb: jnp.ndarray) -> jnp.ndarray:
        """t such that marginal_lambda(t) == lamb (ref :101-117)."""
        lamb = jnp.asarray(lamb)
        if self.schedule == "linear":
            tmp = (
                2.0
                * (self.beta_1 - self.beta_0)
                * jnp.logaddexp(-2.0 * lamb, jnp.zeros_like(lamb))
            )
            delta = self.beta_0**2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) / (self.beta_1 - self.beta_0)
        if "discrete" in self.schedule:
            log_alpha = -0.5 * jnp.logaddexp(jnp.zeros_like(lamb), -2.0 * lamb)
            # interpolate in reversed (descending log_alpha) keypoints: flip
            # both arrays so xp is ascending again
            return interpolate_fn(
                log_alpha.reshape(-1),
                self.log_alpha_array[::-1],
                self.t_array[::-1],
            ).reshape(lamb.shape)
        log_alpha = -0.5 * jnp.logaddexp(-2.0 * lamb, jnp.zeros_like(lamb))
        t = (
            jnp.arccos(jnp.exp(log_alpha + self.cosine_log_alpha_0))
            * 2.0
            * (1.0 + self.cosine_s)
            / math.pi
            - self.cosine_s
        )
        return t

    def get_noiseLevel(self, t):
        """log SNR = log(alpha^2 / sigma^2) (ref :119-122)."""
        alpha = self.marginal_alpha(t)
        sigma = self.marginal_std(t)
        return jnp.log(alpha**2 / sigma**2)
