"""Noise schedule golden tests against independently-computed formulas."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from diffspectra_tpu.diffusion import NoiseScheduleVP, get_polynomial_schedule, interpolate_fn


def test_linear_schedule_closed_form():
    sch = NoiseScheduleVP("linear")
    for t in [0.1, 0.35, 0.7, 0.99]:
        # VP-SDE with beta(t) = beta_0 + t (beta_1 - beta_0):
        # log alpha_t = -1/4 t^2 (b1-b0) - 1/2 t b0
        log_alpha = -0.25 * t**2 * (20.0 - 0.1) - 0.5 * t * 0.1
        alpha, sigma = sch.marginal_prob(jnp.asarray(t))
        np.testing.assert_allclose(float(alpha), math.exp(log_alpha), rtol=1e-5)
        np.testing.assert_allclose(
            float(sigma), math.sqrt(1 - math.exp(2 * log_alpha)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(alpha) ** 2 + float(sigma) ** 2, 1.0, rtol=1e-5
        )


def test_cosine_schedule_closed_form():
    sch = NoiseScheduleVP("cosine")
    assert sch.T == 0.9946
    s = 0.008
    log_alpha_0 = math.log(math.cos(s / (1 + s) * math.pi / 2))
    for t in [0.05, 0.5, 0.9]:
        expected = math.log(math.cos((t + s) / (1 + s) * math.pi / 2)) - log_alpha_0
        got = float(sch.marginal_log_mean_coeff(jnp.asarray(t)))
        np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_alpha_monotone_decreasing():
    for name in ["linear", "cosine", "discrete_poly"]:
        sch = NoiseScheduleVP(name)
        ts = jnp.linspace(0.01, sch.T, 50)
        alphas = np.asarray(sch.marginal_alpha(ts))
        assert np.all(np.diff(alphas) < 0), name
        assert alphas[0] > 0.95, name
        assert alphas[-1] < 0.2, name


def test_inverse_lambda_roundtrip():
    for name in ["linear", "cosine", "discrete_poly"]:
        sch = NoiseScheduleVP(name)
        ts = jnp.linspace(0.05, min(sch.T, 0.95), 20)
        lambs = sch.marginal_lambda(ts)
        ts_rt = sch.inverse_lambda(lambs)
        np.testing.assert_allclose(np.asarray(ts_rt), np.asarray(ts), rtol=1e-3, atol=1e-4)


def test_polynomial_schedule_properties():
    a2 = np.asarray(get_polynomial_schedule(1000, power=2))
    assert a2.shape == (1000,)
    assert np.all(np.diff(a2) <= 0)
    assert a2[0] > 0.99
    assert a2[-1] < 0.01
    assert np.all(a2 > 0)


def test_interpolate_fn_matches_numpy_interp_inside_range():
    xp = jnp.linspace(0.0, 1.0, 11)
    yp = jnp.sin(xp * 3.0)
    x = jnp.asarray([0.05, 0.333, 0.77, 0.999])
    got = np.asarray(interpolate_fn(x, xp, yp))
    want = np.interp(np.asarray(x), np.asarray(xp), np.asarray(yp))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_interpolate_fn_extrapolates_linearly():
    xp = jnp.asarray([0.0, 1.0, 2.0])
    yp = jnp.asarray([0.0, 1.0, 4.0])
    # below range: uses first segment slope 1; above: last segment slope 3
    got = np.asarray(interpolate_fn(jnp.asarray([-1.0, 3.0]), xp, yp))
    np.testing.assert_allclose(got, [-1.0, 7.0], rtol=1e-6)


def test_noise_level_log_snr():
    sch = NoiseScheduleVP("cosine")
    t = jnp.asarray(0.4)
    alpha, sigma = sch.marginal_prob(t)
    np.testing.assert_allclose(
        float(sch.get_noiseLevel(t)),
        math.log(float(alpha) ** 2 / float(sigma) ** 2),
        rtol=1e-5,
    )


def test_invalid_schedule_raises():
    with pytest.raises(ValueError):
        NoiseScheduleVP("nope")
