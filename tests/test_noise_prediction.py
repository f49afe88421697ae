"""Noise-prediction (pred_data=False) paths: loss with aligned noise, and
sampler posterior coefficients (ref losses.py:370-381, sampling.py:607-609)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.sampling import AncestralSampler, make_time_steps
from diffspectra_tpu.training.losses import get_sde_graph_loss_fn
from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils.scalers import get_data_scaler


def _cfg():
    cfg = smoke.get_config()
    cfg.model.pred_data = False
    cfg.model.self_cond = False  # self-cond requires pred_data (ref losses.py:342)
    cfg.model.noise_align = True
    cfg.data.max_node = 4
    return cfg


def test_noise_prediction_loss_perfect_is_zero():
    """A model that predicts the exact (aligned) noise gives zero loss."""
    cfg = _cfg()
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)
    loss_fn = get_sde_graph_loss_fn(sch, scaler, cfg)

    bs, n = 2, 4
    key = jax.random.PRNGKey(0)
    node_mask, edge_mask = M.build_masks(jnp.asarray([3, 4]), n)
    batch = dict(
        positions=jax.random.normal(key, (bs, n, 3)) * node_mask,
        atom_mask=node_mask[..., 0],
        edge_mask=edge_mask,
        atom_one_hot=jax.nn.one_hot(jnp.zeros((bs, n), jnp.int32), 5) * node_mask,
        edge_one_hot=jnp.zeros((bs, n, n, 2)),
        formal_charges=jnp.zeros((bs, n, 1)),
    )

    # oracle: replicate the loss's forward perturbation with the same rng
    # stream and return the aligned noise exactly
    from diffspectra_tpu.ops.kabsch import get_align_noise
    from diffspectra_tpu.training.losses import T_EPS, process_edge_batch

    def oracle_apply(rng_model, stats, t, z_t, nm, em, context, **kw):
        xh, edge_x, nm2, em2, _ = process_edge_batch(batch, scaler, "DMT", True)
        alpha_t, sigma_t = sch.marginal_prob(t)
        a = alpha_t[:, None, None]
        s = sigma_t[:, None, None]
        noise = (z_t - a * xh) / s * nm2  # invert the perturbation
        edge_noise = jnp.where(
            em2[..., None] > 0, (kw["edge_x"] - a[..., None] * edge_x) / s[..., None], 0.0
        )
        aligned = get_align_noise(z_t, xh, alpha_t, sigma_t, noise, nm2)
        return (aligned, edge_noise), stats

    loss, _ = loss_fn(oracle_apply, {}, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_noise_prediction_sampler_coefficients():
    """x_mean = x / a_tgs - (s2_tgs / a_tgs / sigma_t) * eps_pred
    (ref sampling.py:607-609)."""
    sch = NoiseScheduleVP("cosine")
    ts = make_time_steps(sch, 10)
    sampler = AncestralSampler(sch, ts, model_pred_data=False, pred_edge=True)
    i = 4
    t, s = float(ts[i]), float(ts[i + 1])
    at, st_ = (float(x) for x in sch.marginal_prob(jnp.asarray(t)))
    as_, ss = (float(x) for x in sch.marginal_prob(jnp.asarray(s)))
    atgs = at / as_
    s2tgs = st_**2 - atgs**2 * ss**2
    np.testing.assert_allclose(float(sampler.coef_x[i]), 1.0 / atgs, rtol=1e-4)
    np.testing.assert_allclose(
        float(sampler.coef_pred[i]), -s2tgs / atgs / st_, rtol=1e-4
    )


def test_noise_prediction_sampler_runs():
    """Sampling with a trivial noise-prediction model stays finite and
    CoM-free."""
    cfg = _cfg()
    sch = NoiseScheduleVP(cfg.sde.schedule)
    ts = make_time_steps(sch, 6)
    sampler = AncestralSampler(sch, ts, model_pred_data=False, pred_edge=True)

    bs, n = 2, 4
    key = jax.random.PRNGKey(1)
    node_mask, edge_mask = M.build_masks(jnp.asarray([3, 4]), n)

    def model_apply(t, x, nm, em, edge_x, nl, cx, cex, hc, ce):
        # "predict" zero noise everywhere
        return jnp.zeros_like(x), jnp.zeros_like(edge_x)

    z = M.sample_combined_position_feature_noise(key, bs, n, 6, node_mask)
    ez = M.sample_symmetric_edge_feature_noise(key, bs, n, 2, edge_mask)
    x, e = sampler.sampling(model_apply, key, z, node_mask, edge_mask, ez, None)
    assert np.all(np.isfinite(np.asarray(x)))
    assert float(M.masked_mean_zero_error(x[:, :, :3], node_mask)) < 1e-3
