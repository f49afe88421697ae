"""Golden-value tests of the diffusion loss formulas: a deterministic mock
model lets us hand-compute the exact expected loss (weights 1/0.25/0.1,
sum-over-atoms/mean-over-channels reductions, sqrt(alpha/sigma) SNR factor
— ref losses.py:359-394)."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.training.losses import get_sde_graph_loss_fn, process_edge_batch
from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils.scalers import get_data_scaler


def _cfg():
    cfg = smoke.get_config()
    cfg.model.self_cond = False
    cfg.model.noise_align = False  # disable Kabsch so targets are closed-form
    cfg.data.max_node = 4
    return cfg


def test_graph_loss_formula_zero_prediction():
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

    # mock model: always predicts zeros
    def apply_fn(rng, stats, t, z_t, nm, em, context, **kw):
        return (jnp.zeros_like(z_t), jnp.zeros_like(kw["edge_x"])), stats

    rng = jax.random.PRNGKey(7)
    loss, _ = loss_fn(apply_fn, {}, batch, rng)

    # hand computation with the identical rng stream
    xh, edge_x, nm, em, _ = process_edge_batch(batch, scaler, "DMT", True)
    r, k_t, k_noise, k_edge, k_sc = jax.random.split(rng, 5)
    t = jax.random.uniform(k_t, (bs,)) * (1 - 1e-5) + 1e-5
    alpha, sigma = sch.marginal_prob(t)

    # pred == 0 => pos loss = sum_i mean_c align_pos^2 (align = xh pos,
    # noise_align disabled), atom loss = sum_i mean_c xh_feat^2,
    # edge loss = sum_ij mean_c edge_x^2
    losses_pos = jnp.sum(jnp.mean(xh[:, :, :3] ** 2, -1), -1)
    losses_atom = jnp.sum(jnp.mean(xh[:, :, 3:] ** 2, -1), -1)
    losses_edge = jnp.sum(jnp.mean(edge_x**2, -1).reshape(bs, -1), -1)
    want = jnp.mean(
        jnp.sqrt(alpha / sigma)
        * (1.0 * losses_pos + 0.25 * losses_atom + 0.1 * losses_edge)
    )
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_graph_loss_perfect_prediction_is_zero():
    """A model that predicts the exact clean data gives zero loss."""
    cfg = _cfg()
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)
    loss_fn = get_sde_graph_loss_fn(sch, scaler, cfg)

    bs, n = 2, 4
    key = jax.random.PRNGKey(1)
    node_mask, edge_mask = M.build_masks(jnp.asarray([3, 4]), n)
    batch = dict(
        positions=jax.random.normal(key, (bs, n, 3)) * node_mask,
        atom_mask=node_mask[..., 0],
        edge_mask=edge_mask,
        atom_one_hot=jax.nn.one_hot(jnp.zeros((bs, n), jnp.int32), 5) * node_mask,
        edge_one_hot=(jnp.abs(jax.random.normal(key, (bs, n, n, 2))) > 1).astype(jnp.float32)
        * edge_mask[..., None],
        formal_charges=jnp.zeros((bs, n, 1)),
    )
    xh, edge_x, nm, em, _ = process_edge_batch(batch, scaler, "DMT", True)

    def apply_fn(rng, stats, t, z_t, nm_, em_, context, **kw):
        return (xh, edge_x), stats

    loss, _ = loss_fn(apply_fn, {}, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_reduce_mean_divides_by_atom_count():
    cfg = _cfg()
    cfg.model.loss_weights = "1., 0., 0."  # isolate the position term
    cfg.training.reduce_mean = True
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)
    loss_fn_mean = get_sde_graph_loss_fn(sch, scaler, cfg)
    cfg2 = _cfg()
    cfg2.model.loss_weights = "1., 0., 0."
    cfg2.training.reduce_mean = False
    loss_fn_sum = get_sde_graph_loss_fn(sch, scaler, cfg2)

    bs, n = 1, 4
    key = jax.random.PRNGKey(3)
    node_mask, edge_mask = M.build_masks(jnp.asarray([4]), n)
    batch = dict(
        positions=jax.random.normal(key, (bs, n, 3)) * node_mask,
        atom_mask=node_mask[..., 0],
        edge_mask=edge_mask,
        atom_one_hot=jax.nn.one_hot(jnp.zeros((bs, n), jnp.int32), 5) * node_mask,
        edge_one_hot=jnp.zeros((bs, n, n, 2)),
        formal_charges=jnp.zeros((bs, n, 1)),
    )

    def zero_apply(rng, stats, t, z_t, nm_, em_, context, **kw):
        return (jnp.zeros_like(z_t), jnp.zeros_like(kw["edge_x"])), stats

    lm, _ = loss_fn_mean(zero_apply, {}, batch, jax.random.PRNGKey(4))
    ls, _ = loss_fn_sum(zero_apply, {}, batch, jax.random.PRNGKey(4))
    # position-only loss: reduce_mean divides by the 4 real atoms
    np.testing.assert_allclose(float(ls) / float(lm), 4.0, rtol=1e-5)
