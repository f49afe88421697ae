"""DPM-Solver++(2M): exactness on a constant-x0 oracle, mask/CoM
preservation, and harness integration via config.sampling.method."""

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.sampling import DPMSolverPP, make_time_steps
from diffspectra_tpu.utils import masks as M


def _setup(bs=2, n=5, feat=6, edge_ch=2, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    node_mask, edge_mask = M.build_masks(jnp.asarray([4, 5]), n)
    z = M.sample_combined_position_feature_noise(ks[0], bs, n, feat, node_mask)
    edge_z = M.sample_symmetric_edge_feature_noise(ks[1], bs, n, edge_ch, edge_mask)
    x0 = M.sample_combined_position_feature_noise(ks[2], bs, n, feat, node_mask)
    edge_x0 = M.sample_symmetric_edge_feature_noise(
        jax.random.PRNGKey(7), bs, n, edge_ch, edge_mask
    )
    return node_mask, edge_mask, z, edge_z, x0, edge_x0


def test_constant_oracle_recovered_exactly():
    """With a model that always predicts a fixed x0, the exponential
    integrator is EXACT: the sampler must return that x0 regardless of the
    number of steps (the update coefficients solve the ODE in closed form
    for constant data prediction)."""
    sch = NoiseScheduleVP("cosine")
    node_mask, edge_mask, z, edge_z, x0, edge_x0 = _setup()

    def oracle(t, x, nm, em, edge_x, nl, cx, cex, hc, ce):
        return x0, edge_x0

    for steps in (5, 20):
        sampler = DPMSolverPP(
            sch, make_time_steps(sch, steps), model_pred_data=True,
            pred_edge=True, self_cond=False,
        )
        out_x, out_e = sampler.sampling(
            oracle, jax.random.PRNGKey(0), z, node_mask, edge_mask, edge_z
        )
        np.testing.assert_allclose(np.asarray(out_x), np.asarray(x0), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_e), np.asarray(edge_x0), atol=2e-4)


def test_noise_prediction_oracle():
    """eps-prediction oracle: eps-hat = (x - alpha x0)/sigma gives the same
    x0 path through the conversion branch."""
    sch = NoiseScheduleVP("cosine")
    node_mask, edge_mask, z, edge_z, x0, edge_x0 = _setup()
    sampler = DPMSolverPP(
        sch, make_time_steps(sch, 10), model_pred_data=False,
        pred_edge=True, self_cond=False,
    )
    lam = {"i": 0}

    def eps_oracle(t, x, nm, em, edge_x, nl, cx, cex, hc, ce):
        alpha, sigma = sch.marginal_prob(t[0])
        return (x - alpha * x0) / sigma, (edge_x - alpha * edge_x0) / sigma

    out_x, out_e = sampler.sampling(
        eps_oracle, jax.random.PRNGKey(0), z, node_mask, edge_mask, edge_z
    )
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(x0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(edge_x0), atol=2e-3)


def test_masks_and_com_preserved():
    sch = NoiseScheduleVP("cosine")
    node_mask, edge_mask, z, edge_z, x0, edge_x0 = _setup()

    def oracle(t, x, nm, em, edge_x, nl, cx, cex, hc, ce):
        return x0, edge_x0

    sampler = DPMSolverPP(
        sch, make_time_steps(sch, 8), model_pred_data=True,
        pred_edge=True, self_cond=True,
    )
    out_x, out_e = sampler.sampling(
        oracle, jax.random.PRNGKey(0), z, node_mask, edge_mask, edge_z
    )
    # padded atoms stay zero
    np.testing.assert_allclose(
        np.asarray(out_x * (1 - node_mask)), 0.0, atol=1e-6
    )
    # positions CoM-free over real atoms
    com = jnp.sum(out_x[..., :3] * node_mask, axis=1) / jnp.sum(node_mask, axis=1)
    np.testing.assert_allclose(np.asarray(com), 0.0, atol=1e-4)
    # edges symmetric
    np.testing.assert_allclose(
        np.asarray(out_e), np.asarray(jnp.swapaxes(out_e, 1, 2)), atol=1e-6
    )


def test_harness_dpm_method(tmp_path):
    """make_cond_sampling_fn with sampling.method='dpm_solver' produces
    decodable molecules end-to-end."""
    from diffspectra_tpu import run_lib
    from diffspectra_tpu.data import get_dataset, get_batch_iterator
    from diffspectra_tpu.sampling.harness import make_cond_sampling_fn
    from diffspectra_tpu.utils.scalers import get_data_inverse_scaler

    cfg = smoke.get_config()
    cfg.sampling.method = "dpm_solver"
    cfg.sampling.steps = 10
    cfg.eval.num_samples = 8
    cfg = run_lib.resolve_runtime_config(cfg, 1)
    _, _, _, test_ds, _ = get_dataset(cfg)
    it = get_batch_iterator(test_ds, 8, "ir", shuffle=False, drop_last=False)
    rng = jax.random.PRNGKey(0)
    model, tx, state = run_lib._init_model_and_state(cfg, next(it), rng)
    from diffspectra_tpu.diffusion import NoiseScheduleVP as NSV

    fn = make_cond_sampling_fn(
        cfg, model, NSV(cfg.sde.schedule), 8, 8,
        get_data_inverse_scaler(cfg), test_ds, fixed_seed=42,
    )
    mols, gt_pos, gt_mols = fn(run_lib._ema_variables(jax.device_get(state)),
                               jax.random.PRNGKey(1))
    assert len(mols) == 8
    pos, atom_types, edge_types, fc = mols[0]
    assert np.all(np.isfinite(pos))
