"""DPM-Solver++(2M): exactness on a constant-x0 oracle, mask/CoM
preservation, and harness integration via config.sampling.method."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_sde_coefficient_identities():
    """SDE-DPM-Solver++ per-step exactness: with a perfect point-mass
    denoiser the marginals stay N(alpha_i x0, sigma_i^2 I), i.e.
    c_x * alpha_{i-1} + c_d = alpha_i and c_x^2 sigma_{i-1}^2 + c_n^2 =
    sigma_i^2 for every transition."""
    sch = NoiseScheduleVP("cosine")
    for steps in (8, 100):
        s = DPMSolverPP(
            sch, make_time_steps(sch, steps), model_pred_data=True,
            pred_edge=True, stochastic=True,
        )
        a, sg = s.alpha, s.sigma
        np.testing.assert_allclose(
            np.asarray(s.c_x * a[:-1] + s.c_d), np.asarray(a[1:]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s.c_x**2 * sg[:-1] ** 2 + s.c_n**2),
            np.asarray(sg[1:] ** 2),
            rtol=1e-5,
        )


def test_sde_constant_oracle_and_invariants():
    """The final denoise call returns the oracle x0 exactly; injected noise
    must respect masks, CoM-freeness, and edge symmetry along the way."""
    sch = NoiseScheduleVP("cosine")
    node_mask, edge_mask, z, edge_z, x0, edge_x0 = _setup()

    def oracle(t, x, nm, em, edge_x, nl, cx, cex, hc, ce):
        return x0, edge_x0

    sampler = DPMSolverPP(
        sch, make_time_steps(sch, 12), model_pred_data=True,
        pred_edge=True, self_cond=True, stochastic=True,
    )
    out_x, out_e = sampler.sampling(
        oracle, jax.random.PRNGKey(3), z, node_mask, edge_mask, edge_z
    )
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(x0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(edge_x0), atol=2e-4)

    # invariants on the PRE-final state: rerun without the constant oracle
    # (identity-ish denoiser keeps trajectories noisy) and check masking
    def noisy_oracle(t, x, nm, em, edge_x, nl, cx, cex, hc, ce):
        return x * 0.9, edge_x * 0.9

    out_x, out_e = sampler.sampling(
        noisy_oracle, jax.random.PRNGKey(4), z, node_mask, edge_mask, edge_z
    )
    np.testing.assert_allclose(
        np.asarray(out_x * (1 - node_mask)), 0.0, atol=1e-6
    )
    com = jnp.sum(out_x[..., :3] * node_mask, axis=1) / jnp.sum(node_mask, axis=1)
    np.testing.assert_allclose(np.asarray(com), 0.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_e), np.asarray(jnp.swapaxes(out_e, 1, 2)), atol=1e-6
    )


def test_sde_marginal_statistics():
    """Composing the SDE coefficient arrays with a constant (point-mass) x0
    must keep the marginals at N(alpha_i x0, sigma_i^2): starting from
    x ~ N(alpha_T x0, sigma_T^2) and applying every transition with fresh
    noise lands on N(alpha_eps x0, sigma_eps^2) over a large batch (the
    identities test covers each step; this checks they compose)."""
    sch = NoiseScheduleVP("cosine")
    bs, n, feat = 512, 4, 3
    node_mask, _ = M.build_masks(jnp.full((bs,), n), n)
    sampler = DPMSolverPP(
        sch, make_time_steps(sch, 64), model_pred_data=True,
        pred_edge=False, stochastic=True, only_2d=True,
    )
    x0 = jnp.ones((bs, n, feat)) * node_mask * 0.5
    rng = jax.random.PRNGKey(1)
    rng, k = jax.random.split(rng)
    x = sampler.alpha[0] * x0 + sampler.sigma[0] * M.sample_gaussian_with_mask(
        k, x0.shape, node_mask
    )
    for i in range(sampler.c_x.shape[0]):
        rng, k = jax.random.split(rng)
        noise = M.sample_gaussian_with_mask(k, x.shape, node_mask)
        # constant oracle => D = x0 for every step regardless of 2M blending
        x = sampler.c_x[i] * x + sampler.c_d[i] * x0 + sampler.c_n[i] * noise
    a_eps, s_eps = sampler.alpha[-1], sampler.sigma[-1]
    resid = (x - a_eps * x0)[node_mask[..., 0] > 0]
    assert float(jnp.abs(jnp.mean(resid))) < 0.02
    np.testing.assert_allclose(float(jnp.std(resid)), float(s_eps), rtol=0.1)


def test_harness_dpm_sde_method():
    """make_cond_sampling_fn with sampling.method='dpm_solver_sde' produces
    decodable molecules end-to-end."""
    from diffspectra_tpu import run_lib
    from diffspectra_tpu.data import get_dataset, get_batch_iterator
    from diffspectra_tpu.sampling.harness import make_cond_sampling_fn
    from diffspectra_tpu.utils.scalers import get_data_inverse_scaler

    cfg = smoke.get_config()
    cfg.sampling.method = "dpm_solver_sde"
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


@pytest.mark.slow
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
