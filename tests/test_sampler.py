"""Sampler tests: scan loop correctness, decode quantisation, conditioning."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.sampling import AncestralSampler, make_time_steps
from diffspectra_tpu.sampling.decode import mol_process, post_process, quantize_edges
from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils.scalers import get_data_inverse_scaler, get_self_cond_fn


def test_quantize_edges_compress():
    # channels: [exist, order/3]
    h = jnp.asarray(
        [[[[0.9, 0.34], [0.2, 0.9]], [[0.6, 0.63], [0.95, 1.01]]]]
    )  # [1,2,2,2]
    q = np.asarray(quantize_edges(h, compress_edge=True))
    # (0.9, 0.34*3=1.02) -> exist, order 1 ; (0.2,...) -> no edge
    assert q[0, 0, 0] == 1.0
    assert q[0, 0, 1] == 0.0
    # 0.63*3=1.89 -> order 2 ; 1.01*3=3.03 -> order 3
    assert q[0, 1, 0] == 2.0
    assert q[0, 1, 1] == 3.0


def test_quantize_edges_aromatic_channel():
    h = jnp.zeros((1, 1, 1, 3)).at[0, 0, 0].set(jnp.asarray([0.9, 0.1, 0.8]))
    q = np.asarray(quantize_edges(h, compress_edge=True))
    assert q[0, 0, 0] == 4.0  # aromatic flag with zero order -> 4


def _cfg():
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 6
    cfg.sampling.steps = 8
    return cfg


def test_ancestral_sampler_end_to_end():
    cfg = _cfg()
    n = cfg.data.max_node
    bs = 3
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    key = jax.random.PRNGKey(0)

    n_nodes = jnp.asarray([4, 5, 6])
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    ctx = jnp.abs(jax.random.normal(key, (bs, 3501)))
    variables = model.init(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, 9)), node_mask, edge_mask, ctx,
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )

    from diffspectra_tpu.models.dmt import encode_context

    ctx_emb = encode_context(model, variables, ctx)
    assert ctx_emb.shape == (bs, cfg.model.nf * 4)

    def model_apply(t, x, nm, em, edge_x, nl, cond_x, cond_edge_x, has_cond, context_emb):
        return model.apply(
            variables, t, x, nm, em, None, edge_x=edge_x, noise_level=nl,
            cond_x=cond_x, cond_edge_x=cond_edge_x, has_cond=has_cond,
            context_emb=context_emb,
        )

    ts = make_time_steps(sch, cfg.sampling.steps)
    sampler = AncestralSampler(
        sch, ts, model_pred_data=True, pred_edge=True, self_cond=True,
        cond_process_fn=get_self_cond_fn(cfg),
    )
    k1, k2, k3 = jax.random.split(key, 3)
    z = M.sample_combined_position_feature_noise(k1, bs, n, 6, node_mask)
    edge_z = M.sample_symmetric_edge_feature_noise(k2, bs, n, 2, edge_mask)

    x, edge_x = jax.jit(sampler.sampling, static_argnums=0)(
        model_apply, k3, z, node_mask, edge_mask, edge_z, ctx_emb
    )
    assert x.shape == (bs, n, 9)
    assert edge_x.shape == (bs, n, n, 2)
    assert np.all(np.isfinite(np.asarray(x)))
    # CoM-free final positions (ref sampling.py:626)
    assert float(M.masked_mean_zero_error(x[:, :, :3], node_mask)) < 1e-3

    # decode
    inverse = get_data_inverse_scaler(cfg)
    pos, one_hot, fc, edge_types = post_process(
        x, cfg.data.atom_types, True, node_mask, inverse, edge_x, edge_mask,
        compress_edge=True,
    )
    mols = mol_process(one_hot, pos, fc, n_nodes, edge_types)
    assert len(mols) == bs
    p0, a0, e0, f0 = mols[0]
    assert p0.shape == (4, 3)
    assert a0.shape == (4,)
    assert e0.shape == (4, 4)
    assert set(np.unique(e0)).issubset({0.0, 1.0, 2.0, 3.0, 4.0})


def test_sampler_coefficients_match_reference_formulas():
    sch = NoiseScheduleVP("cosine")
    ts = make_time_steps(sch, 10)
    sampler = AncestralSampler(sch, ts, model_pred_data=True, pred_edge=True)
    # spot-check step 3 against the per-step formulas (ref sampling.py:571-580)
    i = 3
    t, s = float(ts[i]), float(ts[i + 1])
    at, st_ = (float(x) for x in sch.marginal_prob(jnp.asarray(t)))
    as_, ss = (float(x) for x in sch.marginal_prob(jnp.asarray(s)))
    atgs = at / as_
    s2tgs = st_**2 - atgs**2 * ss**2
    np.testing.assert_allclose(
        float(sampler.coef_x[i]), atgs * ss**2 / st_**2, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(sampler.coef_pred[i]), as_ * s2tgs / st_**2, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(sampler.coef_sigma[i]), np.sqrt(s2tgs) * ss / st_, rtol=1e-4
    )
