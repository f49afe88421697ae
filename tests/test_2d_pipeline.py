"""2D-only pipeline: CDGS + 2D loss + 2D sampler end-to-end on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke_2d
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.models.cdgs import CDGS
from diffspectra_tpu.sampling import AncestralSampler, make_time_steps
from diffspectra_tpu.sampling.decode import mol_process, post_process
from diffspectra_tpu.training.losses import get_sde_2d_loss_fn
from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils.scalers import get_data_inverse_scaler, get_data_scaler


def _cfg():
    cfg = smoke_2d.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 6
    cfg.sampling.steps = 6
    return cfg


def _batch(cfg, key, bs=3):
    n = cfg.data.max_node
    ks = jax.random.split(key, 4)
    n_nodes = jnp.asarray([4, 5, 6])
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    atom = jax.nn.one_hot(jax.random.randint(ks[0], (bs, n), 0, 5), 5) * node_mask
    edge = (jnp.abs(M.sample_symmetric_edge_feature_noise(ks[1], bs, n, 2, edge_mask)) > 0.8).astype(jnp.float32)
    return dict(
        atom_mask=node_mask[..., 0],
        edge_mask=edge_mask,
        atom_one_hot=atom,
        edge_one_hot=edge,
        formal_charges=jnp.zeros((bs, n, 1)),
        context=jnp.abs(jax.random.normal(ks[2], (bs, 3501))),
    ), n_nodes


def test_2d_loss_and_sampling():
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    batch, n_nodes = _batch(cfg, key)
    n = cfg.data.max_node
    bs = 3

    model = CDGS.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)
    node_mask = batch["atom_mask"][..., None]
    variables = model.init(
        key, jnp.full((bs,), 0.5), jnp.zeros((bs, n, 5)), node_mask,
        batch["edge_mask"], batch["context"],
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=None,
    )

    loss_fn = get_sde_2d_loss_fn(sch, scaler, cfg)

    def apply_fn(rng, stats, *args, **kwargs):
        out = model.apply(variables, *args, deterministic=True, **kwargs)
        return out, stats

    loss, _ = jax.jit(
        lambda b, r: loss_fn(apply_fn, {}, b, r)
    )(batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # 2D sampling (noise prediction, no positions)
    ts = make_time_steps(sch, cfg.sampling.steps)
    sampler = AncestralSampler(
        sch, ts, model_pred_data=False, pred_edge=True, self_cond=False,
        only_2d=True,
    )

    def model_apply(t, x, nm, em, edge_x, nl, cond_x, cond_edge_x, has_cond, ce):
        return model.apply(
            variables, t, x, nm, em, batch["context"], edge_x=edge_x,
            noise_level=nl,
        )

    k1, k2, k3 = jax.random.split(key, 3)
    z = M.sample_gaussian_with_mask(k1, (bs, n, 5), node_mask)
    edge_z = M.sample_symmetric_edge_feature_noise(k2, bs, n, 2, batch["edge_mask"])
    x, edge_x = sampler.sampling(
        model_apply, k3, z, node_mask, batch["edge_mask"], edge_z, None
    )
    assert x.shape == (bs, n, 5)
    assert np.all(np.isfinite(np.asarray(x)))

    inverse = get_data_inverse_scaler(cfg)
    pos, one_hot, fc, edge_types = post_process(
        x, cfg.data.atom_types, False, node_mask, inverse, edge_x,
        batch["edge_mask"], compress_edge=True, has_positions=False,
    )
    assert pos is None
    mols = mol_process(one_hot, None, fc, n_nodes, edge_types)
    assert len(mols) == bs
    assert mols[0][0] is None  # no positions
    assert mols[0][2].shape == (4, 4)
