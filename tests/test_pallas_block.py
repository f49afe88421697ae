"""Whole-pair-grid-block kernel parity (ops/pallas_block.py).

A full DMT forward with ``pallas_ops=('block',)`` switched in (interpret
mode) must match the XLA path on the same variables. This exercises the
entire fused chain — GBF, edge_emb, adaLN, mixed attention, node->edge,
both FFNs, and the equi-update — plus the export_for_block param plumbing
(every Dense/DenseParams declared under the XLA branch's names, so one
checkpoint serves both paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.utils import masks as M


def _setup(cfg):
    bs, n = 4, cfg.data.max_node
    key = jax.random.PRNGKey(0)
    n_nodes = jnp.asarray([5, 7, 6, 8])
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    xh_dim = 3 + cfg.data.atom_types + int(cfg.model.include_fc_charge)
    xh = jax.random.normal(key, (bs, n, xh_dim)) * node_mask
    edge_x = M.sample_symmetric_edge_feature_noise(
        key, bs, n, cfg.model.edge_ch, edge_mask
    )
    ctx = jnp.abs(jax.random.normal(key, (bs, 3501)))
    t = jnp.full((bs,), 0.5)
    nl = jnp.full((bs,), -1.0)
    return (t, xh, node_mask, edge_mask, ctx), dict(
        edge_x=edge_x, noise_level=nl
    )


def test_dmt_forward_block_kernel_matches_xla(monkeypatch):
    monkeypatch.setenv("DIFFSPECTRA_PALLAS_INTERPRET", "1")

    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 8

    args, kwargs = _setup(cfg)
    key = jax.random.PRNGKey(0)

    model_xla = DMT.from_config(cfg)
    variables = model_xla.init(key, *args, **kwargs)
    want_pos, want_edge = model_xla.apply(variables, *args, **kwargs)

    with cfg.unlocked():
        cfg.model.use_pallas = True
        cfg.model.pallas_ops = ("block",)
    model_pl = DMT.from_config(cfg)
    assert model_pl.use_pallas and model_pl.pallas_ops == ("block",)
    got_pos, got_edge = model_pl.apply(variables, *args, **kwargs)

    np.testing.assert_allclose(
        np.asarray(got_pos), np.asarray(want_pos), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_edge), np.asarray(want_edge), rtol=2e-4, atol=2e-4
    )


def test_block_kernel_param_tree_identical():
    """The fused branch must declare the exact XLA-branch param tree, so
    campaign checkpoints load into either path unchanged."""
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 8

    args, kwargs = _setup(cfg)
    key = jax.random.PRNGKey(0)
    v_xla = DMT.from_config(cfg).init(key, *args, **kwargs)

    import os

    os.environ["DIFFSPECTRA_PALLAS_INTERPRET"] = "1"
    try:
        with cfg.unlocked():
            cfg.model.use_pallas = True
            cfg.model.pallas_ops = ("block",)
        v_pl = DMT.from_config(cfg).init(key, *args, **kwargs)
    finally:
        os.environ.pop("DIFFSPECTRA_PALLAS_INTERPRET", None)

    flat_a = jax.tree_util.tree_map(lambda x: x.shape, v_xla)
    flat_b = jax.tree_util.tree_map(lambda x: x.shape, v_pl)
    assert jax.tree_util.tree_structure(flat_a) == jax.tree_util.tree_structure(
        flat_b
    )
    assert flat_a == flat_b
