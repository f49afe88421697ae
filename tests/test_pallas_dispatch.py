"""End-to-end use_pallas dispatch parity: a full DMT forward with BOTH
fused kernels switched in (interpret mode via DIFFSPECTRA_PALLAS_INTERPRET)
must match the XLA path on the same variables.

This covers the wiring the op-level tests can't: param sharing between
nn.Dense/DenseParams and the kernels, the attention layer's head expansion,
and the equi-update's caller-side split (node projections / time modulation
/ CoorsNorm outside, pair chain inside)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.utils import masks as M


def test_dmt_forward_use_pallas_matches_xla(monkeypatch):
    monkeypatch.setenv("DIFFSPECTRA_PALLAS_INTERPRET", "1")

    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 8

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
    args = (t, xh, node_mask, edge_mask, ctx)
    kwargs = dict(edge_x=edge_x, noise_level=nl)

    model_xla = DMT.from_config(cfg)
    assert not model_xla.use_pallas
    variables = model_xla.init(key, *args, **kwargs)
    want_pos, want_edge = model_xla.apply(variables, *args, **kwargs)

    with cfg.unlocked():
        cfg.model.use_pallas = True
    model_pl = DMT.from_config(cfg)
    assert model_pl.use_pallas
    got_pos, got_edge = model_pl.apply(variables, *args, **kwargs)

    np.testing.assert_allclose(
        np.asarray(got_pos), np.asarray(want_pos), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_edge), np.asarray(want_edge), rtol=2e-4, atol=2e-4
    )
    # different math paths must actually have run (not trivially identical)
    assert os.environ["DIFFSPECTRA_PALLAS_INTERPRET"] == "1"
