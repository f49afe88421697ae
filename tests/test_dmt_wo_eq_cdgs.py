"""DMT_WO_EQ and CDGS model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.models.cdgs import CDGS
from diffspectra_tpu.models.dmt_wo_eq import DMT_WO_EQ
from diffspectra_tpu.utils import masks as M


def make_inputs(key, bs=2, n=5, n_nodes=(4, 5)):
    ks = jax.random.split(key, 4)
    node_mask, edge_mask = M.build_masks(jnp.asarray(n_nodes), n)
    xh = jax.random.normal(ks[0], (bs, n, 9)) * node_mask
    edge_x = M.sample_symmetric_edge_feature_noise(ks[1], bs, n, 2, edge_mask)
    ctx = jax.random.normal(ks[2], (bs, 3501))
    return dict(
        t=jnp.full((bs,), 0.5), xh=xh, node_mask=node_mask, edge_mask=edge_mask,
        edge_x=edge_x, noise_level=jnp.full((bs,), -1.0), context=ctx,
    )


@pytest.mark.parametrize("trans_ver", ["v1", "v2", "optim"])
def test_dmt_wo_eq_shapes_and_masking(trans_ver):
    model = DMT_WO_EQ(
        in_node_dim=6, hidden_dim=32, edge_hidden_dim=8, n_heads=4, n_layers=2,
        dropout=0.0, trans_ver=trans_ver, spectra_version="ir",
    )
    inp = make_inputs(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    variables = model.init(
        key, inp["t"], inp["xh"], inp["node_mask"], inp["edge_mask"],
        inp["context"], edge_x=inp["edge_x"], noise_level=inp["noise_level"],
    )
    pred, edge_pred = model.apply(
        variables, inp["t"], inp["xh"], inp["node_mask"], inp["edge_mask"],
        inp["context"], edge_x=inp["edge_x"], noise_level=inp["noise_level"],
    )
    assert pred.shape == (2, 5, 9)
    assert edge_pred.shape == (2, 5, 5, 2)
    np.testing.assert_allclose(
        np.asarray(pred * (1 - inp["node_mask"])), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(edge_pred), np.asarray(jnp.swapaxes(edge_pred, 1, 2)), atol=1e-5
    )
    # CoM-free predicted positions
    assert float(M.masked_mean_zero_error(pred[:, :, :3], inp["node_mask"])) < 1e-4


def test_dmt_wo_eq_not_equivariant_but_uses_positions():
    """Sanity: unlike DMT, rotating inputs changes features (no equivariance),
    and positions do affect the output (NodeEmbed pathway)."""
    model = DMT_WO_EQ(
        in_node_dim=6, hidden_dim=32, edge_hidden_dim=8, n_heads=4, n_layers=2,
        dropout=0.0, spectra_version="ir",
    )
    inp = make_inputs(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    variables = model.init(
        key, inp["t"], inp["xh"], inp["node_mask"], inp["edge_mask"],
        inp["context"], edge_x=inp["edge_x"], noise_level=inp["noise_level"],
    )

    def apply(xh):
        return model.apply(
            variables, inp["t"], xh, inp["node_mask"], inp["edge_mask"],
            inp["context"], edge_x=inp["edge_x"], noise_level=inp["noise_level"],
        )

    pred, _ = apply(inp["xh"])
    xh_shift = inp["xh"].at[:, :, :3].add(1.0 * inp["node_mask"])
    pred_shift, _ = apply(xh_shift)
    assert float(jnp.max(jnp.abs(pred - pred_shift))) > 1e-6


def test_cdgs_shapes_and_masking():
    model = CDGS(
        atom_ch=5, nf=32, n_layers=2, n_heads=4, dropout=0.0, rw_depth=4,
        spectra_version="ir",
    )
    bs, n = 2, 5
    key = jax.random.PRNGKey(4)
    node_mask, edge_mask = M.build_masks(jnp.asarray([4, 5]), n)
    xh = jax.random.normal(key, (bs, n, 6)) * node_mask  # atoms + fc, no pos
    edge_x = M.sample_symmetric_edge_feature_noise(key, bs, n, 2, edge_mask)
    ctx = jax.random.normal(key, (bs, 3501))
    variables = model.init(
        key, jnp.full((bs,), 0.5), xh, node_mask, edge_mask, ctx,
        edge_x=edge_x, noise_level=None,
    )
    atom_score, bond_score = model.apply(
        variables, jnp.full((bs,), 0.5), xh, node_mask, edge_mask, ctx,
        edge_x=edge_x, noise_level=None,
    )
    assert atom_score.shape == (bs, n, 5)
    assert bond_score.shape == (bs, n, n, 2)
    np.testing.assert_allclose(
        np.asarray(atom_score * (1 - node_mask)), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bond_score), np.asarray(jnp.swapaxes(bond_score, 1, 2)), atol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(atom_score)))


def test_dmt_wo_eq_encode_context_train_compatible():
    """encode_context_train (models/dmt.py) is written against the shared
    conditioning structure (cond_encoder SpecFormer + cond_lin Dense); it
    must produce the same output on DMT_WO_EQ as the in-graph context path
    so model.reuse_cond_emb works for the ablation family too."""
    from diffspectra_tpu.models.dmt import encode_context_train

    model = DMT_WO_EQ(
        in_node_dim=6, hidden_dim=32, edge_hidden_dim=8, n_heads=4, n_layers=2,
        dropout=0.0, spectra_version="ir",
    )
    inp = make_inputs(jax.random.PRNGKey(0))
    variables = model.init(
        jax.random.PRNGKey(1), inp["t"], inp["xh"], inp["node_mask"],
        inp["edge_mask"], inp["context"], edge_x=inp["edge_x"],
        noise_level=inp["noise_level"],
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    (out_a, edge_a), _ = model.apply(
        variables, inp["t"], inp["xh"], inp["node_mask"], inp["edge_mask"],
        inp["context"], edge_x=inp["edge_x"], noise_level=inp["noise_level"],
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    ctx_emb, enc_stats = encode_context_train(
        model, params, stats, inp["context"], jax.random.PRNGKey(3)
    )
    assert "cond_encoder" in enc_stats
    (out_b, edge_b), _ = model.apply(
        variables, inp["t"], inp["xh"], inp["node_mask"], inp["edge_mask"],
        None, edge_x=inp["edge_x"], noise_level=inp["noise_level"],
        context_emb=ctx_emb,
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(edge_a), np.asarray(edge_b), atol=1e-5)
