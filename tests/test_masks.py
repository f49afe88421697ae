"""Tests for dense masked-graph utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.utils import masks as M


def test_build_masks():
    node_mask, edge_mask = M.build_masks(jnp.asarray([2, 3]), 4)
    assert node_mask.shape == (2, 4, 1)
    assert edge_mask.shape == (2, 4, 4)
    np.testing.assert_array_equal(np.asarray(node_mask[0, :, 0]), [1, 1, 0, 0])
    # diagonal excluded
    assert float(jnp.sum(edge_mask[0])) == 2  # 2 atoms -> 2 off-diag pairs
    assert float(jnp.sum(edge_mask[1])) == 6
    assert float(edge_mask[1, 0, 0]) == 0.0


def test_remove_mean_with_mask():
    key = jax.random.PRNGKey(0)
    node_mask, _ = M.build_masks(jnp.asarray([3, 5]), 6)
    x = jax.random.normal(key, (2, 6, 3)) * node_mask
    out = M.remove_mean_with_mask(x, node_mask)
    # masked mean zero
    assert float(M.masked_mean_zero_error(out, node_mask)) < 1e-6
    # padded rows remain zero
    np.testing.assert_allclose(np.asarray(out * (1 - node_mask)), 0.0, atol=1e-7)


def test_com_free_noise():
    key = jax.random.PRNGKey(1)
    node_mask, _ = M.build_masks(jnp.asarray([4, 7, 2]), 8)
    z = M.sample_combined_position_feature_noise(key, 3, 8, 6, node_mask)
    assert z.shape == (3, 8, 9)
    assert float(M.masked_mean_zero_error(z[:, :, :3], node_mask)) < 1e-5
    np.testing.assert_allclose(np.asarray(z * (1 - node_mask)), 0.0, atol=1e-7)


def test_symmetric_edge_noise():
    key = jax.random.PRNGKey(2)
    node_mask, edge_mask = M.build_masks(jnp.asarray([5, 3]), 6)
    z = M.sample_symmetric_edge_feature_noise(key, 2, 6, 2, edge_mask)
    assert z.shape == (2, 6, 6, 2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(jnp.swapaxes(z, 1, 2)), atol=1e-7)
    # diagonal + padding zero
    np.testing.assert_allclose(np.asarray(z * (1 - edge_mask[..., None])), 0.0, atol=1e-7)
    # nonzero on real off-diag entries
    assert float(jnp.sum(jnp.abs(z[0, :5, :5]))) > 0


def test_coord2dist_dense():
    pos = jnp.asarray([[[0.0, 0, 0], [3.0, 4.0, 0], [0, 0, 1.0]]])
    d2 = M.coord2dist_dense(pos)
    np.testing.assert_allclose(float(d2[0, 0, 1, 0]), 25.0, rtol=1e-6)
    np.testing.assert_allclose(float(d2[0, 0, 2, 0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(d2[0, 1, 1, 0]), 0.0, atol=1e-7)


def test_coord2diff_adj_dense_threshold():
    pos = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [10.0, 0, 0]]])
    node_mask, edge_mask = M.build_masks(jnp.asarray([3]), 3)
    _, adj = M.coord2diff_adj_dense(pos, edge_mask, spatial_th=2.0)
    # d2(0,1)=1 <= 2 -> 1 ; d2(0,2)=100 > 2 -> 0 ; diag masked
    assert float(adj[0, 0, 1, 0]) == 1.0
    assert float(adj[0, 0, 2, 0]) == 0.0
    assert float(adj[0, 0, 0, 0]) == 0.0


def test_rw_feat_dense_matches_reference_formula():
    # reference formula (models/utils.py:147-172): normalized adjacency powers
    # AD^2..AD^(k+1); spd index = count of zero entries across the k powers
    rng = np.random.default_rng(0)
    adj_np = (rng.random((2, 5, 5)) > 0.6).astype(np.float32)
    adj_np = np.triu(adj_np, 1)
    adj_np = adj_np + np.swapaxes(adj_np, 1, 2)
    k_step = 3

    deg = adj_np.sum(-1, keepdims=True)
    ad = adj_np / (deg + 1e-8)
    powers = [ad]
    for _ in range(k_step):
        powers.append(np.einsum("bij,bjk->bik", powers[-1], ad))
    rw_map = np.stack(powers[1:], axis=1)
    want_ind = (np.sort(rw_map, axis=1) <= 0).sum(axis=1)

    spd = M.get_rw_feat_dense(k_step, jnp.asarray(adj_np))
    assert spd.shape == (2, 5, 5, k_step + 1)
    got_ind = np.argmax(np.asarray(spd), axis=-1)
    np.testing.assert_array_equal(got_ind, want_ind)
    # one-hot rows sum to 1
    np.testing.assert_allclose(np.asarray(spd).sum(-1), 1.0, atol=1e-6)
