"""Masked dense-graph tensor utilities.

TPU-native replacement for the reference's sparse/scatter helpers
(ref: models/utils.py:32-172). Every molecule graph lives in padded dense
tensors with static shapes:

- node features  ``[B, N, F]`` with ``node_mask [B, N, 1]`` (float 0/1)
- edge features  ``[B, N, N, C]`` with ``edge_mask [B, N, N]`` (float 0/1,
  diagonal excluded — matches the reference's diag-removed edge_mask built in
  datasets/build_dataset.py:193-196 and sampling.py:229-232)

All functions are pure and jit/vmap/shard_map friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_masks(n_nodes: jnp.ndarray, max_n: int):
    """Build node and edge masks from per-molecule atom counts.

    Args:
      n_nodes: ``[B]`` int array of true atom counts.
      max_n: static padded size N.

    Returns:
      node_mask ``[B, N, 1]`` float, edge_mask ``[B, N, N]`` float with the
      diagonal zeroed (ref: sampling.py:226-232).
    """
    ar = jnp.arange(max_n)
    node_mask = (ar[None, :] < n_nodes[:, None]).astype(jnp.float32)
    edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
    edge_mask = edge_mask * (1.0 - jnp.eye(max_n))[None]
    return node_mask[:, :, None], edge_mask


def remove_mean_with_mask(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract the masked mean over atoms (center of mass removal).

    ref: models/utils.py:38-45. ``x [B, N, 3]``, ``node_mask [B, N, 1]``.
    """
    n = jnp.sum(node_mask, axis=1, keepdims=True)
    mean = jnp.sum(x, axis=1, keepdims=True) / n
    return x - mean * node_mask


def masked_mean_zero_error(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Relative CoM error; used by tests instead of the reference's asserts
    (ref: models/utils.py:59-64)."""
    largest = jnp.max(jnp.abs(x))
    err = jnp.max(jnp.abs(jnp.sum(x, axis=1, keepdims=True)))
    return err / (largest + 1e-10)


def sample_gaussian_with_mask(key, shape, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Standard normal noise zeroed at padded atoms (ref: models/utils.py:77-80)."""
    x = jax.random.normal(key, shape)
    return x * node_mask


def sample_center_gravity_zero_gaussian_with_mask(key, shape, node_mask):
    """CoM-free Gaussian position noise (ref: models/utils.py:67-74).

    Valid because an isotropic Gaussian is rotation invariant and the mean
    projection keeps it Gaussian on the CoM-free subspace.
    """
    x = jax.random.normal(key, shape) * node_mask
    return remove_mean_with_mask(x, node_mask)


def sample_combined_position_feature_noise(key, bs, n_nodes, feat_nf, node_mask):
    """CoM-free noise for positions concat plain masked noise for features
    (ref: models/utils.py:90-97). Returns ``[B, N, 3 + feat_nf]``."""
    k1, k2 = jax.random.split(key)
    z_x = sample_center_gravity_zero_gaussian_with_mask(k1, (bs, n_nodes, 3), node_mask)
    z_h = sample_gaussian_with_mask(k2, (bs, n_nodes, feat_nf), node_mask)
    return jnp.concatenate([z_x, z_h], axis=2)


def sample_symmetric_edge_feature_noise(key, bs, n_nodes, edge_ch, edge_mask):
    """Symmetric normal noise for the dense edge tensor
    (ref: models/utils.py:100-106: tril(-1) + transpose, then edge-masked).

    ``edge_mask [B, N, N]``; returns ``[B, N, N, C]``.
    """
    z = jax.random.normal(key, (bs, n_nodes, n_nodes, edge_ch))
    tril = jnp.tril(jnp.ones((n_nodes, n_nodes)), -1)[None, :, :, None]
    z = z * tril
    z = z + jnp.swapaxes(z, 1, 2)
    return z * edge_mask[..., None]


def coord2dist_dense(pos: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances, dense form of ref models/utils.py:129-133.

    ``pos [B, N, 3]`` -> ``[B, N, N, 1]`` with ``d2[b,i,j] = ||x_i - x_j||^2``.
    """
    diff = pos[:, :, None, :] - pos[:, None, :, :]
    return jnp.sum(diff * diff, axis=-1, keepdims=True)


def coord2diff_adj_dense(pos: jnp.ndarray, edge_mask: jnp.ndarray, spatial_th: float = 2.0):
    """Squared distances + spatial adjacency (d2 <= th -> 1) on real edges.

    Dense form of ref models/utils.py:118-126. The reference computes this on
    the sparse real-edge set, so padded/diagonal pairs never appear; here we
    zero them via ``edge_mask``.
    """
    radial = coord2dist_dense(pos)
    adj = (radial[..., 0] <= spatial_th).astype(pos.dtype)
    adj = jax.lax.stop_gradient(adj * edge_mask)
    return radial, adj[..., None]


def symmetrize_edges(edge: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (E + E^T) over the two node axes (ref: models/dmt.py:399)."""
    return 0.5 * (edge + jnp.swapaxes(edge, 1, 2))


def get_rw_feat_dense(k_step: int, dense_adj: jnp.ndarray) -> jnp.ndarray:
    """k-step random-walk shortest-path-distance one-hot features.

    Dense rewrite of ref models/utils.py:147-172 (used by CDGS). ``dense_adj
    [B, N, N]`` -> spd one-hot ``[B, N, N, k_step+1]``. All matmuls — MXU
    friendly.
    """
    deg = jnp.sum(dense_adj, axis=-1, keepdims=True)
    ad = dense_adj / (deg + 1e-8)
    rws = [ad]
    for _ in range(k_step):
        rws.append(jnp.einsum("bij,bjk->bik", rws[-1], ad))
    rw_map = jnp.stack(rws[1:], axis=1)  # [B, k, N, N]
    spd_ind = jnp.sum(jnp.sort(rw_map, axis=1) <= 0, axis=1)  # [B, N, N]
    spd_onehot = jax.nn.one_hot(spd_ind, k_step + 1, dtype=jnp.float32)
    return jax.lax.stop_gradient(spd_onehot)
