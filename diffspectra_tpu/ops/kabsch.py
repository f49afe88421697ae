"""Batched Kabsch rotation alignment, fully on-device inside jit.

JAX rewrite of ref losses.py:401-452. The reference runs a no-grad batched
cuSOLVER SVD on ``[B, 3, 3]``; here it is ``jnp.linalg.svd`` under
``stop_gradient`` — XLA lowers the tiny 3x3 SVDs to a fused batched kernel,
keeping the whole training step on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kabsch_batch(coords_pred: jnp.ndarray, coords_tar: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotations aligning ``coords_tar`` onto ``coords_pred``.

    ``coords_* [B, N, 3]`` -> rotations ``[B, 3, 3]`` (ref losses.py:441-452),
    with the usual det-sign correction for properness.
    """
    a = jnp.einsum("...ki,...kj->...ij", coords_pred, coords_tar)  # [B,3,3]
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    sign_det = jnp.sign(jnp.linalg.det(a))
    corr = jnp.ones(a.shape[:-2] + (3,)).at[..., -1].set(sign_det)
    rotation = jnp.einsum("...ij,...j,...jk->...ik", u, corr, vt)
    return jax.lax.stop_gradient(rotation)


def get_align_position(z_t: jnp.ndarray, xh: jnp.ndarray) -> jnp.ndarray:
    """Rotate the clean positions onto the noisy positions' frame
    (ref losses.py:414-422). Inputs carry positions in channels [:3]."""
    pos_t = z_t[..., :3]
    pos_0 = xh[..., :3]
    rot = kabsch_batch(pos_t, pos_0)
    # einsum("...ki,...ji->...jk", R, pos0) == pos0 @ R^T
    return jax.lax.stop_gradient(jnp.einsum("...ki,...ji->...jk", rot, pos_0))


def get_align_position_v2(pos_t_com: jnp.ndarray, pos_0_com: jnp.ndarray) -> jnp.ndarray:
    """Same, on already-CoM-removed positions (ref losses.py:424-429,
    DMT_WO_EQ path)."""
    rot = kabsch_batch(pos_t_com, pos_0_com)
    return jax.lax.stop_gradient(jnp.einsum("...ki,...ji->...jk", rot, pos_0_com))


def get_align_noise(z_t, xh, alpha_t, sigma_t, noise, node_mask):
    """Recompute position noise consistent with the rotation-aligned clean
    positions (ref losses.py:401-411; used when predicting noise)."""
    pos_t = z_t[..., :3]
    align_pos_0 = get_align_position(z_t, xh)
    a = alpha_t[:, None, None]
    s = sigma_t[:, None, None]
    noise_pos = (pos_t - a * align_pos_0) / s
    out = noise.at[..., :3].set(noise_pos)
    return jax.lax.stop_gradient(out)
