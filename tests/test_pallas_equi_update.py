"""Pallas fused equi-update kernel vs jnp twin vs the flax module
(interpret mode on CPU — Mosaic hardware validation is environment-blocked,
see PALLAS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.models.dmt import MultiCondEquiUpdate
from diffspectra_tpu.models.layers import CoorsNorm
from diffspectra_tpu.ops.pallas_equi_update import (
    equi_update_fused,
    equi_update_reference,
)
from diffspectra_tpu.utils import masks as M

B, N, DH, DE, DD, A = 4, 9, 32, 16, 16, 2


def _random_inputs(key, b=B):
    ks = jax.random.split(key, 12)
    node_i = jax.random.normal(ks[0], (b, N, DH))
    node_j = jax.random.normal(ks[1], (b, N, DH))
    edge = jax.random.normal(ks[2], (b, N, N, DE))
    dist = jnp.abs(jax.random.normal(ks[3], (b, N, N, DD)))
    normed = jax.random.normal(ks[4], (b, N, N, 3)) * 0.1
    adj = (jax.random.uniform(ks[5], (b, N, N, A)) > 0.5).astype(jnp.float32)
    _, edge_mask = M.build_masks(jax.random.randint(ks[6], (b,), 4, N + 1), N)
    w_e = jax.random.normal(ks[7], (DE, DH)) * 0.1
    w_d = jax.random.normal(ks[8], (DD, DH)) * 0.1
    bias = jax.random.normal(ks[9], (DH,)) * 0.1
    shift = jax.random.normal(ks[10], (b, DH)) * 0.1
    scale = jax.random.normal(ks[11], (b, DH)) * 0.1
    w0 = jax.random.normal(ks[0], (DH, DH)) * 0.1
    b0 = jax.random.normal(ks[1], (DH,)) * 0.1
    w1 = jax.random.normal(ks[2], (DH, 1 + A)) * 0.3
    return (node_i, node_j, edge, dist, normed, adj, edge_mask,
            w_e, w_d, bias, shift, scale, w0, b0, w1)


def test_kernel_matches_reference_twin():
    args = _random_inputs(jax.random.PRNGKey(0))
    want = equi_update_reference(*args)
    got = equi_update_fused(*args, batch_tile=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_indivisible_batch_tile_falls_back():
    args = _random_inputs(jax.random.PRNGKey(1), b=3)
    want = equi_update_reference(*args)
    got = equi_update_fused(*args, batch_tile=2, interpret=True)  # bb -> 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_time", [True, False])
def test_kernel_matches_flax_module(with_time):
    """End-to-end wiring contract: the module's jnp path output equals
    pos + equi_update_fused(...) on the module's own extracted params —
    exactly the dispatch MultiCondEquiUpdate(use_pallas=True) performs."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 8)
    time_dim = 24
    h = jax.random.normal(ks[0], (B, N, DH))
    pos = jax.random.normal(ks[1], (B, N, 3))
    edge_attr = jax.random.normal(ks[2], (B, N, N, DE))
    dist = jnp.abs(jax.random.normal(ks[3], (B, N, N, DD)))
    time_emb = (
        jax.random.normal(ks[4], (B, time_dim)) if with_time else None
    )
    adj = (jax.random.uniform(ks[5], (B, N, N, A)) > 0.5).astype(jnp.float32)
    _, edge_mask = M.build_masks(jax.random.randint(ks[6], (B,), 4, N + 1), N)

    mod = MultiCondEquiUpdate(DH, DE, DD, time_dim, A)
    variables = mod.init(ks[7], h, pos, edge_attr, dist, time_emb, adj, edge_mask)
    want = mod.apply(variables, h, pos, edge_attr, dist, time_emb, adj, edge_mask)

    p = variables["params"]
    kern = p["input_lin_kernel"]
    w_hi, w_hj = kern[:DH], kern[DH:2 * DH]
    w_e = kern[2 * DH:2 * DH + DE]
    w_d = kern[2 * DH + DE:]
    normed = CoorsNorm(scale_init=1e-2).apply(
        {"params": p["coord_norm"]}, pos[:, :, None, :] - pos[:, None, :, :]
    )
    if with_time:
        tm = p["time_mlp"]
        ss = jax.nn.silu(time_emb) @ tm["kernel"] + tm["bias"]
        shift, scale = jnp.split(ss, 2, axis=-1)
    else:
        shift = scale = jnp.zeros((B, DH))
    agg = equi_update_fused(
        h @ w_hi, h @ w_hj, edge_attr, dist, normed, adj, edge_mask,
        w_e, w_d, p["input_lin_bias"], shift, scale,
        p["coord_mlp_0"]["kernel"], p["coord_mlp_0"]["bias"],
        p["coord_mlp_1"]["kernel"], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pos + agg), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_masked_pairs_do_not_contribute():
    args = list(_random_inputs(jax.random.PRNGKey(3)))
    # zero the mask entirely: output must be exactly zero
    args[6] = jnp.zeros_like(args[6])
    got = equi_update_fused(*args, interpret=True)
    assert float(jnp.abs(got).max()) == 0.0
