"""Pallas fused mix-attention kernel vs jnp reference (interpret mode on
CPU; on TPU the compiled kernel is exercised by the model when enabled)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.ops.pallas_attention import (
    mix_attention,
    mix_attention_reference,
)
from diffspectra_tpu.utils import masks as M


def _inputs(key, B=4, N=8, n_heads=8, n_extra=2, out_ch=8, de=16):
    n_sub = n_heads - n_extra
    sub_c = (n_heads * out_ch) // n_sub
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, N, n_sub, sub_c))
    k = jax.random.normal(ks[1], (B, N, n_sub, sub_c))
    v = jax.random.normal(ks[2], (B, N, n_heads, out_ch))
    edge = jax.random.normal(ks[3], (B, N, N, de))
    w0 = jax.random.normal(ks[4], (de, n_sub * sub_c)) * 0.1
    w1 = jax.random.normal(ks[5], (de, n_heads * out_ch)) * 0.1
    extra = (jax.random.uniform(ks[6], (B, N, N, n_extra)) > 0.5).astype(jnp.float32)
    node_mask, edge_mask = M.build_masks(
        jax.random.randint(ks[7], (B,), 3, N + 1), N
    )
    return q, k, v, edge, w0, w1, extra, edge_mask


@pytest.mark.parametrize("set_inf", [True, False])
def test_pallas_kernel_matches_reference(set_inf):
    args = _inputs(jax.random.PRNGKey(0))
    ref = mix_attention_reference(*args, set_inf=set_inf)
    got = mix_attention(*args, set_inf=set_inf, batch_tile=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_kernel_odd_batch_tile():
    args = _inputs(jax.random.PRNGKey(1), B=6)
    ref = mix_attention_reference(*args)
    got = mix_attention(*args, batch_tile=4, interpret=True)  # falls to tile 3
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_reference_matches_dense_layer_math():
    """The kernel's jnp reference must agree with DenseTransMixLayer."""
    import flax.linen as nn

    from diffspectra_tpu.models.layers import DenseTransMixLayer

    key = jax.random.PRNGKey(2)
    B, N, D, De = 3, 6, 32, 8
    n_heads, n_extra = 4, 2
    out_ch = D // n_heads
    n_sub = n_heads - n_extra
    sub_c = (n_heads * out_ch) // n_sub

    layer = DenseTransMixLayer(
        D, out_ch, extra_heads=n_extra, heads=n_heads, dropout=0.0, set_inf=True
    )
    x = jax.random.normal(key, (B, N, D))
    edge = jax.random.normal(key, (B, N, N, De))
    extra = (jax.random.uniform(key, (B, N, N, n_extra)) > 0.5).astype(jnp.float32)
    _, edge_mask = M.build_masks(jnp.asarray([4, 5, 6]), N)
    variables = layer.init(key, x, edge, extra, edge_mask)
    want = layer.apply(variables, x, edge, extra, edge_mask)

    p = variables["params"]
    q = (x @ p["lin_query"]["kernel"] + p["lin_query"]["bias"]).reshape(B, N, n_sub, sub_c)
    k = (x @ p["lin_key"]["kernel"] + p["lin_key"]["bias"]).reshape(B, N, n_sub, sub_c)
    v = (x @ p["lin_value"]["kernel"] + p["lin_value"]["bias"]).reshape(B, N, n_heads, out_ch)
    got = mix_attention_reference(
        q, k, v, edge, p["lin_edge0_kernel"], p["lin_edge1_kernel"],
        extra, edge_mask, set_inf=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
