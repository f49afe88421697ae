"""Scaler round-trip and golden tests (ref: utils.py:33-150)."""

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils import scalers as S


def _config(centered=True, factors="1, 4, 4, 1", self_cond_type="clamp"):
    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict()
    c.model.normalize_factors = factors
    c.model.self_cond_type = self_cond_type
    c.model.include_fc_charge = True
    c.data = ml_collections.ConfigDict()
    c.data.centered = centered
    c.data.atom_types = 5
    c.data.fc_scale = [-1.0, 1.0]
    return c


def test_parse_factors():
    assert S.parse_normalize_factors("1, 4, 4, 1") == (1.0, 4.0, 4.0, 1.0)
    assert S.parse_normalize_factors([1, 4, 4]) == (1.0, 4.0, 4.0, 1.0)


def test_scaler_golden_values():
    cfg = _config()
    scale = S.get_data_scaler(cfg)
    node_mask, edge_mask = M.build_masks(jnp.asarray([2]), 3)
    pos = jnp.ones((1, 3, 3)) * node_mask
    atom = jnp.zeros((1, 3, 5)).at[0, 0, 1].set(1.0).at[0, 1, 0].set(1.0) * node_mask
    fc = jnp.zeros((1, 3, 1))
    edge = jnp.ones((1, 3, 3, 2)) * edge_mask[..., None]
    p, a, f, e = scale(pos, atom, fc, node_mask, edge, edge_mask)
    # one-hot 1 -> (1*2-1)/4 = 0.25 ; one-hot 0 -> -0.25 (masked rows -> 0)
    np.testing.assert_allclose(float(a[0, 0, 1]), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(a[0, 0, 0]), -0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a[0, 2]), 0.0, atol=1e-7)
    # edges: 1 -> (2-1)/1 = 1 at real pairs; masked pairs (incl diag) -> -1*0 = 0
    np.testing.assert_allclose(float(e[0, 0, 1, 0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(e[0, 0, 0, 0]), 0.0, atol=1e-7)
    # fc 0 centered is NOT applied to fc (only atom types): 0/4 = 0
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p[0, 0]), 1.0, rtol=1e-6)


def test_scaler_inverse_roundtrip():
    cfg = _config()
    scale = S.get_data_scaler(cfg)
    inverse = S.get_data_inverse_scaler(cfg)
    key = jax.random.PRNGKey(0)
    node_mask, edge_mask = M.build_masks(jnp.asarray([3, 5]), 6)
    pos = jax.random.normal(key, (2, 6, 3)) * node_mask
    atom = (jax.random.uniform(key, (2, 6, 5)) > 0.5).astype(jnp.float32) * node_mask
    fc = jnp.round(jax.random.normal(key, (2, 6, 1))) * node_mask
    edge = (jax.random.uniform(key, (2, 6, 6, 2)) > 0.5).astype(jnp.float32)
    edge = edge * edge_mask[..., None]

    p, a, f, e = scale(pos, atom, fc, node_mask, edge, edge_mask)
    p2, a2, f2, e2 = inverse(p, a, f, node_mask, e, edge_mask)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(atom), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(fc), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(edge), atol=1e-6)


def test_self_cond_clamp():
    cfg = _config(self_cond_type="clamp")
    fn = S.get_self_cond_fn(cfg)
    # normalised atom scale is [-0.25, 0.25]; fc scale [-0.25, 0.25]; edges [-1, 1]
    cond_x = jnp.concatenate(
        [jnp.full((1, 2, 3), 9.0), jnp.full((1, 2, 5), 9.0), jnp.full((1, 2, 1), -9.0)],
        axis=-1,
    )
    cond_e = jnp.full((1, 2, 2, 2), 5.0)
    out_x, out_e = fn(cond_x, cond_e)
    np.testing.assert_allclose(np.asarray(out_x[:, :, :3]), 9.0)  # pos untouched
    np.testing.assert_allclose(np.asarray(out_x[:, :, 3:8]), 0.25)
    np.testing.assert_allclose(np.asarray(out_x[:, :, 8:]), -0.25)
    np.testing.assert_allclose(np.asarray(out_e), 1.0)


def test_self_cond_ori_identity():
    cfg = _config(self_cond_type="ori")
    fn = S.get_self_cond_fn(cfg)
    x = jnp.ones((1, 2, 9)) * 7
    e = jnp.ones((1, 2, 2, 2)) * 7
    ox, oe = fn(x, e)
    np.testing.assert_allclose(np.asarray(ox), 7.0)
    np.testing.assert_allclose(np.asarray(oe), 7.0)
