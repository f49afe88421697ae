"""SpecFormer shape / behaviour tests (ref: models/specformer.py smoke block :472-490)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.models.specformer import (
    SpecFormer,
    patch_count,
    unfold_patches,
    used_spectra_indices,
)


def test_patch_counts_match_reference():
    # (701-20)/10+1 = 69 ; (3501-50)/25+1 = 139 (ref :48)
    assert patch_count(701, 20, 10) == 69
    assert patch_count(3501, 50, 25) == 139


def test_unfold_matches_manual():
    spec = jnp.arange(20, dtype=jnp.float32)[None]
    p = unfold_patches(spec, 6, 4)
    assert p.shape == (1, 4, 6)
    np.testing.assert_array_equal(np.asarray(p[0, 0]), np.arange(6))
    np.testing.assert_array_equal(np.asarray(p[0, 1]), np.arange(4, 10))


@pytest.mark.parametrize("version,n_spec,lens", [
    ("ir", 1, (3501,)),
    ("uv", 1, (701,)),
    ("raman", 1, (3501,)),
    ("allspectra", 3, (701, 3501, 3501)),
])
def test_specformer_forward_shapes(version, n_spec, lens):
    model = SpecFormer(spectra_version=version, output_dim=64, d_model=32, n_heads=4)
    key = jax.random.PRNGKey(0)
    specs = tuple(jax.random.normal(key, (2, l)) for l in lens)
    ctx = specs if n_spec > 1 else specs[0]
    variables = model.init(key, ctx, deterministic=True)
    out = model.apply(variables, ctx, deterministic=True)
    assert out.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_specformer_accepts_b1l_shape():
    model = SpecFormer(spectra_version="ir", output_dim=32, d_model=16, n_heads=4)
    key = jax.random.PRNGKey(0)
    ctx3 = jax.random.normal(key, (2, 1, 3501))
    variables = model.init(key, ctx3, deterministic=True)
    out3 = model.apply(variables, ctx3, deterministic=True)
    out2 = model.apply(variables, ctx3.reshape(2, 3501), deterministic=True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out2), atol=1e-6)


def test_specformer_batchnorm_train_mode_mutates_stats():
    model = SpecFormer(spectra_version="ir", output_dim=32, d_model=16, n_heads=4)
    key = jax.random.PRNGKey(0)
    ctx = jax.random.normal(key, (4, 3501))
    variables = model.init(key, ctx, deterministic=True)
    out, mutated = model.apply(
        variables,
        ctx,
        deterministic=False,
        mutable=["batch_stats"],
        rngs={"dropout": key},
    )
    assert "batch_stats" in mutated
    stats_leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.sum(jnp.abs(l))) > 0 for l in stats_leaves)


def test_used_spectra_indices_validation():
    assert used_spectra_indices("allspectra") == (0, 1, 2)
    with pytest.raises(ValueError):
        used_spectra_indices("xyz")
