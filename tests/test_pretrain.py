"""SpecFormer masked-patch pretraining: loss decreases, checkpoint saves,
and the .npz restores into a diffusion model's cond_encoder subtree."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.models.pretrained import load_pretrained_specformer
from diffspectra_tpu.models.specformer import SpecFormer, patch_count
from diffspectra_tpu.training.pretrain import (
    SpecFormerPretrainer,
    load_specformer_npz,
    make_pretrain_step,
    pretrain_specformer,
    save_specformer_ckpt,
)
from diffspectra_tpu.utils import masks as M


def _tiny_pretrainer():
    return SpecFormerPretrainer(
        patch_len=(20, 50, 50), stride=(10, 25, 25), output_dim=32,
        spectra_version="ir", dropout=0.0,
    )


def test_patch_mask_zeroes_inputs():
    """A fully-masked spectrum must give the same tokens as a zero spectrum."""
    sf = SpecFormer(output_dim=16, spectra_version="ir", dropout=0.0)
    key = jax.random.PRNGKey(0)
    spec = jnp.abs(jax.random.normal(key, (2, 3501)))
    n_p = patch_count(3501, 50, 25)
    full_mask = (jnp.ones((2, n_p)),)
    variables = sf.init(key, spec)
    _, out_masked = sf.apply(
        variables, spec, patch_masks=full_mask, return_tokens=True
    )
    _, out_zero = sf.apply(
        variables, jnp.zeros_like(spec), return_tokens=True
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_zero), atol=1e-6
    )


def test_pretrain_step_loss_decreases():
    import optax

    model = _tiny_pretrainer()
    key = jax.random.PRNGKey(0)
    spec = jnp.abs(jax.random.normal(key, (8, 3501))) * jnp.sin(
        jnp.linspace(0, 20, 3501)
    )
    n_p = patch_count(3501, 50, 25)
    masks0 = (jnp.zeros((8, n_p)),)
    variables = model.init(key, (spec,), masks0, deterministic=True)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_pretrain_step(model, tx, mask_ratio=0.4))
    losses = []
    for i in range(30):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, (spec,), jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_npz_roundtrip_into_dmt(tmp_path):
    """Pretrained encoder saved as .npz must restore into DMT and reproduce
    donor-encoder outputs."""
    model = DMT(
        in_node_dim=6, hidden_dim=32, edge_hidden_dim=8, n_heads=4, n_layers=1,
        dropout=0.0, spectra_version="ir",
    )
    key = jax.random.PRNGKey(0)
    bs, n = 2, 4
    node_mask, edge_mask = M.build_masks(jnp.asarray([3, 4]), n)
    ctx = jnp.abs(jax.random.normal(key, (bs, 3501)))
    args = (
        jnp.zeros((bs,)), jax.random.normal(key, (bs, n, 9)) * node_mask,
        node_mask, edge_mask, ctx,
    )
    kwargs = dict(
        edge_x=M.sample_symmetric_edge_feature_noise(key, bs, n, 2, edge_mask),
        noise_level=jnp.zeros((bs,)),
    )
    variables = model.init(key, *args, **kwargs)
    donor = model.init(jax.random.PRNGKey(99), *args, **kwargs)

    path = os.path.join(tmp_path, "specformer_pretrained.npz")
    save_specformer_ckpt(path, donor["params"], donor["batch_stats"])

    p, s = load_specformer_npz(path)
    assert "encoder_layer_0" in p and "norm_attn" in s["encoder_layer_0"]

    restored = load_pretrained_specformer(dict(variables), path, "ir")
    out_restored, _ = model.apply(restored, *args, **kwargs)
    out_donor, _ = model.apply(
        {
            "params": {**variables["params"],
                       "cond_encoder": donor["params"]["cond_encoder"]},
            "batch_stats": {**variables["batch_stats"],
                            "cond_encoder": donor["batch_stats"]["cond_encoder"]},
        },
        *args, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(out_restored), np.asarray(out_donor), atol=1e-5
    )


def test_pretrain_loop_end_to_end(tmp_path):
    """Full pretrain loop on the synthetic smoke config writes a checkpoint
    that the training init path can consume."""
    cfg = smoke.get_config()
    workdir = str(tmp_path / "pretrain")
    params, stats = pretrain_specformer(cfg, workdir)
    ckpt = os.path.join(workdir, "specformer_pretrained.npz")
    assert os.path.exists(ckpt)
    p, s = load_specformer_npz(ckpt)
    np.testing.assert_allclose(
        np.asarray(p["head_linear"]["kernel"]),
        np.asarray(params["cond_encoder"]["head_linear"]["kernel"]),
    )
