"""Pretrained SpecFormer partial-restore round trip: build a torch-style
checkpoint from a flax SpecFormer, load it back, verify identical outputs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.models.pretrained import load_pretrained_specformer
from diffspectra_tpu.utils import masks as M


def _flax_to_torch_state(enc_params, enc_stats, spectra_version="ir", n_layers=3):
    """Inverse of the loader's key mapping, for round-trip testing."""
    prefix = "model.representation_spec_model"
    sd = {}

    def put_linear(dst_key, p):
        sd[f"{dst_key}.weight"] = torch.tensor(np.asarray(p["kernel"]).T.copy())
        if "bias" in p:
            sd[f"{dst_key}.bias"] = torch.tensor(np.asarray(p["bias"]).copy())

    put_linear(f"{prefix}.backbone.W_P.0", enc_params["W_P_1"])  # ir -> index 1
    sd[f"{prefix}.backbone.W_pos"] = torch.tensor(np.asarray(enc_params["W_pos"]).copy())
    for l in range(n_layers):
        lp = enc_params[f"encoder_layer_{l}"]
        base = f"{prefix}.backbone.encoder.layers.{l}"
        for qkv in ("W_Q", "W_K", "W_V"):
            put_linear(f"{base}.self_attn.{qkv}", lp["self_attn"][qkv])
        put_linear(f"{base}.self_attn.to_out.0", lp["self_attn"]["to_out"])
        put_linear(f"{base}.ff.0", lp["ff1"])
        put_linear(f"{base}.ff.3", lp["ff2"])
        ls = enc_stats[f"encoder_layer_{l}"]
        for norm in ("norm_attn", "norm_ffn"):
            sd[f"{base}.{norm}.1.weight"] = torch.tensor(np.asarray(lp[norm]["scale"]).copy())
            sd[f"{base}.{norm}.1.bias"] = torch.tensor(np.asarray(lp[norm]["bias"]).copy())
            sd[f"{base}.{norm}.1.running_mean"] = torch.tensor(np.asarray(ls[norm]["mean"]).copy())
            sd[f"{base}.{norm}.1.running_var"] = torch.tensor(np.asarray(ls[norm]["var"]).copy())
    put_linear(f"{prefix}.head.linear", enc_params["head_linear"])
    sd["model.representation_model.out_norm.weight"] = torch.tensor(
        np.asarray(enc_params["out_norm"]["scale"]).copy()
    )
    sd["model.representation_model.out_norm.bias"] = torch.tensor(
        np.asarray(enc_params["out_norm"]["bias"]).copy()
    )
    return sd


@pytest.mark.slow
def test_pretrained_specformer_roundtrip(tmp_path):
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
    out_ref, _ = model.apply(variables, *args, **kwargs)

    # export the donor encoder from a DIFFERENT init as a torch ckpt
    donor = model.init(jax.random.PRNGKey(99), *args, **kwargs)
    # randomise donor batch stats so the restore is observable
    sd = _flax_to_torch_state(
        donor["params"]["cond_encoder"], donor["batch_stats"]["cond_encoder"]
    )
    ckpt_path = os.path.join(tmp_path, "specformer.ckpt")
    torch.save({"state_dict": sd}, ckpt_path)

    restored = load_pretrained_specformer(dict(variables), str(ckpt_path), "ir")
    out_restored, _ = model.apply(restored, *args, **kwargs)
    out_donor, _ = model.apply(
        {
            "params": {**variables["params"], "cond_encoder": donor["params"]["cond_encoder"]},
            "batch_stats": {**variables["batch_stats"], "cond_encoder": donor["batch_stats"]["cond_encoder"]},
        },
        *args,
        **kwargs,
    )
    # restoring the donor encoder must reproduce the donor-encoder outputs
    np.testing.assert_allclose(
        np.asarray(out_restored), np.asarray(out_donor), atol=1e-5
    )
    # and differ from the original init
    assert float(jnp.max(jnp.abs(out_restored - out_ref))) > 1e-6
