"""Load a pretrained (PyTorch Lightning) SpecFormer checkpoint into flax
variables.

Rewrite of ref models/dmt.py:268-303 / dmt_wo_eq.py:762-809: prefix-matched
partial restore from a torch checkpoint holding
``model.representation_spec_model.*`` (or ``model.representation_model.*``)
keys, with ``out_norm`` always sourced from ``model.representation_model``.
torch is used host-side only to unpickle the checkpoint.

Key mapping (torch -> flax):
  backbone.W_P.{k}.{weight,bias}        -> cond_encoder/W_P_{used[k]}
  backbone.W_pos[_uv|_ir|_raman]        -> cond_encoder/W_pos[...]
  backbone.encoder.layers.{l}.self_attn.W_{Q,K,V} -> encoder_layer_{l}/self_attn/W_{Q,K,V}
  ...self_attn.to_out.0                 -> .../self_attn/to_out
  ...norm_attn.1 / norm_ffn.1 (BatchNorm1d) -> BatchNorm params + batch_stats
  ...ff.0 / ff.3                        -> ff1 / ff2
  head.linear                           -> head_linear
  out_norm                              -> out_norm (LayerNorm)

Linear weights transpose (torch [out,in] -> flax kernel [in,out]).
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import jax
import numpy as np

from .specformer import used_spectra_indices


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy())


def load_torch_state_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    import torch  # host-side only

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "state_dict" not in ckpt:
        logging.warning(
            "pretrained checkpoint has no 'state_dict' key; loading raw dict"
        )
        state = ckpt
    else:
        state = ckpt["state_dict"]
    return {k: _to_np(v) for k, v in state.items()}


def specformer_params_from_torch(
    state: Dict[str, np.ndarray],
    spectra_version: str,
    n_layers: int = 3,
) -> Tuple[dict, dict, int]:
    """Build (params, batch_stats, n_matched) subtrees for the flax
    SpecFormer from a torch state dict."""
    prefix = None
    for cand in ("model.representation_spec_model", "model.representation_model"):
        if any(k.startswith(cand) for k in state):
            prefix = cand
            break
    if prefix is None:
        logging.warning("No matching prefix found in the state_dict.")
        return {}, {}, 0

    used = used_spectra_indices(spectra_version)
    params: dict = {}
    stats: dict = {}
    matched = 0

    def get(key):
        nonlocal matched
        full = f"{prefix}.{key}"
        if full in state:
            matched += 1
            return state[full]
        return None

    def linear(dst: dict, name: str, src: str):
        w = get(f"{src}.weight")
        b = get(f"{src}.bias")
        if w is not None:
            dst[name] = {"kernel": w.T.copy()}
            if b is not None:
                dst[name]["bias"] = b.copy()

    # patch projections + positional embeddings
    for k, idx in enumerate(used):
        linear(params, f"W_P_{idx}", f"backbone.W_P.{k}")
    if spectra_version == "allspectra":
        for name, key in (
            ("W_pos_uv", "backbone.W_pos_uv"),
            ("W_pos_ir", "backbone.W_pos_ir"),
            ("W_pos_raman", "backbone.W_pos_raman"),
        ):
            w = get(key)
            if w is not None:
                params[name] = w.copy()
    else:
        w = get("backbone.W_pos")
        if w is not None:
            params["W_pos"] = w.copy()

    # encoder layers
    for l in range(n_layers):
        base = f"backbone.encoder.layers.{l}"
        layer_p: dict = {"self_attn": {}}
        layer_s: dict = {}
        for qkv in ("W_Q", "W_K", "W_V"):
            linear(layer_p["self_attn"], qkv, f"{base}.self_attn.{qkv}")
        linear(layer_p["self_attn"], "to_out", f"{base}.self_attn.to_out.0")
        linear(layer_p, "ff1", f"{base}.ff.0")
        linear(layer_p, "ff2", f"{base}.ff.3")
        for norm in ("norm_attn", "norm_ffn"):
            w = get(f"{base}.{norm}.1.weight")
            b = get(f"{base}.{norm}.1.bias")
            mean = get(f"{base}.{norm}.1.running_mean")
            var = get(f"{base}.{norm}.1.running_var")
            if w is not None:
                layer_p[norm] = {"scale": w.copy(), "bias": b.copy()}
            if mean is not None:
                layer_s[norm] = {"mean": mean.copy(), "var": var.copy()}
        params[f"encoder_layer_{l}"] = layer_p
        if layer_s:
            stats[f"encoder_layer_{l}"] = layer_s

    linear(params, "head_linear", "head.linear")
    # out_norm: always from representation_model (ref dmt.py:292-293)
    for pname, key in (
        ("scale", "model.representation_model.out_norm.weight"),
        ("bias", "model.representation_model.out_norm.bias"),
    ):
        if key in state:
            params.setdefault("out_norm", {})[pname] = state[key].copy()
            matched += 1

    return params, stats, matched


def _merge(dst, src, path=""):
    """Recursively copy matching-shaped leaves of src into a copy of dst."""
    out = dict(dst)
    n = 0
    for k, v in src.items():
        if k not in dst:
            logging.debug("pretrained key %s%s not in model", path, k)
            continue
        if isinstance(v, dict):
            out[k], sub = _merge(dst[k], v, f"{path}{k}/")
            n += sub
        else:
            if np.shape(dst[k]) == np.shape(v):
                out[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                n += 1
            else:
                logging.warning(
                    "shape mismatch for %s%s: %s vs %s",
                    path, k, np.shape(dst[k]), np.shape(v),
                )
    return out, n


def load_pretrained_specformer(variables, ckpt_path: str, spectra_version: str,
                               encoder_name: str = "cond_encoder"):
    """Return a copy of ``variables`` with the SpecFormer subtree replaced by
    pretrained weights (partial, shape-checked — ref dmt.py:290-303).

    Two checkpoint formats: torch pickles (reference-compatible, prefix-
    remapped) and .npz files written by the TPU-native pretraining loop
    (training/pretrain.py::save_specformer_ckpt — flax-keyed, no remap)."""
    if ckpt_path.endswith(".npz"):
        from ..training.pretrain import load_specformer_npz

        params, stats = load_specformer_npz(ckpt_path)
        matched = len(jax.tree_util.tree_leaves(params)) if params else 0
    else:
        state = load_torch_state_dict(ckpt_path)
        params, stats, matched = specformer_params_from_torch(state, spectra_version)
    if matched == 0:
        logging.warning("No matching keys found in the pretrained SpecFormer model.")
        return variables

    import flax

    variables = flax.core.unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)
    new_params = dict(variables["params"])
    merged, n_loaded = _merge(new_params[encoder_name], params)
    new_params[encoder_name] = merged
    variables["params"] = new_params
    if stats and "batch_stats" in variables:
        new_stats = dict(variables["batch_stats"])
        merged_s, n_s = _merge(new_stats.get(encoder_name, {}), stats)
        new_stats[encoder_name] = merged_s
        variables["batch_stats"] = new_stats
        n_loaded += n_s
    logging.info("Loaded %d tensors from the pretrained SpecFormer model.", n_loaded)
    return variables
