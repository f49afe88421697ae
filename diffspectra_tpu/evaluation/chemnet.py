"""ChemNet in JAX for the real Fréchet ChemNet Distance (FCD).

The reference computes FCD with ``fcd_torch`` (ref evaluation/mose_metric.py:1,
:131-154): SMILES are tokenised to one-hots and pushed through the pretrained
ChemNet (Preuer et al. 2018); the FCD is the Fréchet distance between
Gaussians fit to the penultimate activations of generated vs reference sets.

This image has zero egress, so the pretrained weights cannot be fetched.  The
split adopted here:

- **Architecture + inference live here**, manifest-driven: the weight file
  (``.npz``) carries a JSON ``manifest`` naming an ordered list of layers
  (``conv1d`` / ``lstm`` / ``bilstm`` / ``dense``), the SMILES vocabulary,
  and the pad length.  The JAX model is built from the manifest, so the
  architecture of record is whatever the converter extracted from the real
  fcd_torch model — nothing about the published network is hard-coded from
  memory.
- **Conversion lives in tools/convert_chemnet.py**: run it once in any
  environment that has ``fcd_torch`` installed and copy the resulting
  ``chemnet.npz`` to ``diffspectra_tpu/data/chemnet.npz`` (or point
  ``DIFFSPECTRA_CHEMNET_NPZ`` at it).
- Until real weights are present, mose_metric reports ``FCD=NaN`` and keeps
  the descriptor-Fréchet under the separate ``FCD_proxy`` key — proxy
  numbers are never published-comparable and never share the FCD key.

Inference is pure JAX (lax.scan LSTM, SAME conv) and jit-compiled; feature
extraction for 10k molecules is a single batched device call.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

import numpy as np

# Default tokenisation (fcd's published scheme) — used for random-weight
# tests; real runs take vocab/pad_len from the converted npz manifest.
DEFAULT_VOCAB = [
    "C", "N", "O", "H", "F", "Cl", "P", "B", "Br", "S", "I", "Si",
    "#", "(", ")", "+", "-",
    "1", "2", "3", "4", "5", "6", "7", "8", "9",
    "=", "[", "]", "@", "c", "n", "o", "s", "X", ".",
]
DEFAULT_PAD_LEN = 350
_TWO_CHAR = ("Cl", "Br", "Si")

_model_cache = None


def tokenize(smiles: str, vocab: List[str]) -> List[int]:
    """Greedy two-char-first SMILES tokenisation; unknown -> 'X'."""
    index = {t: i for i, t in enumerate(vocab)}
    unk = index.get("X", 0)
    out = []
    i = 0
    while i < len(smiles):
        tok = smiles[i : i + 2]
        if tok in _TWO_CHAR and tok in index:
            out.append(index[tok])
            i += 2
        else:
            out.append(index.get(smiles[i], unk))
            i += 1
    return out


def one_hot_batch(
    smiles_list: List[str], vocab: List[str], pad_len: int
) -> np.ndarray:
    """[B, pad_len, V] one-hots, padded with the '.' (stop) token."""
    V = len(vocab)
    pad_idx = vocab.index(".") if "." in vocab else V - 1
    out = np.zeros((len(smiles_list), pad_len, V), dtype=np.float32)
    for b, smi in enumerate(smiles_list):
        toks = tokenize(smi, vocab)[:pad_len]
        out[b, np.arange(len(toks)), toks] = 1.0
        out[b, len(toks):, pad_idx] = 1.0
    return out


class ChemNet:
    """Manifest-driven ChemNet feature extractor."""

    def __init__(self, manifest: dict, params: dict):
        self.manifest = manifest
        self.vocab = list(manifest.get("vocab", DEFAULT_VOCAB))
        self.pad_len = int(manifest.get("pad_len", DEFAULT_PAD_LEN))
        self.params = params
        self._apply = None

    # ----------------------------------------------------------- npz io
    @classmethod
    def load(cls, path: str) -> "ChemNet":
        data = np.load(path, allow_pickle=False)
        manifest = json.loads(str(data["manifest"]))
        params = {k: data[k] for k in data.files if k != "manifest"}
        return cls(manifest, params)

    def save(self, path: str) -> None:
        np.savez(
            path, manifest=np.str_(json.dumps(self.manifest)), **self.params
        )

    # -------------------------------------------------------- jax model
    def _build(self):
        import jax
        import jax.numpy as jnp

        layers = self.manifest["layers"]
        params = {k: jnp.asarray(v) for k, v in self.params.items()}

        def lstm_pass(x, W, U, b, reverse=False):
            """x: [B,T,I]; W: [I,4H]; U: [H,4H]; b: [4H] (i,f,g,o order)."""
            H = U.shape[0]
            B = x.shape[0]
            xs = jnp.swapaxes(x, 0, 1)  # [T,B,I]
            if reverse:
                xs = xs[::-1]

            def step(carry, xt):
                h, c = carry
                z = xt @ W + h @ U + b
                i, f, g, o = jnp.split(z, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
            (h_last, _), hs = jax.lax.scan(step, init, xs)
            if reverse:
                hs = hs[::-1]
            return jnp.swapaxes(hs, 0, 1), h_last  # [B,T,H], [B,H]

        def apply(x):
            # x: [B, T, V]
            for spec in layers:
                kind, name = spec["kind"], spec["name"]
                if kind == "conv1d":
                    # SAME padding over time; kernel [K, I, O]
                    k = params[f"{name}.kernel"]
                    b = params[f"{name}.bias"]
                    x = jax.lax.conv_general_dilated(
                        x, k,
                        window_strides=(spec.get("stride", 1),),
                        padding="SAME",
                        dimension_numbers=("NWC", "WIO", "NWC"),
                    ) + b
                elif kind in ("lstm", "bilstm"):
                    W = params[f"{name}.W"]
                    U = params[f"{name}.U"]
                    b = params[f"{name}.b"]
                    seq, last = lstm_pass(x, W, U, b)
                    if kind == "bilstm":
                        seq_r, last_r = lstm_pass(
                            x, params[f"{name}.W_rev"],
                            params[f"{name}.U_rev"], params[f"{name}.b_rev"],
                            reverse=True,
                        )
                        seq = jnp.concatenate([seq, seq_r], axis=-1)
                        last = jnp.concatenate([last, last_r], axis=-1)
                    x = last if spec.get("last_only") else seq
                elif kind == "dense":
                    x = x @ params[f"{name}.kernel"] + params[f"{name}.bias"]
                else:
                    raise ValueError(f"unknown ChemNet layer kind {kind!r}")
                act = spec.get("activation")
                if act == "selu":
                    x = jax.nn.selu(x)
                elif act == "tanh":
                    x = jnp.tanh(x)
                elif act == "relu":
                    x = jax.nn.relu(x)
                elif act not in (None, "linear"):
                    raise ValueError(f"unknown activation {act!r}")
            return x

        self._apply = jax.jit(apply)

    def features(self, smiles_list: List[str], batch_size: int = 512) -> np.ndarray:
        """Penultimate-layer activations for a list of SMILES."""
        if self._apply is None:
            self._build()
        outs = []
        for i in range(0, len(smiles_list), batch_size):
            chunk = smiles_list[i : i + batch_size]
            # pad the final chunk to batch_size: keeps one compiled shape
            n = len(chunk)
            if n < batch_size:
                chunk = chunk + [""] * (batch_size - n)
            x = one_hot_batch(chunk, self.vocab, self.pad_len)
            outs.append(np.asarray(self._apply(x))[:n])
        return np.concatenate(outs, axis=0)


def default_weights_path() -> Optional[str]:
    for p in (
        os.environ.get("DIFFSPECTRA_CHEMNET_NPZ", ""),
        os.path.join(os.path.dirname(__file__), "..", "data", "chemnet.npz"),
    ):
        if p and os.path.isfile(p):
            return p
    return None


def load_default() -> Optional[ChemNet]:
    """Cached ChemNet from the default weight locations, or None."""
    global _model_cache
    if _model_cache is not None:
        return _model_cache
    path = default_weights_path()
    if path is None:
        return None
    try:
        _model_cache = ChemNet.load(path)
        logging.info("ChemNet weights loaded from %s", path)
    except Exception as e:
        logging.warning("ChemNet weights at %s unreadable: %s", path, e)
        return None
    return _model_cache


def fcd_from_smiles(gen_smiles: List[str], ref_smiles: List[str]) -> float:
    """Real FCD between two SMILES sets; NaN when no weights are installed."""
    net = load_default()
    if net is None or not gen_smiles or not ref_smiles:
        return float("nan")
    from .fingerprints import frechet_distance

    return frechet_distance(net.features(gen_smiles), net.features(ref_smiles))


def random_chemnet(seed: int = 0) -> ChemNet:
    """A randomly initialised ChemNet with the fcd-shaped default stack —
    for loader round-trip and inference-shape tests only."""
    rng = np.random.default_rng(seed)
    V = len(DEFAULT_VOCAB)

    def r(*shape):
        return rng.normal(0, 0.1, size=shape).astype(np.float32)

    manifest = {
        "vocab": DEFAULT_VOCAB,
        "pad_len": 64,  # short for tests
        "layers": [
            {"kind": "conv1d", "name": "conv0", "activation": "selu", "k": 9},
            {"kind": "bilstm", "name": "lstm0", "last_only": True},
            {"kind": "dense", "name": "dense0", "activation": "linear"},
        ],
    }
    H = 32
    params = {
        "conv0.kernel": r(9, V, 16),
        "conv0.bias": r(16),
        "lstm0.W": r(16, 4 * H), "lstm0.U": r(H, 4 * H), "lstm0.b": r(4 * H),
        "lstm0.W_rev": r(16, 4 * H), "lstm0.U_rev": r(H, 4 * H),
        "lstm0.b_rev": r(4 * H),
        "dense0.kernel": r(2 * H, 24), "dense0.bias": r(24),
    }
    return ChemNet(manifest, params)
