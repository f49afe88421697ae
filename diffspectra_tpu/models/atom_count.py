"""Spectrum-conditioned atom-count head for n-free elucidation.

The reference protocol feeds the TRUE atom count of every eval target into
sampling (ref sampling.py:397-427) — information a real elucidation user
does not have. The serving API's count-marginalized mode (api.py
``_elucidate_marginal``) sweeps the histogram-prior-plausible counts, but
the r4 quantification (tools/nfree_eval.py: consensus Top-1 8.0% vs 68.0%
n-known on 512 targets) showed wrong-count draws reproduce structures as
consistently as right-count ones, so consensus frequency cannot identify
the count. The named fix (VERDICT r4 weak-6 / r5 next-6) is this module: a
small MLP on the trained SpecFormer's pooled spectrum embedding predicting
the atom-count distribution, so n-free mode samples only the few counts
the spectrum itself supports.

No reference counterpart — the reference has no n-free mode at all.
"""

from __future__ import annotations

import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dmt import _cond_encoder_module


class AtomCountHead(nn.Module):
    """MLP over the pooled SpecFormer embedding -> atom-count logits.

    Counts are 0..max_n inclusive (index = atom count incl. H); the 0/1
    slots are never populated by QM9-like data but keep indexing direct.
    """

    max_n: int = 29
    hidden: int = 256

    @nn.compact
    def __call__(self, emb):
        h = nn.Dense(self.hidden, name="fc1")(emb)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, name="fc2")(h)
        h = nn.gelu(h)
        return nn.Dense(self.max_n + 1, name="out")(h)


def encode_spec_pooled(model, variables, context, deterministic: bool = True):
    """Pooled [B, output_dim] SpecFormer embedding from a trained DMT's
    ``cond_encoder`` subtree (the head's frozen feature extractor) —
    mirrors models/dmt.py::encode_context minus the ``cond_lin`` map."""
    spec = _cond_encoder_module(model)
    sub = {"params": variables["params"]["cond_encoder"]}
    bstats = variables.get("batch_stats", {})
    if bstats and "cond_encoder" in bstats:
        sub["batch_stats"] = bstats["cond_encoder"]
    return spec.apply(sub, context, deterministic=deterministic)


def save_head(path: str, params, max_n: int, hidden: int, meta: dict | None = None):
    from flax import traverse_util

    flat = traverse_util.flatten_dict(jax.device_get(params), sep="/")
    out = {f"p/{k}": np.asarray(v) for k, v in flat.items()}
    out["__meta__"] = np.asarray(
        json.dumps({"max_n": max_n, "hidden": hidden, **(meta or {})})
    )
    np.savez_compressed(path, **out)


def load_head(path: str):
    """Returns ``(AtomCountHead, params, meta)``."""
    from flax import traverse_util

    with np.load(path, allow_pickle=False) as npz:
        meta = json.loads(str(npz["__meta__"]))
        flat = {
            k[len("p/"):]: jnp.asarray(npz[k])
            for k in npz.files
            if k.startswith("p/")
        }
    params = traverse_util.unflatten_dict(flat, sep="/")
    head = AtomCountHead(max_n=int(meta["max_n"]), hidden=int(meta["hidden"]))
    return head, params, meta


def predict_count_probs(head, params, emb):
    """[B, max_n+1] softmax count distribution from pooled embeddings."""
    logits = head.apply({"params": params}, emb)
    return jax.nn.softmax(logits, axis=-1)


def top_counts(probs, coverage: float = 0.9, cap: int = 4, min_n: int = 2):
    """Per-row: smallest probability-sorted count set covering ``coverage``
    of the predicted mass (at most ``cap`` counts, counts < min_n dropped).

    Returns a list of (counts, probs) tuples (python ints/floats), sorted
    by descending probability."""
    probs = np.asarray(probs)
    out = []
    for row in probs:
        order = np.argsort(-row)
        counts, ps, acc = [], [], 0.0
        for n in order:
            if n < min_n:
                continue
            counts.append(int(n))
            ps.append(float(row[n]))
            acc += float(row[n])
            if acc >= coverage or len(counts) >= cap:
                break
        out.append((counts, ps))
    return out
