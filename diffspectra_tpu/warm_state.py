"""Compact, git-committable warm-start weights.

The full Orbax train state (params + Adam moments + EMA, all f32) is
~16x the param count in bytes — too large to persist in the repository,
and this environment's scratch disk (where ``exp/`` checkpoints live) does
not survive across build sessions. This module exports the pieces that
carry the *learning* — params, EMA shadow params, BatchNorm stats, step —
as one compressed ``.npz`` with float params stored in bfloat16 (~2 bytes
per weight, ~20 MB for the flagship DMT), small enough to commit.

Restoring yields a "warm start": params/EMA/batch_stats/step are exact up
to the bf16 rounding of the export; the optimizer state is freshly
initialised, so Adam moments rebuild over the next few hundred steps and
the LR warmup (ref losses.py:86-88 semantics) replays from 0 — a mild,
documented deviation from a byte-exact resume, chosen so long training
runs can continue across machines via git alone.

No reference counterpart (ref checkpoints are torch pickles on local disk,
utils.py:7-30); this is infrastructure for the rebuild's own training
campaign.

bf16 arrays are stored as uint16 bit patterns (``.npz`` cannot hold the
ml_dtypes bfloat16 dtype without pickling); key prefixes record the
encoding: ``bf16:<path>`` for bit-pattern arrays, ``raw:<path>`` for
arrays stored in their native dtype.
"""

from __future__ import annotations

import json
import logging

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from flax import traverse_util

_BF16 = "bf16:"
_RAW = "raw:"
_META = "__meta__"


def _flatten(tree) -> dict:
    if not tree:
        return {}
    return traverse_util.flatten_dict(jax.device_get(tree), sep="/")


def _encode(flat: dict, prefix: str, out: dict) -> None:
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        key = f"{prefix}/{path}"
        if arr.dtype == np.float32 or arr.dtype == ml_dtypes.bfloat16:
            out[_BF16 + key] = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
        else:
            out[_RAW + key] = arr


def export_warm_state(state, path: str, meta: dict | None = None) -> None:
    """Write params/EMA/batch_stats/step from a host ``TrainState`` to npz."""
    out: dict = {}
    _encode(_flatten(state.params), "params", out)
    _encode(_flatten(state.batch_stats), "batch_stats", out)
    _encode(_flatten(state.ema.shadow_params), "ema", out)
    out[_RAW + "step"] = np.asarray(int(state.step), np.int64)
    out[_RAW + "ema_num_updates"] = np.asarray(int(state.ema.num_updates), np.int64)
    out[_META] = np.asarray(json.dumps(meta or {}))
    np.savez_compressed(path, **out)


def _decode(npz, prefix: str) -> dict:
    flat = {}
    for key in npz.files:
        if key.startswith(_BF16):
            name = key[len(_BF16):]
            value = npz[key].view(ml_dtypes.bfloat16)
        elif key.startswith(_RAW):
            name = key[len(_RAW):]
            value = npz[key]
        else:
            continue
        if name.startswith(prefix + "/"):
            flat[name[len(prefix) + 1:]] = value
    return flat


def _merge_partial(tree, flat: dict, what: str, zero_fresh=()):
    """Replace the leaves of ``tree`` that exist in ``flat`` with matching
    shapes; keep the fresh initialization for the rest.

    The cross-spectra warm start: an `allspectra` model warm-started from
    an IR-only campaign shares the whole DMT trunk but not the SpecFormer
    patch embedders — the same partial-restore semantics as the
    reference's pretrained-SpecFormer load (ref models/dmt.py:268-303,
    prefix-matched partial state-dict copy).

    ``zero_fresh``: substring patterns; any NON-restored (fresh) leaf whose
    path contains one of them is ZEROED instead of keeping its random init.
    This is the zero-gate for fresh components that feed a trained trunk:
    the r4 allspectra campaign left the (shape-mismatched) SpecFormer
    ``head_linear`` kernel randomly initialized, and its out-of-distribution
    context embedding drove the restored adaLN trunk to ~3e5-magnitude
    outputs (loss 6e9 at step 0 -> NaN by step 1.5k; tools/diag_as_fwd.py
    measured the contrast). Zeroing the fresh boundary kernel makes the
    context start at the trained distribution's centre (restored bias
    through the restored LayerNorm) and the warm model's step-0 forward
    stays in its trained operating range."""
    want = _flatten(tree)
    hit, skip_shape, zeroed = 0, 0, []
    merged = {}
    for path, leaf in want.items():
        arr = np.asarray(leaf)
        if path in flat and flat[path].shape == arr.shape:
            merged[path] = jnp.asarray(flat[path], dtype=arr.dtype)
            hit += 1
        else:
            if path in flat:
                skip_shape += 1
            if any(pat and pat in path for pat in zero_fresh):
                merged[path] = jnp.zeros_like(leaf)
                zeroed.append(path)
            else:
                merged[path] = leaf
    unused = len(set(flat) - set(want))
    logging.info(
        "partial warm start %s: %d/%d leaves restored "
        "(%d shape-mismatched kept fresh, %d npz keys unused%s)",
        what, hit, len(want), skip_shape, unused,
        f", zeroed fresh: {zeroed}" if zeroed else "",
    )
    if hit == 0:
        raise ValueError(
            f"partial warm state restored nothing for {what} — wrong file?"
        )
    return traverse_util.unflatten_dict(merged, sep="/")


def _merge(tree, flat: dict, what: str):
    """Replace every leaf of ``tree`` from ``flat``, keeping leaf dtypes."""
    want = _flatten(tree)
    if set(want) != set(flat):
        missing = sorted(set(want) - set(flat))[:5]
        extra = sorted(set(flat) - set(want))[:5]
        raise ValueError(
            f"warm state {what} keys do not match the model: "
            f"missing={missing} extra={extra}"
        )
    # key paths alone cannot catch a depth mismatch: the block scan STACKS
    # layers along a leading axis, so a different n_layers keeps the same
    # tree but changes leaf shapes — validate shapes too
    bad = [
        f"{path}: {flat[path].shape} vs model {np.asarray(leaf).shape}"
        for path, leaf in want.items()
        if flat[path].shape != np.asarray(leaf).shape
    ]
    if bad:
        raise ValueError(
            f"warm state {what} keys do not match the model (shapes): "
            + "; ".join(bad[:5])
        )
    merged = {
        path: jnp.asarray(flat[path], dtype=np.asarray(leaf).dtype)
        for path, leaf in want.items()
    }
    return traverse_util.unflatten_dict(merged, sep="/")


def load_warm_state(state, path: str, partial: bool = False, zero_fresh=()):
    """Return ``state`` with params/EMA/batch_stats/step from the npz.

    ``state`` must be a freshly created ``TrainState`` for the same model
    config; its (fresh) optimizer state is kept as-is. ``partial=True``
    restores only the intersecting same-shape leaves (cross-spectra warm
    starts, e.g. allspectra model from an IR-only campaign) and keeps the
    fresh init for the rest — see ``_merge_partial``. ``zero_fresh``
    (partial only): substring patterns naming fresh boundary leaves to zero
    instead, the zero-gate that keeps a trained trunk in its operating
    range at step 0 (see ``_merge_partial``).
    """
    if partial:
        def merge(tree, flat, what):
            return _merge_partial(tree, flat, what, zero_fresh=zero_fresh)
    else:
        merge = _merge
    with np.load(path, allow_pickle=False) as npz:
        meta = json.loads(str(npz[_META])) if _META in npz.files else {}
        params = merge(state.params, _decode(npz, "params"), "params")
        batch_stats = (
            merge(state.batch_stats, _decode(npz, "batch_stats"), "batch_stats")
            if state.batch_stats
            else state.batch_stats
        )
        ema_shadow = merge(state.ema.shadow_params, _decode(npz, "ema"), "ema")
        step = int(npz[_RAW + "step"])
        ema_n = int(npz[_RAW + "ema_num_updates"])
    logging.info(
        "warm start: restored step %d from %s (meta: %s); optimizer state is "
        "fresh (Adam moments rebuild, LR warmup replays)",
        step, path, meta,
    )
    return state.replace(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema=state.ema._replace(
            num_updates=jnp.asarray(ema_n, jnp.int32), shadow_params=ema_shadow
        ),
    )
