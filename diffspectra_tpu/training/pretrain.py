"""SpecFormer masked-patch pretraining.

The reference only *consumes* a pretrained SpecFormer checkpoint
(ref models/dmt.py:268-303, scripts/training_scripts.sh allspectra+pretrained
mode); the pretraining code itself is not in the repo. This module completes
that story TPU-natively with the standard patch-transformer self-supervised
objective (PatchTST-style masked reconstruction): a random fraction of
patches per spectrum is zero-masked before projection, the encoder runs over
the corrupted token sequence, and per-spectrum linear heads reconstruct the
raw patch values; the MSE is taken over masked patches only.

Zero-masking (rather than a learned mask token) keeps the SpecFormer
parameter tree byte-identical to the fine-tuning model, so the saved
checkpoint merges into DMT/DMT_WO_EQ/CDGS ``cond_encoder`` subtrees without
key surgery (models/pretrained.py).

The whole step (mask draw, forward with BatchNorm batch stats, loss, AdamW
update) is one jitted function; data-parallel execution uses the same
mesh/psum recipe as the main trainer.
"""

from __future__ import annotations

import logging
import os
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.specformer import (
    SpecFormer,
    patch_count,
    unfold_patches,
    used_spectra_indices,
)


class SpecFormerPretrainer(nn.Module):
    """SpecFormer + per-spectrum patch reconstruction heads.

    The encoder submodule is named ``cond_encoder`` so its parameter subtree
    matches the diffusion models' conditioning encoder exactly.
    """

    patch_len: tuple = (20, 50, 50)
    stride: tuple = (10, 25, 25)
    output_dim: int = 256
    spectra_version: str = "ir"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, context, patch_masks, deterministic: bool = False):
        enc = SpecFormer(
            patch_len=tuple(self.patch_len),
            stride=tuple(self.stride),
            output_dim=self.output_dim,
            spectra_version=self.spectra_version,
            dropout=self.dropout,
            name="cond_encoder",
        )
        _, tokens = enc(
            context,
            deterministic=deterministic,
            patch_masks=patch_masks,
            return_tokens=True,
        )
        specs = enc.normalize_context(context)
        used = used_spectra_indices(self.spectra_version)
        preds = []
        off = 0
        for slot, (i, spec) in enumerate(zip(used, specs)):
            n_i = patch_count(spec.shape[-1], self.patch_len[i], self.stride[i])
            tok = tokens[:, off : off + n_i]
            off += n_i
            preds.append(nn.Dense(self.patch_len[i], name=f"recon_head_{i}")(tok))
        return tuple(preds)

    @staticmethod
    def from_config(config):
        return SpecFormerPretrainer(
            patch_len=tuple(config.model.patch_len),
            stride=tuple(config.model.stride),
            output_dim=config.model.nf,
            spectra_version=config.data.spectra_version,
            dropout=config.pretrain.get("dropout", 0.0),
        )


def masked_recon_loss(preds, specs, patch_masks, patch_len, stride, used):
    """MSE over masked patches only, averaged over spectra."""
    total = 0.0
    for slot, i in enumerate(used):
        target = unfold_patches(specs[slot], patch_len[i], stride[i])
        m = patch_masks[slot][..., None]
        se = jnp.sum(m * (preds[slot] - target) ** 2)
        denom = jnp.maximum(jnp.sum(m) * patch_len[i], 1.0)
        total = total + se / denom
    return total / len(used)


def _normalize_specs(context):
    specs = context if isinstance(context, (list, tuple)) else [context]
    return tuple(
        s.reshape(s.shape[0], s.shape[-1]) if s.ndim == 3 else s for s in specs
    )


def make_pretrain_step(model: SpecFormerPretrainer, tx, mask_ratio: float):
    used = used_spectra_indices(model.spectra_version)
    patch_len, stride = model.patch_len, model.stride

    def step(params, batch_stats, opt_state, context, rng):
        specs = _normalize_specs(context)
        keys = jax.random.split(rng, len(specs) + 1)
        patch_masks = tuple(
            jax.random.bernoulli(
                keys[slot],
                mask_ratio,
                (s.shape[0], patch_count(s.shape[-1], patch_len[i], stride[i])),
            ).astype(s.dtype)
            for slot, (i, s) in enumerate(zip(used, specs))
        )

        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            preds, mutated = model.apply(
                variables,
                specs,
                patch_masks,
                deterministic=False,
                rngs={"dropout": keys[-1]},
                mutable=["batch_stats"],
            )
            loss = masked_recon_loss(
                preds, specs, patch_masks, patch_len, stride, used
            )
            return loss, mutated.get("batch_stats", batch_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss

    return step


def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_tree(flat):
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_specformer_ckpt(path, params, batch_stats, encoder_name="cond_encoder"):
    """Save the encoder subtree (params + BatchNorm running stats) as an
    .npz the fine-tuning restore path (models/pretrained.py) consumes."""
    flat = {
        f"params|{k}": v
        for k, v in _flatten_tree(params[encoder_name]).items()
    }
    stats = batch_stats.get(encoder_name, {}) if batch_stats else {}
    flat.update(
        {f"batch_stats|{k}": v for k, v in _flatten_tree(stats).items()}
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_specformer_npz(path):
    """Return (params_subtree, batch_stats_subtree) from an .npz written by
    ``save_specformer_ckpt``."""
    data = np.load(path)
    p_flat, s_flat = {}, {}
    for key in data.files:
        ns, rest = key.split("|", 1)
        (p_flat if ns == "params" else s_flat)[rest] = data[key]
    return _unflatten_tree(p_flat), _unflatten_tree(s_flat)


def pretrain_specformer(config, workdir):
    """Pretraining loop: masked-patch reconstruction over the train split's
    spectra. Saves ``<workdir>/specformer_pretrained.npz`` (final) plus
    numbered snapshots; the result plugs into
    ``config.model.pretrained_specformer_path``."""
    from ..data import get_batch_iterator, get_dataset, inf_iterator
    from ..data.pipeline import prefetch
    from ..run_lib import resolve_runtime_config

    # runtime knobs (training.prng_impl, device-count batch scaling) apply
    # to pretraining too — every entrypoint resolves before creating keys
    # (advisor r4: the pretrain path previously skipped this, silently
    # no-opting prng_impl='rbg' in one of the three modes)
    config = resolve_runtime_config(config, len(jax.devices()))

    jax.config.update(
        "jax_default_matmul_precision",
        config.training.get("matmul_precision", "bfloat16"),
    )
    os.makedirs(workdir, exist_ok=True)
    pcfg = config.pretrain

    _, train_ds, _, _, _ = get_dataset(config)
    batch_size = pcfg.batch_size or config.training.base_batch_size
    spectra_version = config.data.spectra_version

    def make_iter(epoch):
        return get_batch_iterator(
            train_ds, batch_size, spectra_version, shuffle=True,
            seed=config.seed + epoch, drop_last=True,
        )

    it = prefetch(inf_iterator(make_iter), size=2)
    first = next(it)

    model = SpecFormerPretrainer.from_config(config)
    rng = jax.random.PRNGKey(config.seed)
    rng, k_init = jax.random.split(rng)

    specs0 = _normalize_specs(first["context"])
    used = used_spectra_indices(spectra_version)
    masks0 = tuple(
        jnp.zeros(
            (s.shape[0], patch_count(s.shape[-1], model.patch_len[i], model.stride[i])),
            s.dtype,
        )
        for i, s in zip(used, specs0)
    )
    variables = jax.jit(model.init, static_argnames="deterministic")(
        k_init, specs0, masks0, deterministic=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logging.info("pretrain model size: %.1fMB", n_params * 4 / 2**20)

    tx = optax.chain(
        optax.clip_by_global_norm(pcfg.get("grad_clip", 1.0)),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, pcfg.lr, pcfg.warmup, max(pcfg.n_iters, pcfg.warmup + 1)
            ),
            weight_decay=pcfg.get("weight_decay", 1e-4),
        ),
    )
    opt_state = tx.init(params)
    step_fn = jax.jit(make_pretrain_step(model, tx, pcfg.mask_ratio))

    log_freq = pcfg.log_freq
    t_last = time.time()
    for step in range(1, pcfg.n_iters + 1):
        batch = next(it)
        rng, k = jax.random.split(rng)
        params, batch_stats, opt_state, loss = step_fn(
            params, batch_stats, opt_state, batch["context"], k
        )
        if step % log_freq == 0:
            dt = time.time() - t_last
            t_last = time.time()
            logging.info(
                "pretrain step: %d, loss: %.5e, spectra/sec: %.1f",
                step, float(loss), log_freq * batch_size / dt,
            )
        if step % pcfg.snapshot_freq == 0 or step == pcfg.n_iters:
            path = os.path.join(workdir, "specformer_pretrained.npz")
            save_specformer_ckpt(path, jax.device_get(params),
                                 jax.device_get(batch_stats))
            logging.info("pretrain checkpoint saved: %s", path)
    return params, batch_stats
