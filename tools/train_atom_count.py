"""Train the spectrum-conditioned atom-count head (VERDICT r5 next-6).

Freezes the trained SpecFormer from a campaign warm state (the DMT's
``cond_encoder`` subtree), computes pooled embeddings over the campaign
train split, and fits models/atom_count.py::AtomCountHead with a softmax
cross-entropy on the true atom counts the synthetic set carries. Reports
held-out top-1/top-3 count accuracy and the coverage of the
``top_counts(coverage=0.9, cap=4)`` set the serving API will sample.

Env knobs:
  WARM      warm-state npz           (default artifacts/warm_qm9s_f4.npz)
  SIZE      campaign set size        (default 131072)
  FIDELITY  spectrum fidelity        (default 4)
  SPECTRA   spectra version          (default ir)
  EPOCHS    training epochs          (default 8)
  OUT       head npz output          (default artifacts/atom_count_head.npz)
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, force=True)
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import optax

    from diffspectra_tpu.api import Elucidator
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data.pipeline import _conditional_splits
    from diffspectra_tpu.data.synthetic import generate
    from diffspectra_tpu.models import atom_count as ac

    warm = os.environ.get("WARM", "/root/repo/artifacts/warm_qm9s_f4.npz")
    size = int(os.environ.get("SIZE", 131072))
    fidelity = int(os.environ.get("FIDELITY", 4))
    spectra_version = os.environ.get("SPECTRA", "ir")
    epochs = int(os.environ.get("EPOCHS", 8))
    out_path = os.environ.get("OUT", "/root/repo/artifacts/atom_count_head.npz")

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = spectra_version
    el = Elucidator.from_warm_state(warm, config=cfg)
    max_n = int(cfg.data.max_node)

    raw = generate(
        seed=42, size=size, max_n=max_n, fidelity=fidelity,
        cache_dir="/root/repo/data/synthetic_cache",
    )
    split_rng = np.random.default_rng(42)
    first, second, val, test = _conditional_splits(split_rng, size)
    train = np.concatenate([first, second])
    labels = np.asarray(raw["num_atom"], np.int32)

    spec_keys = {
        "uv": ("uv",), "ir": ("ir",), "raman": ("raman",),
        "allspectra": ("uv", "ir", "raman"),
    }[spectra_version]

    import functools

    @jax.jit
    def embed(batch_specs):
        ctx = (
            batch_specs if len(batch_specs) > 1 else batch_specs[0]
        )
        return ac.encode_spec_pooled(el.model, el.variables, ctx)

    def embed_all(idx, bs=1024):
        out = []
        for i in range(0, len(idx), bs):
            rows = idx[i:i + bs]
            pad = bs - len(rows)
            rows_p = np.concatenate([rows, rows[-1:].repeat(pad)]) if pad else rows
            specs = tuple(
                jnp.asarray(np.log10(raw[k][rows_p] + 1.0), jnp.float32)
                for k in spec_keys
            )
            e = np.asarray(embed(specs))
            out.append(e[: len(rows)])
        return np.concatenate(out)

    t0 = time.time()
    logging.info("embedding %d train + %d test spectra", len(train), len(test))
    x_train = embed_all(train)
    x_test = embed_all(test)
    y_train = labels[train]
    y_test = labels[test]
    logging.info("embeddings done in %.1fs (dim %d)", time.time() - t0,
                 x_train.shape[1])

    head = ac.AtomCountHead(max_n=max_n)
    rng = jax.random.PRNGKey(0)
    params = head.init(rng, jnp.zeros((2, x_train.shape[1])))["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = head.apply({"params": p}, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = 1024
    n_train = len(x_train)
    order_rng = np.random.default_rng(0)
    for ep in range(epochs):
        order = order_rng.permutation(n_train)
        tot, nb = 0.0, 0
        for i in range(0, n_train - bs + 1, bs):
            rows = order[i:i + bs]
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x_train[rows]),
                jnp.asarray(y_train[rows]),
            )
            tot += float(loss)
            nb += 1
        logging.info("epoch %d: loss %.4f", ep, tot / max(nb, 1))

    # held-out metrics
    @jax.jit
    def probs_fn(xb):
        return jax.nn.softmax(head.apply({"params": params}, xb), axis=-1)

    probs = []
    for i in range(0, len(x_test), bs):
        probs.append(np.asarray(probs_fn(jnp.asarray(x_test[i:i + bs]))))
    probs = np.concatenate(probs)
    pred = probs.argmax(-1)
    top1 = float((pred == y_test).mean())
    order3 = np.argsort(-probs, axis=-1)[:, :3]
    top3 = float(np.any(order3 == y_test[:, None], axis=1).mean())
    sets = ac.top_counts(probs, coverage=0.9, cap=4)
    covered = float(
        np.mean([y in counts for (counts, _), y in zip(sets, y_test)])
    )
    set_sizes = np.array([len(c) for c, _ in sets])
    logging.info(
        "held-out (%d): count top-1 %.4f top-3 %.4f | top_counts(0.9,cap4) "
        "covers true n %.4f (mean set size %.2f)",
        len(y_test), top1, top3, covered, float(set_sizes.mean()),
    )

    ac.save_head(
        out_path, params, max_n=max_n, hidden=head.hidden,
        meta={
            "warm": warm, "fidelity": fidelity, "spectra": spectra_version,
            "test_top1": top1, "test_top3": top3, "test_cover90": covered,
        },
    )
    logging.info("saved %s", out_path)


if __name__ == "__main__":
    main()
