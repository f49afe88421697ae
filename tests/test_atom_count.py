"""Spectrum-conditioned atom-count head (models/atom_count.py) and its
serving-API wiring — the n-free elucidation fix (VERDICT r5 next-6; the r4
flat count-marginalization measured 8.0% vs 68.0% n-known)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu import warm_state
from diffspectra_tpu.api import Elucidator
from diffspectra_tpu.configs import smoke
from diffspectra_tpu.models import atom_count as ac


def test_head_shapes_and_probs():
    head = ac.AtomCountHead(max_n=29, hidden=32)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((3, 16)))["params"]
    probs = ac.predict_count_probs(head, params, jnp.ones((5, 16)))
    assert probs.shape == (5, 30)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_top_counts_coverage_cap_and_min_n():
    probs = np.zeros((2, 30))
    # row 0: mass concentrated on a few counts
    probs[0, 17] = 0.6
    probs[0, 19] = 0.3
    probs[0, 21] = 0.1
    # row 1: mass on an implausible n=0 (must be dropped) + spread
    probs[1, 0] = 0.5
    probs[1, 9] = 0.3
    probs[1, 12] = 0.2
    sets = ac.top_counts(probs, coverage=0.85, cap=4, min_n=2)
    counts0, ps0 = sets[0]
    assert counts0 == [17, 19]  # 0.9 >= 0.85 after two
    assert ps0 == pytest.approx([0.6, 0.3])
    counts1, _ = sets[1]
    assert 0 not in counts1 and counts1[0] == 9

    # cap bounds the set even when coverage is not reached
    spread = np.full((1, 30), 1.0 / 30)
    (counts, _), = ac.top_counts(spread, coverage=0.99, cap=3)
    assert len(counts) == 3


def test_head_save_load_roundtrip(tmp_path):
    head = ac.AtomCountHead(max_n=12, hidden=24)
    params = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 8)))["params"]
    path = str(tmp_path / "head.npz")
    ac.save_head(path, params, max_n=12, hidden=24, meta={"tag": "t"})
    head2, params2, meta = ac.load_head(path)
    assert head2.max_n == 12 and head2.hidden == 24 and meta["tag"] == "t"
    x = jnp.ones((2, 8))
    np.testing.assert_allclose(
        np.asarray(head.apply({"params": params}, x)),
        np.asarray(head2.apply({"params": params2}, x)),
        rtol=1e-6,
    )


def test_head_learns_separable_counts():
    """The head must fit an easily separable embedding->count mapping."""
    import optax

    rng = np.random.default_rng(0)
    n_cls, dim, per = 4, 16, 64
    centers = rng.normal(size=(n_cls, dim)) * 4
    xs = np.concatenate(
        [centers[i] + rng.normal(size=(per, dim)) * 0.1 for i in range(n_cls)]
    ).astype(np.float32)
    ys = np.repeat(np.arange(5, 5 + n_cls), per).astype(np.int32)

    head = ac.AtomCountHead(max_n=12, hidden=32)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, dim)))["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = head.apply({"params": p}, jnp.asarray(xs))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(ys)
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    for _ in range(120):
        params, opt, loss = step(params, opt)
    probs = ac.predict_count_probs(head, params, jnp.asarray(xs))
    acc = float((np.asarray(probs).argmax(-1) == ys).mean())
    assert acc > 0.95, acc


def _tiny_config():
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 10
    cfg.sampling.steps = 4
    return cfg


def test_elucidator_count_head_wiring(tmp_path):
    """elucidate(n_atoms=None) with a count head samples head-predicted
    counts and tie-breaks by the predicted probability."""
    cfg = _tiny_config()
    state = Elucidator._skeleton_state(cfg)
    wpath = str(tmp_path / "w.npz")
    warm_state.export_warm_state(state, wpath)
    el = Elucidator.from_warm_state(wpath, config=cfg)

    head = ac.AtomCountHead(max_n=cfg.data.max_node, hidden=16)
    hp = head.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.model.nf)))[
        "params"
    ]
    hpath = str(tmp_path / "head.npz")
    ac.save_head(hpath, hp, max_n=cfg.data.max_node, hidden=16)
    meta = el.load_count_head(hpath)
    assert meta["max_n"] == cfg.data.max_node

    spec = np.abs(np.random.default_rng(0).normal(size=3501)) * 5
    counts, prior = el._predict_counts(el._prepare_context(spec, False))
    assert counts and all(2 <= n <= cfg.data.max_node for n in counts)
    assert set(prior) == set(counts)

    res = el.elucidate(spec, n_atoms=None, num_candidates=8, seed=0)
    assert res.n_atoms is None
    assert len(res.candidates) >= 1
    # every candidate's size is one of the head-predicted counts
    for c in res.candidates:
        assert c.molgraph.n_atoms in counts
