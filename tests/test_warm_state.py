"""Warm-state export/restore (diffspectra_tpu/warm_state.py): the compact
bf16 npz that carries a training campaign across machines via git."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu import warm_state
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.training import optim as optim_lib
from diffspectra_tpu.training.step import get_step_fn
from diffspectra_tpu.training.train_state import create_train_state
from diffspectra_tpu.utils.scalers import get_data_scaler

from test_training import make_batch, small_config


def _trained_state(cfg, n_steps=3):
    batch = make_batch(jax.random.PRNGKey(0), cfg)
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    tx = optim_lib.get_optimizer(cfg)
    n = cfg.data.max_node
    bs = 4
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((bs,)), jnp.zeros((bs, n, 9)),
        batch["atom_mask"][..., None], batch["edge_mask"], batch["context"],
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )
    state = create_train_state(variables, tx, cfg.model.ema_decay)
    step_fn = jax.jit(get_step_fn(sch, model, tx, get_data_scaler(cfg), cfg))
    for i in range(n_steps):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(2 + i))
    fresh = create_train_state(variables, tx, cfg.model.ema_decay)
    return state, fresh, step_fn, batch


def test_warm_state_roundtrip(tmp_path):
    cfg = small_config()
    state, fresh, step_fn, batch = _trained_state(cfg)
    path = str(tmp_path / "warm.npz")
    warm_state.export_warm_state(
        jax.device_get(state), path, meta={"spectra_version": "ir"}
    )

    restored = warm_state.load_warm_state(fresh, path)
    assert int(restored.step) == int(state.step)
    assert int(restored.ema.num_updates) == int(state.ema.num_updates)

    # float params round-trip to bf16 precision; everything keeps the
    # model's dtypes (restored state is step-function compatible)
    from flax import traverse_util

    want = traverse_util.flatten_dict(jax.device_get(state.params), sep="/")
    got = traverse_util.flatten_dict(restored.params, sep="/")
    assert set(want) == set(got)
    for path in want:
        a, b = np.asarray(want[path]), np.asarray(got[path])
        assert a.dtype == b.dtype, path
        np.testing.assert_allclose(a, b, atol=0.0, rtol=8e-3, err_msg=path)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.ema.shadow_params)),
        jax.tree_util.tree_leaves(restored.ema.shadow_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-3)

    # optimizer state is FRESH (Adam moments rebuild), but the train step
    # runs and the loss is finite — a warm start is trainable immediately
    s2, loss = step_fn(restored, batch, jax.random.PRNGKey(99))
    assert np.isfinite(float(loss))
    assert int(s2.step) == int(state.step) + 1


def test_warm_state_rejects_mismatched_model(tmp_path):
    cfg = small_config()
    state, _, _, _ = _trained_state(cfg, n_steps=1)
    path = str(tmp_path / "warm.npz")
    warm_state.export_warm_state(jax.device_get(state), path)

    cfg2 = small_config()
    cfg2.model.n_layers = cfg.model.n_layers + 1
    _, fresh2, _, _ = _trained_state(cfg2, n_steps=0)
    with pytest.raises(ValueError, match="keys do not match"):
        warm_state.load_warm_state(fresh2, path)


def test_train_pipeline_consumes_warm_start(tmp_path):
    """run_lib.train with training.warm_start set and an empty workdir must
    start from the warm step (regression for the wiring, not the math)."""
    from diffspectra_tpu import run_lib
    from diffspectra_tpu.configs import smoke

    cfg = smoke.get_config()
    cfg.training.n_iters = 2
    cfg.training.snapshot_freq = 2
    cfg.training.snapshot_freq_for_preemption = 2
    cfg.training.snapshot_sampling = False
    cfg.data.device_resident = False

    wd1 = str(tmp_path / "run1")
    run_lib.train(cfg, None, wd1)

    import os

    from diffspectra_tpu import checkpoint as ckpt_lib
    from diffspectra_tpu.data.pipeline import get_batch_iterator, get_dataset

    cfg_r = run_lib.resolve_runtime_config(cfg, 1)
    _, train_ds, _, _, _ = get_dataset(cfg_r)
    batch = next(
        get_batch_iterator(train_ds, 8, cfg_r.data.spectra_version, shuffle=False)
    )
    _, _, fresh = run_lib._init_model_and_state(cfg_r, batch, jax.random.PRNGKey(0))
    trained = ckpt_lib.restore_for_resume(wd1, fresh)
    # the loop runs steps range(0, n_iters+1) and state.step increments past
    # the loop variable, so a fresh n_iters=2 run ends with state.step == 3
    assert int(trained.step) == 3
    warm_path = str(tmp_path / "warm.npz")
    warm_state.export_warm_state(trained, warm_path)

    cfg.training.warm_start = warm_path
    cfg.training.n_iters = 3
    cfg.training.snapshot_freq = 3
    cfg.training.snapshot_freq_for_preemption = 3
    wd2 = str(tmp_path / "run2")
    run_lib.train(cfg, None, wd2)
    # the second run warm-started at step 3, ran the single loop step 3
    # (range(3, n_iters+1)), and saved checkpoint_1 (= 3 // snapshot_freq)
    assert os.path.isdir(os.path.join(wd2, "checkpoints", "checkpoint_1"))
    _, _, fresh2 = run_lib._init_model_and_state(cfg_r, batch, jax.random.PRNGKey(0))
    resumed = ckpt_lib.restore_for_resume(wd2, fresh2)
    assert int(resumed.step) == 4


def test_warm_state_partial_restore_cross_model(tmp_path):
    """partial=True restores intersecting same-shape leaves and keeps the
    fresh init for the rest — the cross-spectra warm start (allspectra
    model from an IR-only campaign; ref models/dmt.py:268-303 semantics)."""
    from flax import traverse_util

    cfg = small_config()
    state, _, _, _ = _trained_state(cfg, n_steps=1)
    path = str(tmp_path / "warm.npz")
    warm_state.export_warm_state(jax.device_get(state), path)

    # a model whose tree differs: one extra block (stacked-leaf shapes
    # change) — the strict loader rejects it, the partial loader restores
    # the shape-compatible leaves (heads, encoders) and keeps fresh blocks
    cfg2 = small_config()
    cfg2.model.n_layers = cfg.model.n_layers + 1
    _, fresh2, step_fn2, batch2 = _trained_state(cfg2, n_steps=0)
    restored = warm_state.load_warm_state(fresh2, path, partial=True)
    assert int(restored.step) == int(state.step)

    want = traverse_util.flatten_dict(jax.device_get(state.params), sep="/")
    got = traverse_util.flatten_dict(restored.params, sep="/")
    fresh_flat = traverse_util.flatten_dict(
        jax.device_get(fresh2.params), sep="/"
    )
    restored_leaves = 0
    for p in got:
        if p in want and np.asarray(want[p]).shape == np.asarray(got[p]).shape:
            np.testing.assert_allclose(
                np.asarray(got[p]), np.asarray(want[p]), rtol=8e-3,
                err_msg=p,
            )
            restored_leaves += 1
        else:
            np.testing.assert_array_equal(
                np.asarray(got[p]), np.asarray(fresh_flat[p]), err_msg=p
            )
    assert restored_leaves > 0

    # and it trains
    s2, loss = step_fn2(restored, batch2, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_warm_state_partial_restore_nothing_raises(tmp_path):
    cfg = small_config()
    state, fresh, _, _ = _trained_state(cfg, n_steps=1)
    path = str(tmp_path / "warm.npz")
    warm_state.export_warm_state(jax.device_get(state), path)
    # an npz with disjoint keys: simulate by loading into a tree whose
    # flattened paths can never match (prefix-scrambled copy)
    import numpy as _np

    raw = dict(_np.load(path))
    scrambled = {
        (k.replace("params/", "params/zz_", 1)
         if k.startswith(("bf16:params/", "raw:params/"))
         else k): v
        for k, v in raw.items()
    }
    p2 = str(tmp_path / "scrambled.npz")
    _np.savez(p2, **scrambled)
    with pytest.raises(ValueError, match="restored nothing"):
        warm_state.load_warm_state(fresh, p2, partial=True)


def test_warm_state_partial_zero_fresh(tmp_path):
    """zero_fresh patterns zero the matching NON-restored leaves (the
    boundary zero-gate from the r4 allspectra NaN post-mortem: a fresh
    SpecFormer head kernel behind a trained trunk must start at zero so the
    context embedding begins at the trained distribution's centre)."""
    from flax import traverse_util

    cfg = small_config()
    state, _, _, _ = _trained_state(cfg, n_steps=1)
    path = str(tmp_path / "warm.npz")
    warm_state.export_warm_state(jax.device_get(state), path)

    # cross-spectra target: allspectra model — fresh patch embedders
    # (W_P_0/W_P_2/W_pos_*) and a shape-mismatched flatten-head kernel
    cfg2 = small_config()
    cfg2.data.spectra_version = "allspectra"
    _, fresh2, step_fn2, batch2 = _trained_state_allspectra(cfg2)
    restored = warm_state.load_warm_state(
        fresh2, path, partial=True,
        zero_fresh=("cond_encoder/head_linear/kernel",),
    )

    got = traverse_util.flatten_dict(jax.device_get(restored.params), sep="/")
    want = traverse_util.flatten_dict(jax.device_get(state.params), sep="/")
    head = got["cond_encoder/head_linear/kernel"]
    # the head kernel was shape-mismatched (more patches) -> fresh -> zeroed
    assert head.shape != np.asarray(
        want["cond_encoder/head_linear/kernel"]
    ).shape
    assert np.all(np.asarray(head) == 0.0)
    # restored leaves are untouched by zero_fresh
    np.testing.assert_allclose(
        np.asarray(got["cond_encoder/head_linear/bias"]),
        np.asarray(want["cond_encoder/head_linear/bias"]), rtol=8e-3,
    )
    # non-matching fresh leaves keep their random init (not zeroed)
    fresh_flat = traverse_util.flatten_dict(
        jax.device_get(fresh2.params), sep="/"
    )
    w_p0 = [p for p in got if "W_P_0/kernel" in p]
    assert w_p0 and not np.all(np.asarray(got[w_p0[0]]) == 0.0)
    np.testing.assert_array_equal(
        np.asarray(got[w_p0[0]]), np.asarray(fresh_flat[w_p0[0]])
    )

    # the cross-spectra warm start trains with a finite loss from step one
    s2, loss = step_fn2(restored, batch2, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))


def _trained_state_allspectra(cfg):
    """Fresh allspectra-model state + step_fn + batch (tiny shapes)."""
    from diffspectra_tpu.data.synthetic import SPEC_LENS

    batch = make_batch(jax.random.PRNGKey(0), cfg)
    bs = batch["atom_mask"].shape[0]
    batch = dict(batch)
    batch["context"] = tuple(
        jnp.abs(jax.random.normal(jax.random.PRNGKey(9 + i), (bs, L)))
        for i, L in enumerate(
            [SPEC_LENS["uv"], SPEC_LENS["ir"], SPEC_LENS["raman"]]
        )
    )
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    tx = optim_lib.get_optimizer(cfg)
    n = cfg.data.max_node
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((bs,)), jnp.zeros((bs, n, 9)),
        batch["atom_mask"][..., None], batch["edge_mask"], batch["context"],
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )
    state = create_train_state(variables, tx, cfg.model.ema_decay)
    step_fn = jax.jit(get_step_fn(sch, model, tx, get_data_scaler(cfg), cfg))
    return None, state, step_fn, batch
