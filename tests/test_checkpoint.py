"""Checkpoint round-trip: full TrainState (params, EMA, optimizer state
incl. adaptive-clip queue, batch stats, step) through orbax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu import checkpoint as ckpt_lib
from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.training import optim as optim_lib
from diffspectra_tpu.training.step import get_step_fn
from diffspectra_tpu.training.train_state import create_train_state
from diffspectra_tpu.utils.scalers import get_data_scaler

from test_training import make_batch, small_config


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = small_config()
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
    state, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))

    ckpt_dir = str(tmp_path / "ckpt")
    ckpt_lib.save_checkpoint(ckpt_dir, jax.device_get(state))

    # restore into a FRESH state: everything must round-trip exactly
    fresh = create_train_state(variables, tx, cfg.model.ema_decay)
    restored = ckpt_lib.restore_checkpoint(ckpt_dir, fresh)
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues identically from the restored state
    s1, l1 = step_fn(state, batch, jax.random.PRNGKey(4))
    s2, l2 = step_fn(restored, batch, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_restore_for_resume_falls_back_to_numbered(tmp_path):
    """A preemption mid-way through the meta save leaves only a ``…-tmp``
    dir; resume must fall back to the latest finalized numbered snapshot
    instead of silently restarting from step 0."""
    cfg = small_config()
    batch = make_batch(jax.random.PRNGKey(0), cfg)
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    tx = optim_lib.get_optimizer(cfg)
    n = cfg.data.max_node
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((4,)), jnp.zeros((4, n, 9)),
        batch["atom_mask"][..., None], batch["edge_mask"], batch["context"],
        edge_x=jnp.zeros((4, n, n, 2)), noise_level=jnp.zeros((4,)),
    )
    state = create_train_state(variables, tx, cfg.model.ema_decay)
    step_fn = jax.jit(get_step_fn(sch, model, tx, get_data_scaler(cfg), cfg))
    state, _ = step_fn(state, batch, jax.random.PRNGKey(2))

    workdir = str(tmp_path)
    ckpt_lib.save_checkpoint(
        ckpt_lib.numbered_checkpoint_dir(workdir, 2), jax.device_get(state)
    )
    ckpt_lib.save_checkpoint(
        ckpt_lib.numbered_checkpoint_dir(workdir, 7), jax.device_get(state)
    )
    # simulate the interrupted meta save: only a -tmp directory exists
    import os

    os.makedirs(
        os.path.join(workdir, "checkpoints-meta",
                     "checkpoint.orbax-checkpoint-tmp")
    )
    assert ckpt_lib.latest_numbered_checkpoint(workdir) == 7

    fresh = create_train_state(variables, tx, cfg.model.ema_decay)
    restored = ckpt_lib.restore_for_resume(workdir, fresh)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # with a finalized meta checkpoint present, meta wins
    state2, _ = step_fn(restored, batch, jax.random.PRNGKey(3))
    ckpt_lib.save_checkpoint(
        ckpt_lib.meta_checkpoint_dir(workdir), jax.device_get(state2)
    )
    restored2 = ckpt_lib.restore_for_resume(workdir, fresh)
    assert int(restored2.step) == 2


def test_restore_missing_returns_input(tmp_path):
    cfg = small_config()
    batch = make_batch(jax.random.PRNGKey(0), cfg)
    model = DMT.from_config(cfg)
    tx = optim_lib.get_optimizer(cfg)
    n = cfg.data.max_node
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((4,)), jnp.zeros((4, n, 9)),
        batch["atom_mask"][..., None], batch["edge_mask"], batch["context"],
        edge_x=jnp.zeros((4, n, n, 2)), noise_level=jnp.zeros((4,)),
    )
    state = create_train_state(variables, tx, 0.999)
    out = ckpt_lib.restore_checkpoint(str(tmp_path / "nope" / "ckpt"), state)
    assert out is state


def test_save_checkpoint_if_finite_refuses_nan_state(tmp_path):
    """The finiteness guard (r4 allspectra post-mortem: NaN params were
    checkpointed over the good preemption state for 4k+ steps)."""
    import jax.numpy as jnp
    import numpy as np

    from diffspectra_tpu import checkpoint as ckpt_lib

    good = {"params": {"w": jnp.ones((3,))}, "step": jnp.asarray(5)}
    d = str(tmp_path / "meta" / "ckpt")
    assert ckpt_lib.save_checkpoint_if_finite(d, good)
    restored = ckpt_lib.restore_checkpoint(d, good)
    assert int(restored["step"]) == 5

    bad = {
        "params": {"w": jnp.array([1.0, np.nan, 2.0])},
        "step": jnp.asarray(6),
    }
    assert not ckpt_lib.save_checkpoint_if_finite(d, bad)
    # the good checkpoint is untouched
    restored = ckpt_lib.restore_checkpoint(d, good)
    assert int(restored["step"]) == 5
    assert np.all(np.isfinite(np.asarray(restored["params"]["w"])))

    inf_state = {
        "params": {"w": jnp.array([np.inf, 0.0, 0.0])},
        "step": jnp.asarray(7),
    }
    assert not ckpt_lib.state_is_finite(inf_state)
    # integer leaves never trip the guard
    assert ckpt_lib.state_is_finite(
        {"step": jnp.asarray(2**31 - 1), "w": jnp.zeros((2,))}
    )
