"""Data-parallel tests on the 8-device virtual CPU mesh: the shard_map
train step must match the single-device step exactly (same global batch,
same per-shard noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.parallel import create_mesh, make_parallel_train_step, replicate, shard_batch
from diffspectra_tpu.training import optim as optim_lib
from diffspectra_tpu.training.step import get_step_fn
from diffspectra_tpu.training.train_state import create_train_state
from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils.scalers import get_data_scaler

from test_training import make_batch, small_config


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_parallel_step_runs_and_matches_replicated_semantics():
    cfg = small_config()
    cfg.model.self_cond = False  # avoid per-shard bernoulli divergence in this test
    bs = 16  # 2 per device
    batch = make_batch(jax.random.PRNGKey(1), cfg, bs=bs)

    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)
    tx = optim_lib.get_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    n = cfg.data.max_node
    variables = model.init(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, 9)),
        batch["atom_mask"][..., None], batch["edge_mask"], batch["context"],
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )
    state = create_train_state(variables, tx, cfg.model.ema_decay)

    mesh = create_mesh()
    pstep = make_parallel_train_step(
        get_step_fn(sch, model, tx, scaler, cfg, train=True, axis_name="data"),
        mesh,
    )
    state_r = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)

    rng = jax.random.PRNGKey(7)
    new_state, loss = pstep(state_r, batch_s, rng)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1

    # one more step to ensure optimizer state shards stay consistent
    new_state2, loss2 = pstep(new_state, batch_s, rng)
    assert np.isfinite(float(loss2))
    assert int(new_state2.step) == 2

    # parameters stay replicated (single logical value)
    leaf = jax.tree_util.tree_leaves(new_state2.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_sampling_mesh_batch_contract():
    """_sampling_mesh: divisible batches pass through, indivisible round
    DOWN (keeping the fan-out), and batches below the device count disable
    the fan-out instead of silently growing the batch."""
    from diffspectra_tpu.run_lib import _sampling_mesh

    mesh = create_mesh(8)
    n = mesh.devices.size
    assert n == 8  # conftest forces the 8-device virtual CPU mesh

    m, b = _sampling_mesh(mesh, 128)
    assert m is mesh and b == 128
    m, b = _sampling_mesh(mesh, 100)
    assert m is mesh and b == 96  # rounded down, multiple of 8
    m, b = _sampling_mesh(mesh, 4)
    assert m is None and b == 4  # below device count: single-device path

    single = create_mesh(1)
    m, b = _sampling_mesh(single, 100)
    assert m is None and b == 100
