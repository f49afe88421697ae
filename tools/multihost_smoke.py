"""Multi-host DP smoke: N processes x M virtual CPU devices each.

Validates the multi-host device-store path end-to-end (SURVEY §2.12 DCN
scope): per-process shard uploads (``DeviceStore`` with a cross-process
mesh), replicated-consistent index vectors (``global_index_array``), and the
jitted shard_map train step with gloo-backed collectives.

Launched by tests/test_multihost.py as:

    python tools/multihost_smoke.py <proc_id> <n_procs> <devs_per_proc> <port>

Every process must print ``MULTIHOST OK loss=<x>`` with identical loss.
"""

import os
import sys

proc_id, n_procs, devs, port = (int(a) for a in sys.argv[1:5])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
os.environ.pop("JAX_PLATFORM_NAME", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffspectra_tpu.configs import smoke  # noqa: E402
from diffspectra_tpu.data import get_dataset  # noqa: E402
from diffspectra_tpu.data.device_store import (  # noqa: E402
    DeviceStore, global_index_array, make_sharded_store_step,
    sharded_bucket_index_iterator, sharded_index_iterator,
)
from diffspectra_tpu.diffusion import NoiseScheduleVP  # noqa: E402
from diffspectra_tpu.models.dmt import DMT  # noqa: E402
from diffspectra_tpu.parallel import create_mesh, replicate  # noqa: E402
from diffspectra_tpu.training import optim as optim_lib  # noqa: E402
from diffspectra_tpu.training.step import get_step_fn  # noqa: E402
from diffspectra_tpu.training.train_state import create_train_state  # noqa: E402
from diffspectra_tpu.utils.scalers import get_data_scaler  # noqa: E402


def main():
    n_dev = n_procs * devs
    assert len(jax.devices()) == n_dev, (len(jax.devices()), n_dev)

    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 8
    cfg.data.synthetic_size = 64

    n = cfg.data.max_node
    key = jax.random.PRNGKey(0)
    _, second, _, _, _ = get_dataset(cfg)

    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    tx = optim_lib.get_optimizer(cfg)
    bs = 2 * n_dev
    from diffspectra_tpu.utils import masks as M

    n_nodes = jnp.full((bs,), n - 1)
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    variables = jax.jit(model.init)(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, 9)), node_mask, edge_mask,
        jnp.abs(jax.random.normal(key, (bs, 3501))),
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )
    state = create_train_state(variables, tx, cfg.model.ema_decay)

    mesh = create_mesh(n_dev)
    assert {d.process_index for d in mesh.devices.flat} == set(range(n_procs))

    store = DeviceStore(second, cfg.data.spectra_version, mesh=mesh)
    axis_step = get_step_fn(sch, model, tx, get_data_scaler(cfg), cfg, True, "data")
    pstep = make_sharded_store_step(
        axis_step, mesh, atom_types=cfg.data.atom_types,
        include_aromatic=cfg.data.include_aromatic,
        spectra_keys=tuple(store.spectra_keys),
        aug_rotation=True, aug_translation=True,
        aug_translation_scale=cfg.data.aug_translation_scale,
    )
    state = replicate(mesh, state)
    losses = []
    it = sharded_index_iterator(store.shard_size, n_dev, 2, seed=0)
    for step, idx in zip(range(2), it):
        gidx = global_index_array(mesh, np.asarray(idx))
        state, loss = pstep(state, store.arrays(), gidx, jax.random.PRNGKey(step))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 2

    # bucketed padding across hosts: each process independently derives the
    # SAME (n_pad, idx) schedule from the replicated host_num_atom vector —
    # no collective — so the per-bucket shard_map programs stay in lockstep
    n_pad, bidx = next(iter(sharded_bucket_index_iterator(
        store.host_num_atom, store.shard_size, n_dev, 2,
        bucket_sizes=(6, cfg.data.max_node), seed=0,
    )))
    gidx = global_index_array(mesh, np.asarray(bidx))
    state, bloss = pstep(state, store.arrays(), gidx, jax.random.PRNGKey(9),
                         n_pad=n_pad)
    bloss = float(bloss)
    assert np.isfinite(bloss), bloss
    assert int(state.step) == 3

    # process-local sampling fan-out: under multi-host, _sampling_mesh hands
    # back a mesh over THIS process's devices; every process runs the same
    # seeded sweep on its own chips and must get identical molecules (the
    # test compares the digest line across processes)
    from diffspectra_tpu import run_lib
    from diffspectra_tpu.sampling.harness import make_cond_sampling_fn
    from diffspectra_tpu.utils.scalers import get_data_inverse_scaler

    smesh, sbatch = run_lib._sampling_mesh(mesh, devs)
    assert smesh is not None and int(smesh.devices.size) == devs
    assert all(d.process_index == proc_id for d in smesh.devices.flat)
    cfg.sampling.steps = 2
    sfn = make_cond_sampling_fn(
        cfg, model, sch, sbatch, sbatch,
        get_data_inverse_scaler(cfg), second, mesh=smesh,
    )
    mols, _, _ = sfn(jax.device_get(variables), jax.random.PRNGKey(5))
    digest = float(sum(float(np.asarray(m[1]).sum()) for m in mols))

    print(
        f"MULTIHOST OK loss={losses[-1]:.6f} bucketed(n_pad={n_pad})"
        f"={bloss:.6f} sample_digest={digest:.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
