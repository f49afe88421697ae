"""shard_map data-parallel training and sampling over the device mesh.

The program shape (SURVEY §2.12): per-chip batch shards, replicated
parameters/optimizer/EMA, ``pmean`` gradient all-reduce over ICI. The same
pattern fans the 10k-molecule sampling sweep out over chips (each chip runs
its reverse-diffusion shard independently; results gather on host).
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_parallel_train_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Wrap a step built with ``get_step_fn(..., axis_name=axis_name)`` into a
    jitted shard_map program: state replicated, batch sharded on axis 0."""
    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # donate the train state: params/opt/EMA buffers are rewritten every
    # step, and the aliasing saves a full state copy (~4x params bytes of
    # HBM traffic) per step
    return jax.jit(sharded, donate_argnums=(0,))


def make_parallel_store_step(store_step, mesh: Mesh, axis_name: str = "data"):
    """shard_map wrapper for the device-store train step: state replicated,
    store arrays AND the index vector sharded on the data axis, so each chip
    assembles its batch from its LOCAL dataset shard with shard-local
    indices (see data/device_store.py::sharded_index_iterator). Per-step
    host->device traffic is one [n_dev * per_dev_batch] int32 vector."""
    sharded = shard_map(
        store_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


# Sampling fan-out over the mesh lives in sampling/harness.py
# (make_cond_sampling_fn(mesh=...)): per-chip reverse-diffusion shards with
# decorrelated keys, parameters replicated, results gathered on host.
