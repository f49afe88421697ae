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
    return jax.jit(sharded)


def make_parallel_sample_fn(sample_fn, mesh: Mesh, axis_name: str = "data"):
    """Shard a pure sampling function ``(rng, *batch_arrays) -> outputs`` over
    the mesh batch axis; each chip runs its reverse-diffusion shard with a
    decorrelated key."""

    def wrapped(rng, *args):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        return sample_fn(rng, *args)

    n_in = None  # determined by call site; shard all array args on axis 0

    def call(rng, *args):
        specs_in = (P(),) + tuple(P(axis_name) for _ in args)
        sharded = shard_map(
            wrapped,
            mesh=mesh,
            in_specs=specs_in,
            out_specs=P(axis_name),
            check_vma=False,
        )
        return jax.jit(sharded)(rng, *args)

    return call
