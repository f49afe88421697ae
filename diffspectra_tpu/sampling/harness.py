"""Conditional sampling harnesses: draw real spectra + true atom counts from
a dataset split, run the on-device reverse diffusion, decode molecules.

Rewrite of ref sampling.py:148-550 (``get_sampling_fn`` /
``get_cond_sampling_eval_fn``). Differences by design:

- masks are built for the fixed ``data.max_node`` N instead of the
  per-round max (static shapes; mask-invariant numerics),
- the reverse loop is one jitted ``lax.scan`` (no per-step host dispatch),
- spectra are encoded once per round, not once per step,
- the eval permutation is fixed with seed 42 like the reference
  (ref sampling.py:387), via numpy instead of torch.

Ground truth returned per molecule: (positions, atom_type, edge_type, fc)
numpy tuples (the RDKit mol objects of the reference are reconstructed
host-side by the evaluation stack when RDKit is available).
"""

from __future__ import annotations

import logging
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dmt import encode_context
from ..utils import masks as M
from ..utils.scalers import get_self_cond_fn
from .ancestral import AncestralSampler, make_time_steps
from .decode import mol_process, post_process


def _gather_context(rows, spectra_version):
    if spectra_version == "allspectra":
        return tuple(rows[k] for k in ("uv", "ir", "raman"))
    return rows[spectra_version]


def make_cond_sampling_fn(
    config,
    model,
    noise_scheduler,
    batch_size: int,
    n_samples: int,
    inverse_scaler,
    ds,
    eps: float = 1e-3,
    fixed_seed: Optional[int] = 42,
    sampling_temperature: Optional[float] = None,
    mesh=None,
):
    """Returns ``sampling_fn(variables, rng) -> (pred_mols, gt_pos, gt_mols)``.

    ``fixed_seed=42`` reproduces the eval harness (ref sampling.py:387);
    pass ``None`` for the training-snapshot variant (fresh permutation per
    call, ref sampling.py:180).

    ``mesh``: fan the sweep out over a data mesh (SURVEY §2.12) — parameters
    replicated, each chip runs the reverse-diffusion scan on its
    ``batch_size / n_dev`` shard of the round with a decorrelated key;
    results gather on host. ``batch_size`` stays the GLOBAL round size.
    """
    atom_types = config.data.atom_types
    include_fc = bool(config.model.include_fc_charge)
    node_nf = atom_types + int(include_fc)
    pred_edge = config.pred_edge
    edge_nf = config.model.edge_ch
    compress_edge = config.data.compress_edge
    self_cond = config.model.self_cond
    only_2d = config.only_2D
    spectra_version = config.data.spectra_version
    max_n = config.data.max_node
    steps = config.sampling.steps
    if sampling_temperature is None:
        sampling_temperature = 1.0
    sampler_kwargs = {}
    if config.sampling.method == "ancestral":
        sampler_cls = AncestralSampler
    elif config.sampling.method in ("dpm_solver", "dpm_solver_sde"):
        # DPM-Solver++(2M): fast solver, 10-20x fewer steps (TPU-native
        # addition — see sampling/dpm_solver.py). The _sde variant re-injects
        # noise per step (SDE-DPM-Solver++), trading determinism for the
        # diversity/3D quality the ODE path loses at low step counts.
        from .dpm_solver import DPMSolverPP

        sampler_cls = DPMSolverPP
        sampler_kwargs["stochastic"] = config.sampling.method == "dpm_solver_sde"
    else:
        raise ValueError("Invalid sampling method!")

    time_steps = make_time_steps(noise_scheduler, steps, eps)
    sampler = sampler_cls(
        noise_scheduler,
        time_steps,
        config.model.pred_data,
        pred_edge=pred_edge,
        self_cond=self_cond,
        cond_process_fn=get_self_cond_fn(config),
        sampling_temperature=sampling_temperature,
        only_2d=only_2d,
        **sampler_kwargs,
    )
    num_rounds = int(math.ceil(n_samples / batch_size))
    # int() each entry: a shell-quoting mishap can deliver the STRING
    # "'(17,29)'" here, which sorted() silently turns into a tuple of
    # characters and searchsorted then mis-indexes (found via the round-3
    # rehearsal) — fail loudly instead
    bucket_sizes = tuple(
        sorted(int(b) for b in config.eval.get("bucket_sizes", ()))
    ) or (max_n,)
    if bucket_sizes[-1] < max_n:
        raise ValueError(
            f"eval.bucket_sizes {bucket_sizes} must cover data.max_node "
            f"{max_n} (largest bucket is the fallback pad)"
        )

    def _round(variables, rng, context, n_nodes, n_pad):
        """One jitted sampling round for a fixed (local batch, n_pad)."""
        bs = n_nodes.shape[0]  # per-chip size under the mesh, else batch_size
        node_mask, edge_mask = M.build_masks(n_nodes, n_pad)
        k_z, k_e, k_s = jax.random.split(rng, 3)
        if only_2d:
            z = M.sample_gaussian_with_mask(
                k_z, (bs, n_pad, node_nf), node_mask
            )
        else:
            z = M.sample_combined_position_feature_noise(
                k_z, bs, n_pad, node_nf, node_mask
            )
        edge_z = M.sample_symmetric_edge_feature_noise(
            k_e, bs, n_pad, edge_nf, edge_mask
        )

        ctx_emb = encode_context(model, variables, context)

        def model_apply(t, x, nm, em, edge_x, nl, cond_x, cond_edge_x, has_cond, c_emb):
            return model.apply(
                variables, t, x, nm, em, None,
                edge_x=edge_x, noise_level=nl, cond_x=cond_x,
                cond_edge_x=cond_edge_x, has_cond=has_cond, context_emb=c_emb,
            )

        x_node, x_edge = sampler.sampling(
            model_apply, k_s, z, node_mask, edge_mask, edge_z, ctx_emb
        )
        return post_process(
            x_node, atom_types, include_fc, node_mask, inverse_scaler,
            x_edge, edge_mask, compress_edge, has_positions=not only_2d,
        )

    n_shards = 1 if mesh is None else int(mesh.devices.size)
    if n_shards > 1:
        assert batch_size % n_shards == 0, (
            f"eval batch {batch_size} must divide over {n_shards} chips"
        )
        from functools import partial

        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _round_shard(variables, rng, context, n_nodes, *, n_pad):
            # decorrelate per-chip noise draws
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            return _round(variables, rng, context, n_nodes, n_pad)

        _per_pad = {}

        def round_jit(variables, rng, context, n_nodes, n_pad):
            if n_pad not in _per_pad:
                _per_pad[n_pad] = jax.jit(
                    shard_map(
                        partial(_round_shard, n_pad=n_pad),
                        mesh=mesh,
                        in_specs=(P(), P(), P("data"), P("data")),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                )
            return _per_pad[n_pad](variables, rng, context, n_nodes)

        _replicated = NamedSharding(mesh, P())
    else:
        round_jit = jax.jit(_round, static_argnames=("n_pad",))
        _replicated = None

    def sampling_fn(variables, rng):
        # Upload parameters ONCE for the whole sweep. Callers hand over host
        # (numpy) EMA variables; without this, every round's jit call
        # re-transfers the full parameter tree host->device — measured at
        # ~3.5s/round through this environment's tunneled TPU link, which
        # dwarfed the actual 1000-step scan (8.2s at N=29, batch 128).
        # Under a mesh the upload replicates across chips.
        variables = jax.device_put(variables, _replicated)
        n = len(ds)
        if fixed_seed is not None:
            perm = np.random.default_rng(fixed_seed).permutation(n)
        else:
            seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
            perm = np.random.default_rng(seed).permutation(n)

        # the drawn sample sequence (with wrap-around to full rounds)
        total = num_rounds * batch_size
        drawn = perm[np.arange(total) % n]
        drawn_sizes = ds.arrays["num_atom"][ds.indices[drawn]]
        # Sort-and-pack rounds: draws sorted by atom count, chunked into
        # exactly ceil(total/batch) rounds, each round padded to the
        # smallest configured bucket that fits its largest molecule
        # (config.eval.bucket_sizes; default = one bucket at max_node).
        # Strictly fewer rounds than per-bucket partitioning (round 3: the
        # old scheme wrap-padded a partial final batch PER BUCKET — ~16% of
        # device rounds wasted at the 1280-mol bench size). Compiled
        # executables stay one-per-bucket. Results are restored to draw
        # order below so the output ordering matches the unbucketed
        # harness.
        order = np.argsort(drawn_sizes, kind="stable")

        processed: List = [None] * total
        gt_pos: List = [None] * total
        gt_mols: List = [None] * total
        n_generated = 0

        def decode(pending):
            """Host decode of a finished round (runs while the next round's
            device work is already dispatched — JAX async dispatch pipelines
            host decode with device sampling)."""
            nonlocal n_generated
            out, data, sel = pending
            if pred_edge:
                pos, one_hot, fc, edge_types = out
                mols = mol_process(one_hot, pos, fc, data["num_atom"], edge_types)
            else:
                pos, one_hot, fc = out
                mols = mol_process(one_hot, pos, fc, data["num_atom"])
            n_generated += len(set(sel.tolist()))
            # per-round progress (ref sampling.py:260)
            logging.info("Generate %d, Total %d.", n_generated, n_samples)
            for i, dst in enumerate(sel):
                dst = int(dst)
                if processed[dst] is not None:
                    continue  # wrap-padding duplicate
                processed[dst] = mols[i]
                na = int(data["num_atom"][i])
                gt_pos[dst] = np.asarray(data["positions"][i][:na])
                gt_mols[dst] = (
                    np.asarray(data["positions"][i][:na]),
                    np.asarray(data["atom_type"][i][:na]),
                    np.asarray(data["edge_type"][i][:na, :na]),
                    np.asarray(data["formal_charges"][i][:na, 0]).astype(np.int64),
                )

        pending = None
        for start in range(0, total, batch_size):
            sel = order[start : start + batch_size]
            if len(sel) < batch_size:  # wrap to keep static shapes
                sel = np.concatenate(
                    [sel, np.repeat(sel[-1], batch_size - len(sel))]
                )[:batch_size]
            n_pad = bucket_sizes[
                int(np.searchsorted(bucket_sizes, drawn_sizes[sel].max()))
            ]
            rows = drawn[sel]
            data = ds.take(rows)
            data = {
                k: (
                    v[:, :n_pad] if k in ("positions", "atom_one_hot", "atom_type", "formal_charges")
                    else v[:, :n_pad, :n_pad] if k in ("edge_one_hot", "edge_type")
                    else v
                )
                for k, v in data.items()
            }
            context = _gather_context(data, spectra_version)
            n_nodes = jnp.asarray(data["num_atom"])

            rng, k = jax.random.split(rng)
            out = round_jit(variables, k, context, n_nodes, n_pad=int(n_pad))
            if pending is not None:
                decode(pending)
            pending = (out, data, sel)
        if pending is not None:
            decode(pending)
        return processed[:n_samples], gt_pos[:n_samples], gt_mols[:n_samples]

    return sampling_fn
