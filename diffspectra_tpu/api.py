"""Standalone structure-elucidation API: spectra in, ranked molecules out.

The reference exposes structure elucidation only through its research eval
pipeline (ref run_lib.py:297-443 + sampling.py:382-427: draw targets from a
dataset, score against ground truth). A user with a *measured* spectrum and
no ground-truth molecule has no entry point. This module provides one:

    from diffspectra_tpu.api import Elucidator
    el = Elucidator.from_warm_state("artifacts/warm_qm9s_ir.npz")
    result = el.elucidate(ir_spectrum, n_atoms=19, num_candidates=10)
    for c in result.candidates:
        print(c.frequency, c.smiles or c.molgraph.wl_hash())

Candidates are ranked by **consensus** (sampling frequency over the K
conditional draws — `evaluation.compute_metrics.consensus_rank`): the mode
of repeated draws is the principled single answer, and the ranked list is
the Top-K candidate set (the reference's Top-1/Top-10 headline protocol,
ref README.md:15).

Implementation notes (TPU):
- all K draws for one spectrum run as ONE batched reverse-diffusion scan
  (the spectrum context is tiled K-ways), so a 10-candidate elucidation
  costs one sampler call;
- the jitted round is cached per (num_candidates, n_pad) — repeated queries
  at the same shape reuse the compiled executable;
- raw spectra are normalised with the training transform's log10(x+1)
  (data/transform.py, ref build_dataset.py:141-148) unless
  ``normalized=True`` is passed.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .data.info import get_dataset_info
from .diffusion.schedule import NoiseScheduleVP
from .evaluation import compute_metrics as cm
from .evaluation.molgraph import MolGraph, from_decoded
from .models.dmt import encode_context
from .models.specformer import SPECTRUM_LENGTHS, used_spectra_indices
from .sampling.ancestral import AncestralSampler, make_time_steps
from .sampling.decode import mol_process, post_process
from .utils import masks as M
from .utils.scalers import get_data_inverse_scaler, get_self_cond_fn

SpectraInput = Union[np.ndarray, Sequence[np.ndarray], dict]


@dataclasses.dataclass
class Candidate:
    """One distinct elucidated structure."""

    molgraph: MolGraph
    count: int  # draws that produced this structure
    frequency: float  # count / num_candidates
    first_draw: int  # index of the first draw that produced it
    smiles: Optional[str]  # canonical SMILES when RDKit is available
    positions: Optional[np.ndarray]  # [n_atoms, 3] conformer of first draw


@dataclasses.dataclass
class ElucidationResult:
    candidates: List[Candidate]  # consensus-ranked, best first
    num_draws: int
    # the atom count the draws were conditioned on; None when the count was
    # MARGINALIZED over the histogram prior (each candidate then carries its
    # own size via candidate.molgraph)
    n_atoms: Optional[int]

    @property
    def best(self) -> Optional[Candidate]:
        return self.candidates[0] if self.candidates else None


def _default_config():
    from .configs import diffspectra_qm9s

    return diffspectra_qm9s.get_config()


def _canonical_smiles(mg: MolGraph) -> Optional[str]:
    try:
        from rdkit import Chem

        from .evaluation.molgraph import to_rdkit

        mol = to_rdkit(mg)
        Chem.SanitizeMol(mol)
        return Chem.MolToSmiles(mol, canonical=True)
    except Exception:
        return None


class Elucidator:
    """Conditional-diffusion structure elucidation from spectra.

    Construct via :meth:`from_warm_state` (a committed ``.npz`` from
    ``tools/export_warm_state.py``) or :meth:`from_workdir` (an Orbax
    training workdir). Inference always uses the EMA parameters — the same
    weights the eval pipeline scores (ref run_lib.py:331-334 semantics).
    """

    def __init__(self, config, variables, overrides: Optional[dict] = None):
        from .run_lib import _inference_model, resolve_runtime_config

        config = resolve_runtime_config(config, 1)
        if overrides:
            with config.unlocked():
                for dotted, val in overrides.items():
                    node = config
                    *path, leaf = dotted.split(".")
                    for p in path:
                        node = getattr(node, p)
                    setattr(node, leaf, val)
        self.config = config
        self.model = _inference_model(config)
        self.variables = variables
        self.dataset_info = get_dataset_info(config.data.info_name)
        self.noise_scheduler = NoiseScheduleVP(
            config.sde.schedule,
            continuous_beta_0=config.sde.continuous_beta_0,
            continuous_beta_1=config.sde.continuous_beta_1,
        )
        self._inverse_scaler = get_data_inverse_scaler(config)
        self._round_cache = {}
        self._vars_on_device = False
        self._count_head = None  # (head, params) via load_count_head

    # ---------------------------------------------------------------- load

    @classmethod
    def from_warm_state(
        cls, npz_path: str, config=None, overrides: Optional[dict] = None
    ) -> "Elucidator":
        """Load from a compact warm-state export (params + EMA, bf16)."""
        from . import warm_state
        from .run_lib import resolve_runtime_config

        config = config if config is not None else _default_config()
        config = resolve_runtime_config(config, 1)
        state = cls._skeleton_state(config)
        state = warm_state.load_warm_state(state, npz_path)
        logging.info(
            "Elucidator: warm state %s at step %d", npz_path, int(state.step)
        )
        return cls(config, cls._ema_variables(state), overrides)

    @classmethod
    def from_workdir(
        cls,
        workdir: str,
        config=None,
        ckpt: Optional[int] = None,
        overrides: Optional[dict] = None,
    ) -> "Elucidator":
        """Load from an Orbax training workdir (latest resumable checkpoint,
        or numbered checkpoint ``ckpt``)."""
        from . import checkpoint as ckpt_lib
        from .run_lib import resolve_runtime_config

        config = config if config is not None else _default_config()
        config = resolve_runtime_config(config, 1)
        state = cls._skeleton_state(config)
        if ckpt is not None:
            state = ckpt_lib.restore_checkpoint(
                ckpt_lib.numbered_checkpoint_dir(workdir, ckpt), state
            )
        else:
            state = ckpt_lib.restore_for_resume(workdir, state)
        if int(state.step) == 0:
            raise FileNotFoundError(f"no restorable checkpoint in {workdir}")
        logging.info(
            "Elucidator: workdir %s at step %d", workdir, int(state.step)
        )
        return cls(config, cls._ema_variables(state), overrides)

    @staticmethod
    def _skeleton_state(config):
        """Initialise an untrained TrainState whose tree shape the restore
        targets — built from a synthetic zero batch, no dataset needed (the
        parameter tree is batch/N-independent, run_lib._init_model_and_state
        docstring)."""
        from .run_lib import _init_model_and_state

        bs, n = 2, int(config.data.max_node)
        node_mask, edge_mask = M.build_masks(jnp.full((bs,), n), n)
        idx = used_spectra_indices(config.data.spectra_version)
        specs = tuple(np.zeros((bs, SPECTRUM_LENGTHS[i]), np.float32) for i in idx)
        batch = {
            # pipeline batches carry atom_mask as [B, N] (init adds the
            # trailing channel axis itself); build_masks returns [B, N, 1]
            "atom_mask": np.asarray(node_mask)[..., 0],
            "edge_mask": np.asarray(edge_mask),
            "context": specs if len(specs) > 1 else specs[0],
        }
        _, _, state = _init_model_and_state(config, batch, jax.random.PRNGKey(0))
        return jax.device_get(state)

    @staticmethod
    def _ema_variables(state):
        from .run_lib import _ema_variables

        return _ema_variables(jax.device_get(state))

    # ------------------------------------------------------------ normalise

    def _prepare_context(self, spectra: SpectraInput, normalized: bool):
        """Validate + normalise one molecule's spectra into model context
        arrays of shape [L] (tuple when spectra_version='allspectra')."""
        version = self.config.data.spectra_version
        idx = used_spectra_indices(version)
        names = ("uv", "ir", "raman")
        if isinstance(spectra, dict):
            arrays = [np.asarray(spectra[names[i]], np.float32) for i in idx]
        elif isinstance(spectra, (list, tuple)):
            arrays = [np.asarray(s, np.float32) for s in spectra]
        else:
            arrays = [np.asarray(spectra, np.float32)]
        if len(arrays) != len(idx):
            raise ValueError(
                f"spectra_version={version} expects {len(idx)} spectra "
                f"({[names[i] for i in idx]}), got {len(arrays)}"
            )
        out = []
        for a, i in zip(arrays, idx):
            want = SPECTRUM_LENGTHS[i]
            if a.shape != (want,):
                raise ValueError(
                    f"{names[i]} spectrum must have shape ({want},), got {a.shape}"
                )
            if not normalized:
                a = np.log10(a + 1.0)  # training transform (ref :141-148)
            out.append(a)
        return tuple(out) if len(out) > 1 else out[0]

    def _sample_n_atoms(self, rng: np.random.Generator) -> int:
        hist = self.dataset_info["train_n_nodes"]
        ks = np.array(sorted(hist.keys()))
        ps = np.array([hist[k] for k in ks], dtype=np.float64)
        return int(rng.choice(ks, p=ps / ps.sum()))

    # ------------------------------------------------------------- sampling

    def _round_fn(self, batch: int, n_pad: int):
        """Jitted K-draw reverse diffusion at a fixed (batch, n_pad) —
        mirrors the eval harness round (sampling/harness.py:109-141) minus
        the dataset plumbing."""
        key = (batch, n_pad)
        if key in self._round_cache:
            return self._round_cache[key]
        config = self.config
        model = self.model
        node_nf = config.data.atom_types + int(config.model.include_fc_charge)
        only_2d = config.only_2D
        method = config.sampling.method
        steps = config.sampling.steps
        sampler_kwargs = {}
        if method == "ancestral":
            sampler_cls = AncestralSampler
        elif method in ("dpm_solver", "dpm_solver_sde"):
            from .sampling.dpm_solver import DPMSolverPP

            sampler_cls = DPMSolverPP
            sampler_kwargs["stochastic"] = method == "dpm_solver_sde"
        else:
            raise ValueError(f"unknown sampling.method {method}")
        sampler = sampler_cls(
            self.noise_scheduler,
            make_time_steps(self.noise_scheduler, steps, 1e-3),
            config.model.pred_data,
            pred_edge=config.pred_edge,
            self_cond=config.model.self_cond,
            cond_process_fn=get_self_cond_fn(config),
            sampling_temperature=1.0,
            only_2d=only_2d,
            **sampler_kwargs,
        )

        def _round(variables, rng, context, n_nodes):
            node_mask, edge_mask = M.build_masks(n_nodes, n_pad)
            k_z, k_e, k_s = jax.random.split(rng, 3)
            if only_2d:
                z = M.sample_gaussian_with_mask(
                    k_z, (batch, n_pad, node_nf), node_mask
                )
            else:
                z = M.sample_combined_position_feature_noise(
                    k_z, batch, n_pad, node_nf, node_mask
                )
            edge_z = M.sample_symmetric_edge_feature_noise(
                k_e, batch, n_pad, config.model.edge_ch, edge_mask
            )
            ctx_emb = encode_context(model, variables, context)

            def model_apply(t, x, nm, em, edge_x, nl, cond_x, cond_edge_x,
                            has_cond, c_emb):
                return model.apply(
                    variables, t, x, nm, em, None,
                    edge_x=edge_x, noise_level=nl, cond_x=cond_x,
                    cond_edge_x=cond_edge_x, has_cond=has_cond,
                    context_emb=c_emb,
                )

            x_node, x_edge = sampler.sampling(
                model_apply, k_s, z, node_mask, edge_mask, edge_z, ctx_emb
            )
            return post_process(
                x_node, config.data.atom_types,
                bool(config.model.include_fc_charge), node_mask,
                self._inverse_scaler, x_edge, edge_mask,
                config.data.compress_edge, has_positions=not only_2d,
            )

        fn = jax.jit(_round)
        self._round_cache[key] = fn
        return fn

    def load_count_head(self, path: str) -> dict:
        """Attach a trained spectrum-conditioned atom-count head
        (models/atom_count.py, trained by tools/train_atom_count.py).

        With a head attached, count-free ``elucidate(n_atoms=None)`` samples
        only the few counts the spectrum itself supports (predicted
        distribution) instead of sweeping the 16-count histogram prior — the
        r4 quantification measured the flat sweep at consensus Top-1 8.0%
        vs 68.0% n-known because wrong-count draws reproduce structures as
        consistently as right-count ones (tools/nfree_eval.py). Returns the
        head's training metadata (held-out count accuracy)."""
        from .models import atom_count as ac

        head, params, meta = ac.load_head(path)
        self._count_head = (head, jax.device_put(params))
        return meta

    def _predict_counts(self, context, coverage: float = 0.9, cap: int = 4):
        """(counts, probs) for one prepared context via the count head."""
        from .models import atom_count as ac

        head, params = self._count_head
        ctx = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a)[None], context,
            is_leaf=lambda x: isinstance(x, np.ndarray),
        )
        emb = ac.encode_spec_pooled(self.model, self.variables, ctx)
        probs = np.asarray(ac.predict_count_probs(head, params, emb))[0]
        (counts, ps), = ac.top_counts(probs[None], coverage=coverage, cap=cap)
        return counts, dict(zip(counts, ps))

    def _plausible_n(self, coverage: float = 0.95, cap: int = 16):
        """Smallest prior-probability-sorted set of atom counts covering
        ``coverage`` of the train histogram (at most ``cap`` values)."""
        hist = self.dataset_info["train_n_nodes"]
        max_n = int(self.config.data.max_node)
        items = sorted(
            ((k, v) for k, v in hist.items() if 1 <= k <= max_n),
            key=lambda kv: -kv[1],
        )
        total = sum(v for _, v in items) or 1
        out, acc = [], 0.0
        for k, v in items:
            out.append(int(k))
            acc += v / total
            if acc >= coverage or len(out) >= cap:
                break
        return sorted(out)

    def elucidate(
        self,
        spectra: SpectraInput,
        n_atoms: Optional[int] = None,
        num_candidates: int = 10,
        seed: int = 0,
        normalized: bool = False,
        draws_per_n: Optional[int] = None,
    ) -> ElucidationResult:
        """Elucidate one molecule's structure from its spectra.

        ``spectra``: raw spectrum array (or dict/tuple for allspectra);
        ``num_candidates``: independent conditional draws, all in one
        batched reverse diffusion.

        ``n_atoms``: atom count incl. H. When ``None`` the count is
        MARGINALIZED (VERDICT r2 next-9: a real user doesn't know n): the
        histogram-prior-plausible counts (``_plausible_n``) each get a
        bucketed batch of ``draws_per_n`` draws (default
        ``max(2, num_candidates // #counts)``), and consensus ranks ALL
        draws together — draws at the wrong count scatter over many
        structures while draws at the right count reproduce one, so
        frequency identifies both the structure and its size; ties break
        toward the prior-likelier count. Returns consensus-ranked distinct
        structures (result.n_atoms is None in this mode)."""
        if num_candidates < 1:
            raise ValueError("num_candidates must be >= 1")
        if n_atoms is None:
            return self._elucidate_marginal(
                spectra, num_candidates, seed, normalized, draws_per_n
            )
        max_n = int(self.config.data.max_node)
        if not 1 <= n_atoms <= max_n:
            raise ValueError(f"n_atoms must be in [1, {max_n}], got {n_atoms}")
        context = self._prepare_context(spectra, normalized)
        # tile the one spectrum across the K draws
        if isinstance(context, tuple):
            ctx = tuple(np.tile(s[None], (num_candidates, 1)) for s in context)
        else:
            ctx = np.tile(context[None], (num_candidates, 1))
        # pad to the smallest configured bucket that fits (compile reuse)
        buckets = tuple(
            sorted(self.config.eval.get("bucket_sizes", ()))
        ) or (max_n,)
        n_pad = next((b for b in buckets if b >= n_atoms), max_n)

        if not self._vars_on_device:
            self.variables = jax.device_put(self.variables)
            self._vars_on_device = True
        rng = jax.random.PRNGKey(seed)
        out = self._round_fn(num_candidates, int(n_pad))(
            self.variables, rng, ctx,
            jnp.full((num_candidates,), n_atoms, jnp.int32),
        )
        n_vec = np.full((num_candidates,), n_atoms, np.int64)
        if self.config.pred_edge:
            pos, one_hot, fc, edge_types = out
            mols = mol_process(one_hot, pos, fc, n_vec, edge_types)
        else:
            pos, one_hot, fc = out
            mols = mol_process(one_hot, pos, fc, n_vec)

        return self._build_result(mols, num_candidates, n_atoms)

    def _build_result(self, mols, num_draws, n_atoms, n_prior=None):
        """Consensus-rank decoded draws into an ElucidationResult.

        ``n_prior``: optional {n: probability} map; when given (marginal
        mode) candidates with equal counts rank by the prior probability of
        their own atom count."""
        decoder = self.dataset_info["atom_decoder"]
        graphs = [from_decoded(m, decoder) for m in mols]
        cache: dict = {}
        ranked = cm.consensus_rank(graphs, _cache=cache)
        if n_prior is not None:
            ranked = sorted(
                ranked,
                key=lambda r: (
                    -r[1],
                    -float(n_prior.get(graphs[r[2]].n_atoms, 0.0)),
                    r[2],
                ),
            )
        candidates = []
        for cid, count, first in ranked:
            mg = graphs[first]
            candidates.append(
                Candidate(
                    molgraph=mg,
                    count=count,
                    frequency=count / num_draws,
                    first_draw=first,
                    smiles=_canonical_smiles(mg),
                    positions=(
                        None if self.config.only_2D
                        else np.asarray(mols[first][0])
                    ),
                )
            )
        return ElucidationResult(
            candidates=candidates, num_draws=num_draws, n_atoms=n_atoms
        )

    def _elucidate_marginal(self, spectra, num_candidates, seed, normalized,
                            draws_per_n):
        """Atom-count-free elucidation: one bucketed batch per plausible n,
        consensus across all draws (see ``elucidate`` docstring)."""
        max_n = int(self.config.data.max_node)
        context = self._prepare_context(spectra, normalized)
        buckets = tuple(
            sorted(self.config.eval.get("bucket_sizes", ()))
        ) or (max_n,)
        if not self._vars_on_device:
            self.variables = jax.device_put(self.variables)
            self._vars_on_device = True

        if self._count_head is not None:
            # spectrum-conditioned counts: sample only the few counts the
            # spectrum supports; tie-break by the predicted probability
            ns, prior = self._predict_counts(context)
        else:
            ns = self._plausible_n()
            hist = self.dataset_info["train_n_nodes"]
            total = sum(hist.values()) or 1
            prior = {int(k): v / total for k, v in hist.items()}
        K = draws_per_n or max(2, num_candidates // max(1, len(ns)))
        if isinstance(context, tuple):
            ctx = tuple(np.tile(s[None], (K, 1)) for s in context)
        else:
            ctx = np.tile(context[None], (K, 1))

        rng = jax.random.PRNGKey(seed)
        all_mols = []
        for n in ns:
            n_pad = next((b for b in buckets if b >= n), max_n)
            rng, k = jax.random.split(rng)
            out = self._round_fn(K, int(n_pad))(
                self.variables, k, ctx, jnp.full((K,), n, jnp.int32)
            )
            n_vec = np.full((K,), n, np.int64)
            if self.config.pred_edge:
                pos, one_hot, fc, edge_types = out
                all_mols.extend(mol_process(one_hot, pos, fc, n_vec, edge_types))
            else:
                pos, one_hot, fc = out
                all_mols.extend(mol_process(one_hot, pos, fc, n_vec))
        return self._build_result(all_mols, K * len(ns), None, n_prior=prior)

    def elucidate_batch(
        self,
        spectra_list: Sequence[SpectraInput],
        n_atoms_list: Optional[Sequence[Optional[int]]] = None,
        num_candidates: int = 10,
        seed: int = 0,
        normalized: bool = False,
        queries_per_round: int = 8,
    ) -> List[ElucidationResult]:
        """Serve many queries: packs ``queries_per_round`` queries x K draws
        into each device round (a 10-candidate query alone underfills the
        MXU at N<=29; batching restores arithmetic intensity). Rounds are
        chunked to a fixed size, so compiled shapes stay bounded at one
        executable per (queries_per_round * K, bucket) pair. Results come
        back in input order.

        A ``None`` entry in ``n_atoms_list`` draws ONE size from the
        histogram prior (cheap batch semantics); use ``elucidate()`` per
        query for full atom-count marginalization."""
        if num_candidates < 1:
            raise ValueError("num_candidates must be >= 1")
        q = len(spectra_list)
        if n_atoms_list is None:
            n_atoms_list = [None] * q
        if len(n_atoms_list) != q:
            raise ValueError("n_atoms_list length must match spectra_list")
        host_rng = np.random.default_rng(seed)
        max_n = int(self.config.data.max_node)
        buckets = tuple(
            sorted(self.config.eval.get("bucket_sizes", ()))
        ) or (max_n,)

        n_atoms = []
        contexts = []
        pads = []
        for spec, na in zip(spectra_list, n_atoms_list):
            na = self._sample_n_atoms(host_rng) if na is None else int(na)
            if not 1 <= na <= max_n:
                raise ValueError(f"n_atoms must be in [1, {max_n}], got {na}")
            n_atoms.append(na)
            contexts.append(self._prepare_context(spec, normalized))
            pads.append(next((b for b in buckets if b >= na), max_n))

        if not self._vars_on_device:
            self.variables = jax.device_put(self.variables)
            self._vars_on_device = True

        results: List[Optional[ElucidationResult]] = [None] * q
        decoder = self.dataset_info["atom_decoder"]
        rng = jax.random.PRNGKey(seed)
        by_pad: dict = {}
        for i, p in enumerate(pads):
            by_pad.setdefault(p, []).append(i)
        for n_pad, idxs in sorted(by_pad.items()):
            for start in range(0, len(idxs), queries_per_round):
                chunk = idxs[start : start + queries_per_round]
                # pad the round to a fixed query count (repeat the last
                # query; surplus rows are discarded after decode)
                full = chunk + [chunk[-1]] * (queries_per_round - len(chunk))
                ctx0 = contexts[full[0]]
                if isinstance(ctx0, tuple):
                    ctx = tuple(
                        np.repeat(
                            np.stack([contexts[i][s] for i in full]),
                            num_candidates, axis=0,
                        )
                        for s in range(len(ctx0))
                    )
                else:
                    ctx = np.repeat(
                        np.stack([contexts[i] for i in full]),
                        num_candidates, axis=0,
                    )
                n_vec = np.repeat(
                    np.array([n_atoms[i] for i in full], np.int32),
                    num_candidates,
                )
                rng, k = jax.random.split(rng)
                out = self._round_fn(
                    queries_per_round * num_candidates, int(n_pad)
                )(self.variables, k, ctx, jnp.asarray(n_vec))
                if self.config.pred_edge:
                    pos, one_hot, fc, edge_types = out
                    mols = mol_process(
                        one_hot, pos, fc, n_vec.astype(np.int64), edge_types
                    )
                else:
                    pos, one_hot, fc = out
                    mols = mol_process(one_hot, pos, fc, n_vec.astype(np.int64))
                for slot, qi in enumerate(chunk):
                    sl = slice(
                        slot * num_candidates, (slot + 1) * num_candidates
                    )
                    q_mols = mols[sl]
                    graphs = [from_decoded(m, decoder) for m in q_mols]
                    cache: dict = {}
                    candidates = [
                        Candidate(
                            molgraph=graphs[first],
                            count=count,
                            frequency=count / num_candidates,
                            first_draw=first,
                            smiles=_canonical_smiles(graphs[first]),
                            positions=(
                                None if self.config.only_2D
                                else np.asarray(q_mols[first][0])
                            ),
                        )
                        for cid, count, first in cm.consensus_rank(
                            graphs, _cache=cache
                        )
                    ]
                    results[qi] = ElucidationResult(
                        candidates=candidates,
                        num_draws=num_candidates,
                        n_atoms=n_atoms[qi],
                    )
        return results  # type: ignore[return-value]
