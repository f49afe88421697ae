"""Standalone elucidation API (diffspectra_tpu/api.py): spectra in, ranked
candidates out — the user-facing entry the reference lacks (its only
elucidation path is the dataset-coupled eval pipeline)."""

import numpy as np
import pytest

from diffspectra_tpu import warm_state
from diffspectra_tpu.api import Elucidator
from diffspectra_tpu.configs import smoke


def _tiny_config():
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 10
    cfg.sampling.steps = 4
    return cfg


@pytest.fixture(scope="module")
def elucidator(tmp_path_factory):
    cfg = _tiny_config()
    state = Elucidator._skeleton_state(cfg)
    path = str(tmp_path_factory.mktemp("warm") / "w.npz")
    warm_state.export_warm_state(state, path)
    return Elucidator.from_warm_state(path, config=cfg)


def test_elucidate_ranked_candidates(elucidator):
    spec = np.abs(np.random.default_rng(0).normal(size=3501)) * 5
    res = elucidator.elucidate(spec, n_atoms=5, num_candidates=4, seed=1)
    assert res.num_draws == 4 and res.n_atoms == 5
    assert 1 <= len(res.candidates) <= 4
    counts = [c.count for c in res.candidates]
    assert sum(counts) == 4
    assert counts == sorted(counts, reverse=True)  # consensus-ranked
    assert res.best is res.candidates[0]
    for c in res.candidates:
        assert c.molgraph.n_atoms == 5
        assert c.positions is not None and c.positions.shape == (5, 3)
        assert c.frequency == pytest.approx(c.count / 4)

    # deterministic under the same seed, different under another
    res2 = elucidator.elucidate(spec, n_atoms=5, num_candidates=4, seed=1)
    assert [c.molgraph.wl_hash() for c in res.candidates] == [
        c.molgraph.wl_hash() for c in res2.candidates
    ]


def test_elucidate_input_validation(elucidator):
    spec = np.zeros(3501)
    with pytest.raises(ValueError, match="n_atoms"):
        elucidator.elucidate(spec, n_atoms=99, num_candidates=1)
    with pytest.raises(ValueError, match="shape"):
        elucidator.elucidate(np.zeros(100), n_atoms=5, num_candidates=1)
    with pytest.raises(ValueError, match="expects"):
        elucidator.elucidate((spec, spec), n_atoms=5, num_candidates=1)


def test_elucidate_from_workdir_and_histogram_sizes(tmp_path):
    """from_workdir restores a trained checkpoint; n_atoms=None draws from
    the dataset-info histogram (clamped by validation to max_node)."""
    from diffspectra_tpu import run_lib

    cfg = _tiny_config()
    cfg.data.max_node = 12
    cfg.training.n_iters = 2
    cfg.training.snapshot_freq = 2
    cfg.training.snapshot_freq_for_preemption = 2
    cfg.training.snapshot_sampling = False
    workdir = str(tmp_path / "run")
    run_lib.train(cfg, None, workdir)

    el = Elucidator.from_workdir(workdir, config=cfg)
    spec = np.abs(np.random.default_rng(1).normal(size=3501))
    res = el.elucidate(spec, n_atoms=6, num_candidates=2, seed=0)
    assert sum(c.count for c in res.candidates) == 2

    with pytest.raises(FileNotFoundError):
        Elucidator.from_workdir(str(tmp_path / "nope"), config=cfg)


def test_elucidate_batch_order_and_chunking(elucidator):
    """Batched serving: results return in input order, per-query counts sum
    to K, chunk padding discards surplus rows, and mixed atom counts that
    land in different pad buckets still work."""
    rng = np.random.default_rng(3)
    specs = [np.abs(rng.normal(size=3501)) for _ in range(3)]
    res = elucidator.elucidate_batch(
        specs, n_atoms_list=[4, 6, 5], num_candidates=2,
        seed=5, queries_per_round=2,
    )
    assert len(res) == 3
    for r, want_n in zip(res, (4, 6, 5)):
        assert r.n_atoms == want_n
        assert sum(c.count for c in r.candidates) == 2
        for c in r.candidates:
            assert c.molgraph.n_atoms == want_n

    # batch path matches the single-query path under the same derived key?
    # (keys differ by construction; just require determinism of the batch)
    res2 = elucidator.elucidate_batch(
        specs, n_atoms_list=[4, 6, 5], num_candidates=2,
        seed=5, queries_per_round=2,
    )
    for a, b in zip(res, res2):
        assert [c.molgraph.wl_hash() for c in a.candidates] == [
            c.molgraph.wl_hash() for c in b.candidates
        ]

    with pytest.raises(ValueError, match="length"):
        elucidator.elucidate_batch(specs, n_atoms_list=[4], num_candidates=1)


def test_elucidate_marginal_over_atom_count(elucidator):
    """n_atoms=None marginalizes over the histogram prior (VERDICT r2
    next-9): one bucketed batch per plausible count, consensus across all
    draws, prior tie-break; result.n_atoms is None and candidates carry
    their own sizes."""
    spec = np.abs(np.random.default_rng(2).normal(size=3501)) * 5
    res = elucidator.elucidate(spec, num_candidates=8, seed=3, draws_per_n=2)
    assert res.n_atoms is None
    ns = elucidator._plausible_n()
    assert res.num_draws == 2 * len(ns)
    assert sum(c.count for c in res.candidates) == res.num_draws
    sizes = {c.molgraph.n_atoms for c in res.candidates}
    assert sizes <= set(ns)
    assert len(sizes) >= 2  # draws at several counts survive ranking
    counts = [c.count for c in res.candidates]
    assert counts == sorted(counts, reverse=True)
    # deterministic under the same seed
    res2 = elucidator.elucidate(spec, num_candidates=8, seed=3, draws_per_n=2)
    assert [c.molgraph.wl_hash() for c in res.candidates] == [
        c.molgraph.wl_hash() for c in res2.candidates
    ]
