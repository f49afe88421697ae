"""Evaluation-stack tests: stability, metrics, geometry, similarity, RMSD."""

import numpy as np
import pytest

from diffspectra_tpu.data.info import get_dataset_info
from diffspectra_tpu.evaluation import get_2D_edm_metric, get_edm_metric
from diffspectra_tpu.evaluation.bond_analyze import get_bond_order
from diffspectra_tpu.evaluation.cal_geometry import (
    cal_bond_angle,
    cal_bond_distance,
    cal_dihedral_angle,
)
from diffspectra_tpu.evaluation.mmd import compute_mmd
from diffspectra_tpu.evaluation.molgraph import MolGraph
from diffspectra_tpu.evaluation.rmsd import hungarian_atom_mapping, hungarian_rmsd_batch
from diffspectra_tpu.evaluation.stability import check_2D_stability, check_stability

INFO = get_dataset_info("qm9_second_half")


def methane():
    """CH4 with tetrahedral geometry — stable molecule."""
    d = 1.09 / np.sqrt(3)
    pos = np.array(
        [[0, 0, 0], [d, d, d], [d, -d, -d], [-d, d, -d], [-d, -d, d]], dtype=float
    )
    atom_type = np.array([1, 0, 0, 0, 0])  # C,H,H,H,H
    edges = np.zeros((5, 5), dtype=np.int64)
    for i in range(1, 5):
        edges[0, i] = edges[i, 0] = 1
    return pos, atom_type, edges


def test_bond_order_thresholds():
    assert get_bond_order("C", "H", 1.09) == 1
    assert get_bond_order("C", "H", 2.0) == 0
    assert get_bond_order("C", "C", 1.20) == 3
    assert get_bond_order("C", "C", 1.33) == 2
    assert get_bond_order("C", "C", 1.52) == 1
    assert get_bond_order("C", "O", 1.14) == 3  # 113+3=116pm threshold


def test_check_stability_methane():
    pos, at, _ = methane()
    stable, n_stable, n, mol = check_stability(pos, at, INFO)
    assert stable
    assert n_stable == 5 and n == 5


def test_check_2d_stability_methane():
    pos, at, edges = methane()
    stable, n_stable, n, mol = check_2D_stability(pos, at, np.zeros(5), edges, INFO)
    assert stable


def test_edm_metrics_run():
    pos, at, edges = methane()
    mols = [(pos, at, edges, np.zeros(5, np.int64))] * 3
    stability, rdkit_res, rd_mols = get_edm_metric(INFO)(mols)
    assert stability["mol_stable"] == 1.0
    assert rdkit_res["Validity"] == 1.0
    assert rdkit_res["Complete"] == 1.0
    stability2, rdkit2, _ = get_2D_edm_metric(INFO)(mols)
    assert stability2["mol_stable"] == 1.0
    # 3 identical molecules -> 1 unique / 3
    assert abs(rdkit2["Unique"] - 1 / 3) < 1e-6


def test_molgraph_hash_isomorphism_invariant():
    pos, at, edges = methane()
    g1 = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    # permute atoms: H first
    perm = np.array([1, 0, 2, 3, 4])
    g2 = MolGraph(
        [g1.atom_syms[i] for i in perm],
        g1.formal_charges[perm],
        edges[np.ix_(perm, perm)],
        pos[perm],
    )
    assert g1.wl_hash() == g2.wl_hash()
    # different molecule -> different hash
    edges3 = edges.copy()
    edges3[1, 2] = edges3[2, 1] = 1
    g3 = MolGraph(g1.atom_syms, g1.formal_charges, edges3, pos)
    assert g1.wl_hash() != g3.wl_hash()


def test_geometry_distributions():
    pos, at, edges = methane()
    g = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    bd = cal_bond_distance([g], ["C1H"])
    assert len(bd["C1H"]) == 4
    np.testing.assert_allclose(bd["C1H"], 1.09, rtol=1e-5)
    # NOTE: angle enumeration pairs each bond only with bonds of its END atom
    # (mirrors ref get_bond_pairs, cal_geometry.py:46-59): methane with all
    # bonds oriented C->H therefore yields no angle pairs, exactly like the
    # reference over an RWMol built with AddBond(0, i).
    ang0 = cal_bond_angle([g], ["H1C-C1H"])
    assert len(ang0["H1C-C1H"]) == 0

    # chain H0-C1-C2-H3: angles and a dihedral are enumerable
    chain_pos = np.array(
        [[-1.09, 0.4, 0.0], [0.0, 0.0, 0.0], [1.54, 0.0, 0.0], [2.63, 0.4, 0.3]]
    )
    chain_edges = np.zeros((4, 4), dtype=np.int64)
    for i in range(3):
        chain_edges[i, i + 1] = chain_edges[i + 1, i] = 1
    gc = MolGraph(["H", "C", "C", "H"], np.zeros(4, np.int64), chain_edges, chain_pos)
    ang = cal_bond_angle([gc], ["H1C-C1C"])
    assert len(ang["H1C-C1C"]) >= 1
    want = np.degrees(
        np.arccos(
            np.dot(chain_pos[0] - chain_pos[1], chain_pos[2] - chain_pos[1])
            / (np.linalg.norm(chain_pos[0] - chain_pos[1]) * 1.54)
        )
    )
    np.testing.assert_allclose(ang["H1C-C1C"][0], want, atol=1e-4)
    dih = cal_dihedral_angle([gc], ["H1C-C1C-C1H"])
    assert len(dih["H1C-C1C-C1H"]) == 1


def test_mmd_zero_for_identical():
    x = np.random.default_rng(0).normal(size=200)
    assert abs(compute_mmd(x, x)) < 1e-6
    y = x + 5.0
    assert compute_mmd(x, y) > 0.1


def test_hungarian_rmsd_recovers_rotation():
    pos, at, edges = methane()
    g1 = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    # rotate + permute
    theta = 0.7
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    perm = np.array([2, 0, 1, 4, 3])
    g2 = MolGraph(
        [g1.atom_syms[i] for i in perm],
        g1.formal_charges[perm],
        edges[np.ix_(perm, perm)],
        (pos @ R.T)[perm],
    )
    amap, rmsd, acc = hungarian_atom_mapping(g1, g2)
    assert rmsd is not None and rmsd < 1e-5
    assert acc == 1.0

    rmsds, rate, mean_rmsd, mean_acc = hungarian_rmsd_batch([g1], [g2])
    assert rate == 1.0
    assert mean_rmsd < 1e-5


def test_similarity_metrics_csv(tmp_path):
    from diffspectra_tpu.evaluation.compute_metrics import compute_similarity_metrics

    pos, at, edges = methane()
    g = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    ok = compute_similarity_metrics([g, g], [g, g], str(tmp_path), 1, "3D")
    assert ok
    import pandas as pd

    df = pd.read_csv(tmp_path / "similarity_metrics_3d_ckpt_1.csv")
    row = df[df["Evaluation Metric"] == "Top-1 Accuracy"]["Value"].iloc[0]
    assert float(row) == 1.0


def test_mose_metrics_run():
    from diffspectra_tpu.evaluation.mose_metric import get_moses_metrics

    pos, at, edges = methane()
    g = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    metric = get_moses_metrics([g] * 5)
    res = metric([g] * 3)
    assert res["SNN"] == pytest.approx(1.0)
    assert res["Frag"] == pytest.approx(1.0)
    # proxy rides its own key; 'FCD' is NaN until ChemNet weights installed
    assert np.isfinite(res["FCD_proxy"])
    assert np.isnan(res["FCD"])
    assert res["weight"] == pytest.approx(16.043, abs=0.01)


def test_mose_metrics_ref_stats_cached_and_stable_across_calls():
    """Multi-checkpoint evals call the metric repeatedly: the reference-side
    WL CSR/vocab must be computed once and later calls (whose gen sets grow
    the vocab) must not perturb earlier-call results (r2 review)."""
    from diffspectra_tpu.evaluation.mose_metric import get_moses_metrics

    pos, at, edges = methane()
    g = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    # ethane-like second molecule: introduces WL features absent from the
    # reference set, forcing the vocab to grow between calls
    e_edges = np.zeros((8, 8), dtype=np.int64)
    e_edges[0, 1] = e_edges[1, 0] = 1
    for i in (2, 3, 4):
        e_edges[0, i] = e_edges[i, 0] = 1
    for i in (5, 6, 7):
        e_edges[1, i] = e_edges[i, 1] = 1
    g2 = MolGraph(
        ["C", "C", "H", "H", "H", "H", "H", "H"],
        np.zeros(8, np.int64), e_edges,
        np.random.default_rng(0).normal(size=(8, 3)),
    )
    # methanol-like third molecule: WL features (O environments) absent
    # from both the reference set and the first gen set, so the middle
    # call grows the shared vocab
    o_edges = np.zeros((6, 6), dtype=np.int64)
    o_edges[0, 1] = o_edges[1, 0] = 1
    for i in (2, 3, 4):
        o_edges[0, i] = o_edges[i, 0] = 1
    o_edges[1, 5] = o_edges[5, 1] = 1
    g3 = MolGraph(
        ["C", "O", "H", "H", "H", "H"],
        np.zeros(6, np.int64), o_edges,
        np.random.default_rng(1).normal(size=(6, 3)),
    )
    metric = get_moses_metrics([g] * 5)
    # two distinct graphs so IntDiv is defined (a single-unique-mol set
    # has no off-diagonal similarities)
    r1 = metric([g, g2])
    metric([g3, g])  # grows the shared vocab
    r3 = metric([g, g2])
    assert np.isfinite(r1["IntDiv"])
    assert r3["SNN"] == pytest.approx(r1["SNN"])
    assert r3["IntDiv"] == pytest.approx(r1["IntDiv"])


def test_top_k_exact_match():
    """Top-K exact match: a hit in ANY candidate slot counts (BASELINE.md
    Top-1/Top-10 headline protocol)."""
    import numpy as np

    from diffspectra_tpu.evaluation.compute_metrics import top_k_exact_match
    from diffspectra_tpu.evaluation.molgraph import MolGraph

    def mol(syms, bonds):
        n = len(syms)
        bo = np.zeros((n, n), dtype=int)
        for i, j, o in bonds:
            bo[i, j] = bo[j, i] = o
        return MolGraph(syms, np.zeros(n, dtype=int), bo)

    water = mol(["O", "H", "H"], [(0, 1, 1), (0, 2, 1)])
    methane = mol(["C", "H", "H", "H", "H"],
                  [(0, i, 1) for i in range(1, 5)])
    ammonia = mol(["N", "H", "H", "H"], [(0, i, 1) for i in range(1, 4)])

    true_mols = [water, methane]
    # target 0: correct candidate in slot 2 -> top-3 hit, top-1 miss
    # target 1: no correct candidate
    preds = [[ammonia, water, ammonia], [ammonia, water, ammonia]]
    assert top_k_exact_match(true_mols, preds) == 0.5
    assert top_k_exact_match(true_mols, [[p[0]] for p in preds]) == 0.0
    assert top_k_exact_match(true_mols, [[water], [methane]]) == 1.0
    # None targets are skipped, None candidates never match
    assert top_k_exact_match([None, methane], [[water], [None, methane]]) == 1.0


def test_exact_match_rdkit_mode_stubbed(monkeypatch):
    """Regression (VERDICT r1 weak #1): _exact_match's RDKit branch used a
    module-scope `Chem` that was never imported; the NameError was swallowed
    by `except Exception: return False`, silently zeroing Top-K accuracy in
    every RDKit deployment.  Stub an `rdkit` module to exercise the branch
    without RDKit installed."""
    import sys
    import types

    from diffspectra_tpu.evaluation import compute_metrics as CM

    calls = []

    class _FakeMol:
        def __init__(self, key):
            self.key = key

    chem = types.SimpleNamespace(
        MolToInchiKey=lambda m: (calls.append(m.key), m.key)[1],
        SanitizeMol=lambda m: None,
    )
    fake_rdkit = types.ModuleType("rdkit")
    fake_rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", fake_rdkit)
    monkeypatch.setattr(CM, "HAS_RDKIT", True)

    assert CM._exact_match(_FakeMol("AAA"), _FakeMol("AAA")) is True
    assert CM._exact_match(_FakeMol("AAA"), _FakeMol("BBB")) is False
    # the stub was actually reached (not short-circuited by a swallowed error)
    assert calls == ["AAA", "AAA", "AAA", "BBB"]


def test_train_references_lift_molgraphs_under_rdkit(monkeypatch):
    """Regression (r2 review): with RDKit installed, MolGraph train
    references (run_lib builds them from raw arrays) were returned as
    wl-hashes only, so eval_rdmol got train_smiles=None and Novelty was
    silently 0.0 in every RDKit deployment."""
    import sys
    import types

    import numpy as np

    from diffspectra_tpu.evaluation import molgraph as MG
    from diffspectra_tpu.evaluation import stability as ST

    class _FakeMol:
        def __init__(self, key):
            self.key = key

    chem = types.SimpleNamespace(
        SanitizeMol=lambda m: None,
        MolToSmiles=lambda m: m.key,
    )
    fake_rdkit = types.ModuleType("rdkit")
    fake_rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", fake_rdkit)
    monkeypatch.setattr(ST, "HAS_RDKIT", True)
    monkeypatch.setattr(ST, "Chem", chem, raising=False)
    monkeypatch.setattr(
        MG, "to_rdkit", lambda mg: _FakeMol("".join(sorted(mg.atom_syms)))
    )

    bonds = np.zeros((3, 3), int)
    bonds[0, 1] = bonds[1, 0] = 1
    bonds[1, 2] = bonds[2, 1] = 1
    graphs = [
        MG.MolGraph(["C", "C", "O"], np.zeros(3, int), bonds),
        MG.MolGraph(["C", "C", "N"], np.zeros(3, int), bonds),
    ]
    smiles, hashes = ST._train_references(graphs)
    assert smiles == ["CCO", "CCN"]
    assert hashes is None
    # RDKit-mol references unchanged; no-RDKit path still hashes
    monkeypatch.setattr(ST, "HAS_RDKIT", False)
    smiles, hashes = ST._train_references(graphs)
    assert smiles is None and len(hashes) == 2


def test_exact_match_mixed_molgraph_rdkit_pair(monkeypatch):
    """Regression (r2 review): run_lib's Top-K targets are MolGraphs while
    stability returns RDKit mols in RDKit deployments; _exact_match must
    lift the MolGraph side instead of calling wl_hash() on an RDKit mol
    (AttributeError swallowed -> permanent 0% Top-K)."""
    import sys
    import types

    import numpy as np

    from diffspectra_tpu.evaluation import compute_metrics as CM
    from diffspectra_tpu.evaluation import molgraph as MG

    class _FakeMol:
        def __init__(self, key):
            self.key = key

    chem = types.SimpleNamespace(
        MolToInchiKey=lambda m: m.key,
        SanitizeMol=lambda m: None,
    )
    fake_rdkit = types.ModuleType("rdkit")
    fake_rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", fake_rdkit)
    monkeypatch.setattr(CM, "HAS_RDKIT", True)
    # stand-in for the real converter (needs full RDKit): key by formula
    monkeypatch.setattr(
        MG, "to_rdkit", lambda mg: _FakeMol("".join(sorted(mg.atom_syms)))
    )

    bonds = np.zeros((3, 3), int)
    bonds[0, 1] = bonds[1, 0] = 1
    bonds[1, 2] = bonds[2, 1] = 1
    target = MG.MolGraph(["C", "C", "O"], np.zeros(3, int), bonds)

    assert CM._exact_match(target, _FakeMol("CCO")) is True
    assert CM._exact_match(target, _FakeMol("CCN")) is False
    # symmetric case: MolGraph prediction against an RDKit target
    assert CM._exact_match(_FakeMol("CCO"), target) is True


def test_canonical_id_and_consensus_rank():
    """Consensus ranking: canonical ids group identical structures, the
    mode wins, ties break toward the earliest draw."""
    from diffspectra_tpu.evaluation.compute_metrics import (
        canonical_id,
        consensus_rank,
    )

    pos, at, edges = methane()
    g = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)
    g_dup = MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos + 1.0)
    w_edges = np.zeros((3, 3), dtype=np.int64)
    w_edges[0, 1] = w_edges[1, 0] = 1
    w_edges[0, 2] = w_edges[2, 0] = 1
    water = MolGraph(["O", "H", "H"], np.zeros(3, np.int64), w_edges,
                     np.random.default_rng(0).normal(size=(3, 3)))

    cache = {}
    assert canonical_id(g, _cache=cache) == canonical_id(g_dup, _cache=cache)
    assert canonical_id(g, _cache=cache) != canonical_id(water, _cache=cache)
    assert canonical_id(None) is None

    # methane drawn twice, water once -> methane is the consensus pick
    ranked = consensus_rank([water, g, None, g_dup], _cache=cache)
    assert ranked[0][0] == canonical_id(g, _cache=cache)
    assert ranked[0][1] == 2
    assert ranked[1] == (canonical_id(water, _cache=cache), 1, 0)

    # pure tie: earliest draw wins
    ranked = consensus_rank([water, g], _cache=cache)
    assert ranked[0][0] == canonical_id(water, _cache=cache)
