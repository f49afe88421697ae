"""Exact MCES distance (evaluation/mces.py) — hand-computed golden cases +
properties vs the labelled-multiset lower bound it replaced."""

import numpy as np
import pytest

from diffspectra_tpu.evaluation.mces import (
    _heavy_graph, _multiset_proxy, max_common_edges, mces_distance,
)
from diffspectra_tpu.evaluation.molgraph import MolGraph


def mol(syms, bonds):
    n = len(syms)
    bo = np.zeros((n, n), dtype=np.int64)
    for i, j, o in bonds:
        bo[i, j] = bo[j, i] = o
    return MolGraph(syms, np.zeros(n, dtype=np.int64), bo)


def chain(elems, orders):
    return mol(list(elems), [(i, i + 1, o) for i, o in enumerate(orders)])


def test_identical_molecules_zero_distance():
    ethanol = chain("CCO", [1, 1])
    assert mces_distance(ethanol, ethanol) == 0.0


def test_h_stripped():
    # C-H bonds must not contribute: methane vs bare carbon -> distance 0
    methane = mol(["C", "H", "H", "H", "H"], [(0, i, 1) for i in range(1, 5)])
    carbon = mol(["C"], [])
    assert mces_distance(methane, carbon) == 0.0


def test_single_bond_difference():
    # propane C-C-C vs propene C=C-C: MCES = 1 (the shared C-C single bond),
    # distance = 2 + 2 - 2*1 = 2
    propane = chain("CCC", [1, 1])
    propene = chain("CCC", [2, 1])
    assert mces_distance(propane, propene) == 2.0


def test_subgraph_distance_is_edge_count_difference():
    # butane contains propane: distance = 3 + 2 - 2*2 = 1
    butane = chain("CCCC", [1, 1, 1])
    propane = chain("CCC", [1, 1])
    assert mces_distance(butane, propane) == 1.0


def test_element_labels_respected():
    # C-C-O vs C-C-N share only the C-C bond
    ethanol_skel = chain("CCO", [1, 1])
    ethylamine_skel = chain("CCN", [1, 1])
    assert mces_distance(ethanol_skel, ethylamine_skel) == 2.0


def test_connectivity_beats_multiset():
    # Same labelled bond multiset {C-C x2, C-O x1} but different wiring:
    # 1-propanol skeleton (O on the chain END) vs isopropanol skeleton
    # (O on the MIDDLE carbon). The multiset proxy says 0; the exact
    # distance must see the structural difference.
    n_propanol = chain("CCCO", [1, 1, 1])
    iso = mol(["C", "C", "C", "O"], [(0, 1, 1), (1, 2, 1), (1, 3, 1)])
    s1, b1 = _heavy_graph(n_propanol)
    s2, b2 = _heavy_graph(iso)
    assert _multiset_proxy(s1, b1, s2, b2) == 0.0
    # best common subgraph keeps 2 of 3 edges -> d = 3 + 3 - 2*2 = 2
    assert mces_distance(n_propanol, iso) == 2.0


def test_ring_vs_chain():
    # cyclopropane (3 edges) vs propane (2 edges): MCES = 2, d = 3+2-4 = 1
    cyclo = mol(["C", "C", "C"], [(0, 1, 1), (1, 2, 1), (0, 2, 1)])
    propane = chain("CCC", [1, 1])
    assert mces_distance(cyclo, propane) == 1.0


def test_empty_and_disconnected():
    empty = mol([], [])
    water_o = mol(["O"], [])
    ethanol = chain("CCO", [1, 1])
    assert mces_distance(empty, ethanol) == 2.0
    assert mces_distance(water_o, ethanol) == 2.0


@pytest.mark.parametrize("seed", range(20))
def test_exact_at_least_multiset_bound(seed):
    """Exact distance >= multiset-proxy distance (proxy over-counts shared
    edges), and is symmetric."""
    rng = np.random.default_rng(seed)

    def rand_mol():
        n = int(rng.integers(2, 9))
        syms = [str(s) for s in rng.choice(["C", "N", "O"], size=n)]
        bo = np.zeros((n, n), dtype=np.int64)
        # random spanning tree + extra edges
        for i in range(1, n):
            j = int(rng.integers(0, i))
            bo[i, j] = bo[j, i] = int(rng.integers(1, 4))
        for _ in range(int(rng.integers(0, 3))):
            i, j = rng.integers(0, n, size=2)
            if i != j:
                bo[i, j] = bo[j, i] = int(rng.integers(1, 4))
        return MolGraph(syms, np.zeros(n, dtype=np.int64), bo)

    m1, m2 = rand_mol(), rand_mol()
    d12 = mces_distance(m1, m2)
    d21 = mces_distance(m2, m1)
    assert d12 == d21
    s1, b1 = _heavy_graph(m1)
    s2, b2 = _heavy_graph(m2)
    assert d12 >= _multiset_proxy(s1, b1, s2, b2)
    assert mces_distance(m1, m1) == 0.0


def test_max_common_edges_direct():
    # benzene ring (aromatic order 4) vs hexane chain: no common edges
    benz = mol(["C"] * 6, [(i, (i + 1) % 6, 4) for i in range(6)])
    hexane = chain("CCCCCC", [1] * 5)
    s1, b1 = _heavy_graph(benz)
    s2, b2 = _heavy_graph(hexane)
    assert max_common_edges(s1, b1, s2, b2) == (0, True)
    assert mces_distance(benz, hexane) == 11.0


def test_native_matches_python_search():
    """native/mces.cc is the production path; the Python search is the
    oracle. Parity over random labelled graphs (both the |MCES| value and
    exactness flag)."""
    from diffspectra_tpu.evaluation import mces as mces_mod

    if mces_mod._load_native() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    for _ in range(40):
        def rand(n_lo, n_hi):
            n = int(rng.integers(n_lo, n_hi))
            syms = [str(s) for s in rng.choice(["C", "N", "O", "F"], size=n)]
            bo = np.zeros((n, n), dtype=np.int64)
            for i in range(1, n):
                j = int(rng.integers(0, i))
                bo[i, j] = bo[j, i] = int(rng.integers(1, 5))
            for _ in range(int(rng.integers(0, 4))):
                i, j = rng.integers(0, n, size=2)
                if i != j:
                    bo[i, j] = bo[j, i] = int(rng.integers(1, 5))
            return syms, bo

        s1, b1 = rand(2, 10)
        s2, b2 = rand(2, 10)
        native = mces_mod.max_common_edges(s1, b1, s2, b2)
        py = mces_mod._max_common_edges_py(s1, b1, s2, b2)
        assert native == py, (s1, s2)


def test_native_handles_larger_synthetic_molecules_fast():
    """The 12-heavy-atom pairs that pushed the Python search to seconds
    (committed eval log) must close instantly natively."""
    import time

    from diffspectra_tpu.evaluation import mces as mces_mod

    if mces_mod._load_native() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    n = 12
    syms = [str(s) for s in rng.choice(["C", "C", "C", "N", "O"], size=n)]
    bo = np.zeros((n, n), dtype=np.int64)
    for i in range(1, n):
        j = int(rng.integers(0, i))
        bo[i, j] = bo[j, i] = int(rng.integers(1, 3))
    m1 = MolGraph(syms, np.zeros(n, int), bo)
    bo2 = bo.copy()
    bo2[0, 1] = bo2[1, 0] = 3  # one bond-order difference
    m2 = MolGraph(syms, np.zeros(n, int), bo2)
    t0 = time.time()
    d = mces_distance(m1, m2)
    assert time.time() - t0 < 2.0
    assert d == 2.0


def test_budget_exhaustion_returns_incumbent_upper_bound(monkeypatch):
    """On node-budget exhaustion the distance must come from the incumbent
    (an UPPER bound on the exact distance) — not the multiset proxy, whose
    lower-bound values were incomparable — and the event must be counted."""
    from diffspectra_tpu.evaluation import mces as mces_mod

    # two 6-chains with one bond-order difference: exact d = 2
    a = chain("CCCCCC", [1, 1, 1, 1, 1])
    b = chain("CCCCCC", [2, 1, 1, 1, 1])
    exact_d = mces_distance(a, b)
    assert exact_d == 2.0

    monkeypatch.setattr(mces_mod, "_MAX_NODES", 1)
    before = mces_mod.EXHAUSTED_PAIRS
    d = mces_mod.mces_distance(a, b)
    assert mces_mod.EXHAUSTED_PAIRS == before + 1
    # upper bound on the exact distance, and still a sane distance value
    assert d >= exact_d
    s1, b1 = _heavy_graph(a)
    s2, b2 = _heavy_graph(b)
    assert d <= 2 * 5  # never worse than "nothing in common"
    # the greedy seed already realizes a common subgraph, so the incumbent
    # bound must beat the trivial e1+e2 value
    assert d < 10.0
