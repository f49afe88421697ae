"""Smoke tests for the identifiability-ceiling analysis tools
(tools/ceiling_analysis.py, tools/protocol_ceiling.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ceiling_analysis import estimate, fingerprint_and_hash


def test_ceiling_estimate_bounds_and_fidelity_ordering():
    r1 = estimate(384, seed=7, fidelity=1)
    r2 = estimate(384, seed=7, fidelity=2)
    for r in (r1, r2):
        assert 0.0 < r["top1_ceiling"] <= 1.0
        assert r["top1_ceiling"] <= r["top10_ceiling"] <= 1.0
        assert r["n_classes"] <= r["n"]
    # fidelity-2 classes refine fidelity-1 classes -> ceiling can only rise
    assert r2["top1_ceiling"] >= r1["top1_ceiling"]
    assert r2["n_classes"] >= r1["n_classes"]


def test_fingerprint_separates_only_at_fidelity2():
    # two 4-heavy-atom skeletons with equal bond-pattern counts but
    # different WL environments (same pair as tests/test_data.py)
    def build(edges, types, max_n=8):
        e = np.zeros((max_n, max_n), dtype=np.int64)
        for a, b in edges:
            e[a, b] = e[b, a] = 1
        t = np.zeros(max_n, dtype=np.int64)
        t[: len(types)] = types
        return t, e, len(types)

    t1, e1, n1 = build([(0, 1), (1, 2), (2, 3)], [1, 1, 1, 3])
    t2, e2, n2 = build([(0, 1), (1, 2), (1, 3)], [1, 1, 1, 3])
    pos = np.zeros((8, 3))

    c1_f1, h1 = fingerprint_and_hash(t1, pos, e1, n1, fidelity=1)
    c2_f1, h2 = fingerprint_and_hash(t2, pos, e2, n2, fidelity=1)
    assert c1_f1 == c2_f1          # same fidelity-1 spectrum class
    assert h1 != h2                # but different structures
    c1_f2, _ = fingerprint_and_hash(t1, pos, e1, n1, fidelity=2)
    c2_f2, _ = fingerprint_and_hash(t2, pos, e2, n2, fidelity=2)
    assert c1_f2 != c2_f2          # fidelity 2 separates them
    # fidelity 4 (continuous keying) separates them too, at both the
    # optimistic and the conservative quantization
    for f4_bin in (1, 8):
        c1_f4, _ = fingerprint_and_hash(
            t1, pos, e1, n1, fidelity=4, f4_bin=f4_bin
        )
        c2_f4, _ = fingerprint_and_hash(
            t2, pos, e2, n2, fidelity=4, f4_bin=f4_bin
        )
        assert c1_f4 != c2_f4


def test_ceiling_estimate_fidelity4():
    r4 = estimate(384, seed=7, fidelity=4)
    r4c = estimate(384, seed=7, fidelity=4, f4_bin=8)
    for r in (r4, r4c):
        assert 0.0 < r["top1_ceiling"] <= 1.0
        assert r["top1_ceiling"] <= r["top10_ceiling"] <= 1.0
    # coarser quantization can only merge classes
    assert r4c["n_classes"] <= r4["n_classes"]
    assert r4c["top1_ceiling"] <= r4["top1_ceiling"] + 1e-12
