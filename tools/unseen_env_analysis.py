"""Is the unseen-target Top-10 plateau data-information or model error?
(VERDICT r2 next-2: "a stated verdict on whether the residual gap is
data-information or model".)

Fidelity-2 spectra key their peaks on WL-1/WL-2 local-environment HASHES.
A hash is discontinuous in structure: an environment never seen in train
contributes peaks that carry NO generalizable information (unlike real DFT
spectra, where similar environments produce similar frequencies). So a
held-out molecule is recoverable only to the extent its environments (and
their compositions) were seen in training.

This script reproduces the v3 campaign's train/test split (131,072
fidelity-2 molecules, seed 42, the production _conditional_splits) and
measures, over the UNSEEN-target subset of the test split (targets whose
whole-graph WL hash never appears in train):

  - fraction whose WL-1 environment multiset is fully covered by train
  - fraction whose WL-2 environment multiset is fully covered by train

If the WL-2-covered fraction matches the measured unseen Top-10 (~0.82 at
both 650k and 875k steps), the plateau is the information ceiling of
hash-keyed spectra, not a model deficiency.

Usage: python tools/unseen_env_analysis.py [size=131072]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffspectra_tpu.data.pipeline import _conditional_splits
from diffspectra_tpu.data.synthetic import _wl_environments, generate


def whole_graph_hash(atom_type, edge_type, n):
    # same spirit as MolGraph.wl_hash: iterate WL to stability over the
    # molecule and hash the sorted multiset + counts
    import hashlib

    labels = [int(t) for t in atom_type[:n]]
    adj = edge_type[:n, :n]
    for _ in range(4):
        new = []
        for i in range(n):
            nbrs = sorted(
                (labels[j], int(adj[i, j])) for j in np.nonzero(adj[i])[0]
            )
            new.append(hash((labels[i], tuple(nbrs))) & 0xFFFFFFFFFFFF)
        labels = new
    return hashlib.md5(repr(sorted(labels)).encode()).hexdigest()


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    raw = generate(
        seed=42, size=size, max_n=29, fidelity=2,
        cache_dir="data/synthetic_cache",
    )
    n_mol = len(raw["num_atom"])
    splits = _conditional_splits(np.random.default_rng(42), n_mol)
    # the conditional-diffusion model trains on the SECOND train half (the
    # reference's split semantics; run_lib's generalization hashes use
    # exactly this split — run_lib.py:_train_hash_set)
    train_idx = splits[1]
    test_idx = splits[3]

    def envs(m):
        n = int(raw["num_atom"][m])
        return _wl_environments(raw["atom_type"][m], raw["edge_type"][m], n)

    train_graphs = set()
    train_wl1, train_wl2 = set(), set()
    for m in train_idx:
        n = int(raw["num_atom"][m])
        train_graphs.add(whole_graph_hash(raw["atom_type"][m], raw["edge_type"][m], n))
        w1, w2 = envs(int(m))
        train_wl1.update(w1)
        train_wl2.update(w2)

    unseen = []
    for m in test_idx:
        n = int(raw["num_atom"][m])
        if whole_graph_hash(raw["atom_type"][m], raw["edge_type"][m], n) not in train_graphs:
            unseen.append(int(m))

    cov1 = cov2 = 0
    for m in unseen:
        w1, w2 = envs(m)
        cov1 += all(lab in train_wl1 for lab in w1)
        cov2 += all(lab in train_wl2 for lab in w2)
    n_u = len(unseen) or 1
    print(
        f"size={size} test={len(test_idx)} unseen-graph targets={len(unseen)} "
        f"({len(unseen)/len(test_idx):.3f} of test)"
    )
    print(
        f"WL-1 environments fully train-covered: {cov1/n_u:.4f}  "
        f"WL-2 fully covered: {cov2/n_u:.4f}"
    )
    print(
        "verdict hint: measured unseen Top-10 ~= WL-2 coverage -> the "
        "plateau is the hash-spectrum information ceiling, not model error"
    )


if __name__ == "__main__":
    main()
