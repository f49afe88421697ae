"""Exact identifiability ceiling for the CURRENT quality-run protocol.

tools/ceiling_analysis.py estimates the generator-asymptotic ceiling; this
script computes the ceiling for the finite-dataset protocol actually used
by the quality runs: the model trains on the train split of the synthetic
set and is evaluated on test-split targets, conditioned on the target's
spectrum (+ true atom count). Since the fidelity-1 spectrum is a function
of only (bond-pattern counts, element counts), the best ANY model can do is
learn the empirical class -> structure-distribution map of the train split
and answer its mode:

  Top-1 ceiling  = P_test[ target == modal train structure of its class ]
  Top-K ceiling  = P_test[ target among top-K train structures of class ]

Targets whose class never occurs in train contribute ~0 (the model has no
information beyond the generator prior over an unseen spectrum).

Usage: python tools/protocol_ceiling.py [size=32768] [fidelity=1]
"""

import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffspectra_tpu.data.pipeline import _conditional_splits
from diffspectra_tpu.data.synthetic import generate
from tools.ceiling_analysis import fingerprint_and_hash


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    fidelity = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    seed = 42  # config.seed of the quality runs
    raw = generate(
        seed, size, 29, fidelity=fidelity,
        cache_dir="/root/repo/data/synthetic_cache",
    )
    split_rng = np.random.default_rng(seed)
    first, second, val, test = _conditional_splits(split_rng, size)
    train = np.concatenate([first, second])

    keys, hashes = [], []
    for m in range(size):
        ck, h = fingerprint_and_hash(
            raw["atom_type"][m], raw["pos"][m], raw["edge_type"][m],
            int(raw["num_atom"][m]), fidelity=fidelity,
        )
        keys.append(ck)
        hashes.append(h)

    train_classes = defaultdict(Counter)
    for m in train:
        train_classes[keys[m]][hashes[m]] += 1

    hits1 = hits10 = seen = 0
    for m in test:
        ctr = train_classes.get(keys[m])
        if ctr is None:
            continue
        seen += 1
        ranked = [h for h, _ in ctr.most_common()]
        if hashes[m] == ranked[0]:
            hits1 += 1
        if hashes[m] in ranked[:10]:
            hits10 += 1

    n_test = len(test)
    print(
        f"size={size} fidelity={fidelity} test={n_test} "
        f"class-seen-in-train={seen/n_test:.3f}\n"
        f"Top-1 ceiling={hits1/n_test:.4f} Top-10 ceiling={hits10/n_test:.4f}"
    )


if __name__ == "__main__":
    main()
