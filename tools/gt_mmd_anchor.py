"""GT-vs-GT geometry-MMD anchor (VERDICT r3 next-2).

The fidelity-3 ring eval reported bond/angle/dihedral MMDs with no scale:
nothing said what a PERFECT model would score. This computes that floor —
the MMD between two disjoint ground-truth draws of the same campaign test
split, using the exact eval-protocol machinery (cal_geometry top-symbol
distributions + multi-kernel Gaussian MMD, ref cal_geometry.py:287,
mmd.py:6-63). A model's MMD is only meaningfully "bad" to the extent it
exceeds this same-size-sample floor.

Protocol match: the campaign eval builds target stats from the FULL test
split and scores N_GEN generated molecules against them. Here the "model"
is N_GEN ground-truth test molecules (disjoint from nothing — they are a
subset of the target pool, exactly as a perfect generator's draws would
be), plus a second anchor where target stats come from the train split
(fully disjoint draw of the same generator distribution).

Usage/env:
  SIZE=32768 FIDELITY=3 N_GEN=1000 python tools/gt_mmd_anchor.py
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, force=True)
    from diffspectra_tpu.data.info import get_dataset_info
    from diffspectra_tpu.data.pipeline import _conditional_splits
    from diffspectra_tpu.data.synthetic import generate
    from diffspectra_tpu.evaluation.cal_geometry import (
        cal_bond_angle,
        cal_bond_distance,
        cal_dihedral_angle,
        compute_geo_mmd,
    )
    from diffspectra_tpu.evaluation.molgraph import from_decoded

    size = int(os.environ.get("SIZE", 32768))
    fidelity = int(os.environ.get("FIDELITY", 3))
    n_gen = int(os.environ.get("N_GEN", 1000))

    raw = generate(
        seed=42, size=size, max_n=29, fidelity=fidelity,
        cache_dir="/root/repo/data/synthetic_cache",
    )
    split_rng = np.random.default_rng(42)
    first, second, _val, test = _conditional_splits(split_rng, size)
    train = np.concatenate([first, second])
    info = get_dataset_info("qm9_second_half")
    decoder = info["atom_decoder"]

    def graphs(idx):
        out = []
        for m in idx:
            n = int(raw["num_atom"][m])
            out.append(
                from_decoded(
                    (
                        raw["pos"][m, :n],
                        raw["atom_type"][m, :n],
                        raw["edge_type"][m, :n, :n],
                        raw["fc"][m, :n],
                    ),
                    decoder,
                )
            )
        return out

    test_graphs = graphs(test)
    gen_idx = np.random.default_rng(5).permutation(len(test))[:n_gen]
    gt_draw = [test_graphs[i] for i in gen_idx]
    # cap train stats at the test-split size: MMD between finite samples
    # depends on sample size, so both anchors use comparable set sizes
    tr_idx = np.random.default_rng(6).permutation(len(train))[: len(test)]
    train_graphs = graphs(tr_idx)

    def anchor(target_graphs, label):
        tar = {
            **cal_bond_distance(target_graphs, info["top_bond_sym"]),
            **cal_bond_angle(target_graphs, info["top_angle_sym"]),
            **cal_dihedral_angle(target_graphs, info["top_dihedral_sym"]),
        }
        res = {}
        res.update(compute_geo_mmd(
            gt_draw, tar, cal_bond_distance, info["top_bond_sym"],
            "bond_length_mean"))
        res.update(compute_geo_mmd(
            gt_draw, tar, cal_bond_angle, info["top_angle_sym"],
            "bond_angle_mean"))
        res.update(compute_geo_mmd(
            gt_draw, tar, cal_dihedral_angle, info["top_dihedral_sym"],
            "dihedral_angle_mean"))
        means = {k: float(res[k]) for k in
                 ("bond_length_mean", "bond_angle_mean", "dihedral_angle_mean")}
        logging.info("%s anchor: %s", label, means)
        return means

    out = {
        "size": size, "fidelity": fidelity, "n_gen": n_gen,
        # same-pool floor: the eval's exact target stats (full test split)
        "gt_vs_test_stats": anchor(test_graphs, "test-pool"),
        # disjoint-draw floor: stats from an equal-size train-split draw
        "gt_vs_train_stats": anchor(train_graphs, "train-pool"),
    }
    print(json.dumps(out))
    print("GT_MMD_ANCHOR OK")


if __name__ == "__main__":
    main()
