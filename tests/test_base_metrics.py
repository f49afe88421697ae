"""Offline re-score pipeline: pickles -> metric CSVs round trip."""

import os
import pickle

import numpy as np

from diffspectra_tpu.evaluation.base_metrics import compute_metrics_for_saved_mols
from diffspectra_tpu.evaluation.molgraph import MolGraph


def _methane():
    d = 1.09 / np.sqrt(3)
    pos = np.array(
        [[0, 0, 0], [d, d, d], [d, -d, -d], [-d, d, -d], [-d, -d, d]], dtype=float
    )
    edges = np.zeros((5, 5), dtype=np.int64)
    for i in range(1, 5):
        edges[0, i] = edges[i, 0] = 1
    return MolGraph(["C", "H", "H", "H", "H"], np.zeros(5, np.int64), edges, pos)


def test_rescore_saved_molecules(tmp_path):
    g = _methane()
    base = tmp_path / "mols"
    os.makedirs(base)
    for name in ("complete_rdmols_2d.pkl", "sample_rdmols_3d.pkl", "groundtruth_rdmols.pkl"):
        with open(base / name, "wb") as f:
            pickle.dump([g, g, g], f)

    out = tmp_path / "results"
    compute_metrics_for_saved_mols(str(base), str(out))
    import pandas as pd

    for version in ("2d", "3d"):
        df = pd.read_csv(out / f"similarity_metrics_{version}.csv")
        top1 = df[df["Evaluation Metric"] == "Top-1 Accuracy"]["Value"].iloc[0]
        assert float(top1) == 1.0
        mces = df[df["Evaluation Metric"] == "MCES"]["Value"].iloc[0]
        assert float(mces) == 0.0


def test_rescore_missing_files_is_graceful(tmp_path):
    compute_metrics_for_saved_mols(str(tmp_path / "nope"), str(tmp_path / "out"))
