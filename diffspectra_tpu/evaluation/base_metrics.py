"""Re-score saved molecule pickles offline.

Rewrite of ref eval_sampled_mols/base_metrics.py:90-192: load the pickled
2D/3D/ground-truth molecules exported by the eval pipeline
(``eval.save_mols=true``), validate pairs, and recompute the similarity
metric CSVs without resampling.

Usage:
  python -m diffspectra_tpu.evaluation.base_metrics --base_path exp/run/eval
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

from .compute_metrics import evaluate_jsonl_predictions
from .molgraph import MolGraph
from .rdkit_metric import HAS_RDKIT


def load_molecules(path: str):
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:  # pragma: no cover
        logging.error("Failed to load %s: %s", path, e)
        return None


def validate_and_prepare_mols(pred_mols, true_mols):
    """Filter to valid pairs (ref base_metrics.py:60-88)."""
    out_true, out_pred, skipped = [], [], 0
    for i in range(min(len(pred_mols), len(true_mols))):
        p, t = pred_mols[i], true_mols[i]
        if p is None or t is None:
            skipped += 1
            continue
        if isinstance(p, MolGraph):
            if p.n_atoms == 0 or not p.valence_ok():
                skipped += 1
                continue
        elif HAS_RDKIT:
            from rdkit import Chem

            try:
                Chem.SanitizeMol(p)
            except Exception:
                skipped += 1
                continue
        out_true.append(t)
        out_pred.append([p])
    return out_true, out_pred, skipped


def compute_metrics_for_saved_mols(base_path: str, output_path: str):
    """ref base_metrics.py:90-175."""
    os.makedirs(output_path, exist_ok=True)
    files = {
        "2d": os.path.join(base_path, "complete_rdmols_2d.pkl"),
        "3d": os.path.join(base_path, "sample_rdmols_3d.pkl"),
        "ground_truth": os.path.join(base_path, "groundtruth_rdmols.pkl"),
    }
    mols = {}
    for name, path in files.items():
        if not os.path.exists(path):
            logging.error("File not found: %s", path)
            return
        mols[name] = load_molecules(path)
        if mols[name] is None:
            return
        logging.info("Loaded %d molecules from %s", len(mols[name]), name)

    for version in ("2d", "3d"):
        true_v, pred_v, skipped = validate_and_prepare_mols(
            mols[version], mols["ground_truth"]
        )
        logging.info(
            "%s molecule pair statistics - Input: %d, Valid: %d, Skipped: %d",
            version.upper(), len(mols[version]), len(true_v), skipped,
        )
        if true_v:
            csv_path = os.path.join(output_path, f"similarity_metrics_{version}.csv")
            df = evaluate_jsonl_predictions((true_v, pred_v), csv_path)
            if df is not None:
                for _, row in df.iterrows():
                    logging.info(
                        "%s %s: %s", version.upper(), row["Evaluation Metric"],
                        row["Value"],
                    )


def main():
    parser = argparse.ArgumentParser(description="Compute metrics for saved molecules")
    parser.add_argument("--base_path", type=str, required=True)
    parser.add_argument("--ckpt", type=int, default=40)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    compute_metrics_for_saved_mols(
        os.path.join(args.base_path, f"molecules_ckpt_{args.ckpt}"),
        os.path.join(args.base_path, "metrics_results"),
    )


if __name__ == "__main__":
    main()
