"""Structural analysis of Top-1 misses from an eval's detailed-scores JSON.

Answers "how far are the misses?" — the detailed per-pair scores that
`compute_similarity_metrics` writes (run_lib.py eval pipeline, same surface
as ref compute_metrics.py:294-317) contain per-target exact-match booleans
and MCES graph-edit distances. The MCES distribution over the *missed*
targets separates two regimes with different remedies:

- misses at MCES <= 2 (one or two bond edits) are sampling near-misses:
  more candidates per spectrum (eval.num_candidates) or more sampling
  stochasticity converts a large fraction of them into Top-K hits;
- misses at MCES >= 4 are model errors: only more training / more data
  move them.

Usage:
  python tools/miss_analysis.py exp/<run>/eval/similarity_metrics_2d_ckpt_26_detailed_scores.json

Prints one human table and one machine-readable JSON line.
"""

import json
import sys

import numpy as np

MCES_BUCKETS = (1, 2, 3, 5, 8)


def analyze(detailed: dict) -> dict:
    hits = np.asarray(detailed["Top-1 Accuracy"], dtype=bool)
    mces = np.asarray(detailed["MCES"], dtype=float)
    out = {
        "pairs": int(hits.size),
        "top1": float(hits.mean()) if hits.size else float("nan"),
    }
    miss = mces[~hits]
    out["miss_mces_mean"] = float(np.nanmean(miss)) if miss.size else float("nan")
    out["miss_mces_median"] = float(np.nanmedian(miss)) if miss.size else float("nan")
    for thr in MCES_BUCKETS:
        frac = float((miss <= thr).mean()) if miss.size else float("nan")
        out[f"miss_frac_mces_le_{thr}"] = frac
    tani = detailed.get("Tanimoto Similarity (Morgan)")
    if tani is not None and miss.size:
        out["miss_tanimoto_mean"] = float(np.nanmean(np.asarray(tani, float)[~hits]))
    return out


def main(path: str) -> int:
    with open(path) as f:
        detailed = json.load(f)
    res = analyze(detailed)
    print(f"pairs={res['pairs']}  Top-1={res['top1']:.4f}")
    print(
        "miss MCES: mean %.2f median %.1f"
        % (res["miss_mces_mean"], res["miss_mces_median"])
    )
    for thr in MCES_BUCKETS:
        print(f"  misses within MCES<={thr}: {res[f'miss_frac_mces_le_{thr}']:.3f}")
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
