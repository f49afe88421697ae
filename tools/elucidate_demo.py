"""Demo: the standalone Elucidator on the committed production weights.

Generates a few FRESH synthetic fidelity-2 molecules (seed distinct from
the training data's seed-42 stream, so targets are drawn independently of
the train set), takes their raw IR spectra, and elucidates structures with
`diffspectra_tpu.api.Elucidator` loaded from the committed warm state.

Env knobs:
  WARM      warm-state npz     (default artifacts/warm_qm9s_ir.npz)
  TARGETS   number of spectra  (default 3)
  K         draws per spectrum (default 10)
  METHOD    sampling method    (default dpm_solver_sde)
  STEPS     reverse steps      (default 50)
  KNOWN_N   1 = condition on the true atom count (reference protocol);
            0 (default) = n_atoms UNKNOWN: marginalize over the histogram
            prior (the real-user serving mode — no crutch)

Runs on whatever backend JAX has (CPU works; slow but exact).
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, force=True)
    from diffspectra_tpu.api import Elucidator
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data.synthetic import generate
    from diffspectra_tpu.evaluation import compute_metrics as cm
    from diffspectra_tpu.evaluation.molgraph import from_decoded

    warm = os.environ.get("WARM", "/root/repo/artifacts/warm_qm9s_ir.npz")
    n_targets = int(os.environ.get("TARGETS", 3))
    k = int(os.environ.get("K", 10))

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.sampling.method = os.environ.get("METHOD", "dpm_solver_sde")
    cfg.sampling.steps = int(os.environ.get("STEPS", 50))

    el = Elucidator.from_warm_state(
        warm, config=cfg, overrides={"eval.bucket_sizes": ()}
    )

    data = generate(seed=7, size=n_targets, max_n=29, fidelity=2)
    hits = 0
    for m in range(n_targets):
        n = int(data["num_atom"][m])
        target = from_decoded(
            (
                data["pos"][m, :n],
                data["atom_type"][m, :n],
                data["edge_type"][m, :n, :n],
                data["fc"][m, :n],
            ),
            el.dataset_info["atom_decoder"],
        )
        known_n = os.environ.get("KNOWN_N", "0") == "1"
        res = el.elucidate(
            data["ir"][m], n_atoms=n if known_n else None,
            num_candidates=k, seed=m,
            draws_per_n=None if known_n else max(2, k // 4),
        )
        tid = cm.canonical_id(target)
        mode = "known n" if known_n else f"n marginalized ({res.num_draws} draws)"
        print(f"\n=== target {m}: {n} atoms ({mode}), id {tid}")
        hit_rank = None
        for rank, c in enumerate(res.candidates):
            cid = cm.canonical_id(c.molgraph)
            mark = " <-- TARGET" if cid == tid else ""
            if cid == tid and hit_rank is None:
                hit_rank = rank
            print(
                f"  #{rank + 1}  x{c.count} ({c.frequency:.0%})  "
                f"{c.smiles or cid}{mark}"
            )
        if hit_rank == 0:
            hits += 1
        print(f"  consensus {'HIT' if hit_rank == 0 else 'miss'}"
              f"{'' if hit_rank in (None, 0) else f' (rank {hit_rank + 1})'}")
    print(f"\nconsensus Top-1: {hits}/{n_targets}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
