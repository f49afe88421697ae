"""Quantify the n-free Elucidator against the n-known protocol
(VERDICT r3 next-7: "measure it properly").

The reference protocol feeds the TRUE heavy+H atom count of every target
into sampling (ref sampling.py:397-427) — information a real user of a
structure-elucidation service does not have. The api.Elucidator can
marginalize the count over the training histogram prior
(api.py::_elucidate_marginal). This tool measures what that costs in
accuracy and wall time, on >=NT held-out campaign-test targets:

  A (n-known): K_KNOWN consensus draws at the true atom count.
  B (n-free):  K_PER_N draws at each histogram-prior-plausible count
               (api._plausible_n, 95% prior coverage), consensus over ALL
               draws with prior tie-break — the serving-mode semantics of
               api.elucidate(n_atoms=None), batched across queries here so
               the protocol runs at production throughput (one bucketed
               sweep per count instead of per-query tiny batches).

Both protocols share compiled executables: per-round rows are padded to
QPR_A*K_KNOWN == QPR_B*K_PER_N so every (batch, n_pad) pair hits the same
jitted round function.

Scoring is 2D-graph exact match (canonical_id — isomorphism-invariant),
reported for aggregate and the unseen-target column (targets whose
whole-graph WL hash never occurs in the campaign train split), matching
the campaign reporting convention (RESULTS.md).

Env knobs:
  WARM        warm-state npz      (default artifacts/warm_qm9s_ir.npz)
  SIZE        campaign set size   (default 131072)
  FIDELITY    spectrum fidelity   (default 2 — match WARM's training data)
  NT          number of targets   (default 512)
  K_KNOWN     draws, protocol A   (default 10)
  K_PER_N     draws/count, B      (default 2)
  METHOD      sampling method     (default dpm_solver_sde)
  STEPS       reverse steps       (default 100)
  OUT         json output path    (default tools/pipeline_logs/nfree_eval.json)
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, force=True)
    import jax

    # the axon sitecustomize hook sets jax_platforms programmatically,
    # overriding the env var — re-assert it so JAX_PLATFORMS=cpu smokes
    # actually run on CPU (same guard as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffspectra_tpu.api import Elucidator
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data.pipeline import _conditional_splits
    from diffspectra_tpu.data.synthetic import generate
    from diffspectra_tpu.evaluation import compute_metrics as cm
    from diffspectra_tpu.evaluation.molgraph import from_decoded

    warm = os.environ.get("WARM", "/root/repo/artifacts/warm_qm9s_ir.npz")
    size = int(os.environ.get("SIZE", 131072))
    fidelity = int(os.environ.get("FIDELITY", 2))
    nt = int(os.environ.get("NT", 512))
    k_known = int(os.environ.get("K_KNOWN", 10))
    k_per_n = int(os.environ.get("K_PER_N", 2))
    steps = int(os.environ.get("STEPS", 100))
    method = os.environ.get("METHOD", "dpm_solver_sde")
    out_path = os.environ.get(
        "OUT", "tools/pipeline_logs/nfree_eval.json"
    )

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.sampling.method = method
    cfg.sampling.steps = steps

    el = Elucidator.from_warm_state(warm, config=cfg)

    # ---- campaign dataset, production split, held-out targets -----------
    raw = generate(
        seed=42, size=size, max_n=29, fidelity=fidelity,
        cache_dir="/root/repo/data/synthetic_cache",
    )
    split_rng = np.random.default_rng(42)
    first, second, _val, test = _conditional_splits(split_rng, size)
    train = np.concatenate([first, second])

    decoder = el.dataset_info["atom_decoder"]

    def graph(m):
        n = int(raw["num_atom"][m])
        return from_decoded(
            (
                raw["pos"][m, :n],
                raw["atom_type"][m, :n],
                raw["edge_type"][m, :n, :n],
                raw["fc"][m, :n],
            ),
            decoder,
        )

    logging.info("hashing train split for the unseen column (%d mols)",
                 len(train))
    train_hashes = {graph(m).wl_hash() for m in train}

    perm = np.random.default_rng(7).permutation(len(test))[:nt]
    targets = [int(test[i]) for i in perm]
    t_graphs = [graph(m) for m in targets]
    id_cache: dict = {}
    t_ids = [cm.canonical_id(g, _cache=id_cache) for g in t_graphs]
    t_unseen = np.array(
        [g.wl_hash() not in train_hashes for g in t_graphs], bool
    )
    spectra = [np.asarray(raw["ir"][m], np.float32) for m in targets]
    true_ns = [int(raw["num_atom"][m]) for m in targets]
    logging.info("%d targets (%d unseen-graph)", nt, int(t_unseen.sum()))

    ns = el._plausible_n()
    # shared round batch => shared executables between protocols
    qpr_a = 8
    rows = qpr_a * k_known
    qpr_b = max(1, rows // k_per_n)
    logging.info("plausible counts %s; round rows %d (qpr A=%d B=%d)",
                 ns, rows, qpr_a, qpr_b)

    def score(rank_ids):
        """rank_ids: per-query list of candidate canonical ids, best first."""
        top1 = np.array([r[0] == t for r, t in zip(rank_ids, t_ids)], bool)
        inlist = np.array([t in r for r, t in zip(rank_ids, t_ids)], bool)
        def col(mask):
            m = np.asarray(mask, bool)
            denom = max(1, int(m.sum()))
            return {
                "top1": float(top1[m].sum() / denom),
                "in_list": float(inlist[m].sum() / denom),
                "n": int(m.sum()),
            }
        return {
            "aggregate": col(np.ones(nt, bool)),
            "unseen": col(t_unseen),
            "seen": col(~t_unseen),
        }

    results = {"warm": warm, "fidelity": fidelity, "targets": nt,
               "unseen_targets": int(t_unseen.sum()), "method": method,
               "steps": steps, "plausible_counts": ns}

    # SKIP_AB=1: jump straight to the head protocol (C) — A/B re-runs cost
    # ~12 min of chip and their numbers are deterministic under fixed seeds
    skip_ab = os.environ.get("SKIP_AB", "") == "1"

    # ---------------- protocol A: true atom count ------------------------
    if not skip_ab:
        t0 = time.time()
        res_a = el.elucidate_batch(
            spectra, true_ns, num_candidates=k_known, seed=11,
            queries_per_round=qpr_a,
        )
        rank_a = [
            [cm.canonical_id(c.molgraph, _cache=id_cache) for c in r.candidates]
            for r in res_a
        ]
        wall_a = time.time() - t0
        results["n_known"] = {
            **score(rank_a), "draws_per_query": k_known, "wall_s": wall_a,
            "ms_per_query": 1000.0 * wall_a / nt,
        }
        logging.info("A (n-known, K=%d): %s wall %.1fs", k_known,
                     results["n_known"]["aggregate"], wall_a)

    # ---------------- protocol B: count marginalized ---------------------
    hist = el.dataset_info["train_n_nodes"]
    total = sum(hist.values()) or 1
    prior = {int(k): v / total for k, v in hist.items()}

    if not skip_ab:
        t0 = time.time()
        counts = [dict() for _ in range(nt)]  # qi -> {cid: [count, n, order]}
        for n in ns:
            res_n = el.elucidate_batch(
                spectra, [n] * nt, num_candidates=k_per_n, seed=100 + n,
                queries_per_round=qpr_b,
            )
            for qi, r in enumerate(res_n):
                for c in r.candidates:
                    cid = cm.canonical_id(c.molgraph, _cache=id_cache)
                    ent = counts[qi].get(cid)
                    if ent is None:
                        counts[qi][cid] = [c.count, c.molgraph.n_atoms,
                                           len(counts[qi])]
                    else:
                        ent[0] += c.count
        rank_b = []
        for qi in range(nt):
            ranked = sorted(
                counts[qi].items(),
                key=lambda kv: (-kv[1][0], -prior.get(kv[1][1], 0.0), kv[1][2]),
            )
            rank_b.append([cid for cid, _ in ranked])
        wall_b = time.time() - t0
        results["n_free"] = {
            **score(rank_b), "draws_per_query": k_per_n * len(ns),
            "wall_s": wall_b, "ms_per_query": 1000.0 * wall_b / nt,
        }
        logging.info("B (n-free, %d counts x K=%d): %s wall %.1fs", len(ns),
                     k_per_n, results["n_free"]["aggregate"], wall_b)

        # correct-count identification rate in n-free mode: how often the
        # top-ranked candidate's atom count equals the true count
        top_n_match = 0
        for qi in range(nt):
            if rank_b[qi]:
                top_cid = rank_b[qi][0]
                top_n_match += int(counts[qi][top_cid][1] == true_ns[qi])
        results["n_free"]["top1_count_correct"] = top_n_match / nt

    # ------- protocol C: head-predicted counts (COUNT_HEAD env) ----------
    head_path = os.environ.get("COUNT_HEAD", "")
    if head_path:
        from diffspectra_tpu.models import atom_count as ac

        head, hparams, hmeta = ac.load_head(head_path)
        hparams = jax.device_put(hparams)

        import jax.numpy as jnp

        @jax.jit
        def embed(specs):
            return ac.encode_spec_pooled(el.model, el.variables, specs)

        t0 = time.time()
        embs = []
        ebs = 256
        for i in range(0, nt, ebs):
            spec_rows = np.stack(
                [np.log10(s + 1.0) for s in spectra[i:i + ebs]]
            ).astype(np.float32)
            embs.append(np.asarray(embed(jnp.asarray(spec_rows))))
        embs = np.concatenate(embs)
        probs = np.asarray(ac.predict_count_probs(head, hparams, embs))
        csets = ac.top_counts(probs, coverage=0.9, cap=3)
        pred_top1_n = probs.argmax(-1)
        count_top1 = float((pred_top1_n == np.asarray(true_ns)).mean())
        count_cover = float(
            np.mean([t in c for (c, _), t in zip(csets, true_ns)])
        )
        n_ranks = max(len(c) for c, _ in csets)
        k_head = max(2, k_known // max(1, n_ranks))
        logging.info(
            "C: head %s (meta %s) | eval-target count top-1 %.4f, "
            "top_counts cover %.4f, max ranks %d, K/count %d",
            head_path, hmeta, count_top1, count_cover, n_ranks, k_head,
        )

        counts_c = [dict() for _ in range(nt)]
        t0 = time.time()
        for r in range(n_ranks):
            ns_r = [
                c[min(r, len(c) - 1)] for (c, _) in csets
            ]
            res_r = el.elucidate_batch(
                spectra, ns_r, num_candidates=k_head, seed=500 + r,
                queries_per_round=max(1, rows // k_head),
            )
            for qi, res in enumerate(res_r):
                for c in res.candidates:
                    cid = cm.canonical_id(c.molgraph, _cache=id_cache)
                    ent = counts_c[qi].get(cid)
                    if ent is None:
                        counts_c[qi][cid] = [c.count, c.molgraph.n_atoms,
                                             len(counts_c[qi])]
                    else:
                        ent[0] += c.count
        rank_c = []
        for qi in range(nt):
            pprob = dict(zip(*csets[qi]))
            ranked = sorted(
                counts_c[qi].items(),
                key=lambda kv: (
                    -kv[1][0], -pprob.get(kv[1][1], 0.0), kv[1][2]
                ),
            )
            rank_c.append([cid for cid, _ in ranked])
        wall_c = time.time() - t0
        results["n_free_head"] = {
            **score(rank_c),
            "draws_per_query": k_head * n_ranks,
            "wall_s": wall_c, "ms_per_query": 1000.0 * wall_c / nt,
            "count_top1": count_top1, "count_cover90": count_cover,
            "head": head_path, "head_meta": hmeta,
        }
        top_n_match = 0
        for qi in range(nt):
            if rank_c[qi]:
                top_cid = rank_c[qi][0]
                top_n_match += int(counts_c[qi][top_cid][1] == true_ns[qi])
        results["n_free_head"]["top1_count_correct"] = top_n_match / nt
        logging.info(
            "C (n-free head, <=%d counts x K=%d): %s wall %.1fs", n_ranks,
            k_head, results["n_free_head"]["aggregate"], wall_c,
        )

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print("NFREE_EVAL OK")


if __name__ == "__main__":
    main()
