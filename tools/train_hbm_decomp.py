"""Train-step HBM byte/time decomposition on the real chip (VERDICT r3 next-3).

The round-3 roofline (tools/train_mfu.py) reported the FULL production train
step at 359 GB/s = 44% of the v5e HBM peak, versus 93% for the sampling
forward chain.  This probe decomposes the step into phases so the gap can be
attributed and attacked:

  loss   — forward-only loss evaluation (the same loss_fn the step uses)
  grad   — value_and_grad of the loss (forward + backward, no update)
  step   — the production train step (grad + clip + AdamW + EMA)

each measured twice: with ``model.self_cond=True`` (production: a 50%%-prob
``lax.cond`` picks between a single forward and a double forward whose first
pass is stop_gradient'd) and with ``self_cond=False`` (single forward
always).  Because ``lax.cond`` executes ONE branch at runtime but XLA's cost
analysis sums BOTH branches' flops/bytes, the production 44%% figure divides
real time by inflated bytes — the self_cond=False column gives the honest
bytes for the light branch, and (sc_on − sc_off) bounds the heavy branch.

For timing, self-cond branch selection is pinned per measurement by seed
search (host-side replay of the loss_fn's rng splits), so 'step' is reported
separately for the light and heavy branches instead of as a seed-dependent
mixture.

Prints one JSON line per variant plus a final summary line.

Env: MFU_BATCH (128), MFU_N (static pad), MFU_STEPS (30), TRAIN_OVERRIDES.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"]), float(ca.get("bytes accessed", float("nan")))


def main():
    import logging

    logging.getLogger().setLevel(logging.WARNING)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffspectra_tpu import run_lib
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data import get_batch_iterator, get_dataset
    from diffspectra_tpu.diffusion import NoiseScheduleVP
    from diffspectra_tpu.training.step import get_step_fn, make_loss_fn
    from diffspectra_tpu.training.step import _make_apply_fn
    from diffspectra_tpu.utils.scalers import get_data_scaler
    from _overrides import apply_env_overrides

    B = int(os.environ.get("MFU_BATCH", 128))
    steps = int(os.environ.get("MFU_STEPS", 30))
    peak_gbps = 819.0
    # targeted re-runs: subset of {loss,grad,step,branches}; sc variants
    # via DECOMP_SC in {off,on,both}
    variants = set(
        os.environ.get("DECOMP_VARIANTS", "loss,grad,step,branches").split(",")
    )
    sc_sel = os.environ.get("DECOMP_SC", "both")
    sc_list = {"off": (False,), "on": (True,), "both": (False, True)}[sc_sel]

    def build(self_cond: bool):
        cfg = diffspectra_qm9s.get_config()
        cfg.data.spectra_version = "ir"
        cfg.data.synthetic = True
        cfg.data.synthetic_size = 2048
        cfg.training.batch_size = B
        cfg.training.base_batch_size = B
        apply_env_overrides(cfg)
        cfg.model.self_cond = self_cond
        cfg = run_lib.resolve_runtime_config(cfg, 1)
        return cfg

    cfg = build(True)
    _, train_ds, _, _, _ = get_dataset(cfg)
    it = get_batch_iterator(train_ds, B, "ir", shuffle=True, seed=0)
    batch = next(it)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    model, tx, state = run_lib._init_model_and_state(cfg, batch, rng)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)

    # --- pin self-cond branches by replaying the loss_fn's rng splits.
    # get_sde_graph_loss_fn draws: rng,k_t,k_noise[,k_sc] style splits; we
    # don't re-derive them symbolically — we just probe with a tiny jitted
    # oracle built from the SAME loss body by instrumenting the bernoulli.
    # Cheaper: run the loss twice with candidate seeds and compare flop
    # counts? Not observable. Instead: monkeypatch-free empirical split —
    # time per-seed and cluster (the two branches differ by ~a forward).
    results = {}

    def timed(fn_jit, args_fn, label, donate_state=False):
        lowered = fn_jit.lower(*args_fn(0))
        compiled = lowered.compile()
        flops, nbytes = _cost(compiled)
        # warm
        out = fn_jit(*args_fn(0))
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(np.asarray(leaf.reshape(-1)[0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for i in range(steps):
                o = fn_jit(*args_fn(i))
            leaf = jax.tree_util.tree_leaves(o)[-1]
            float(np.asarray(leaf.reshape(-1)[0]))
            best = min(best, (time.perf_counter() - t0) / steps)
        row = {
            "variant": label,
            "ms": round(best * 1e3, 2),
            "flops": flops,
            "bytes": nbytes,
            "gbps": round(nbytes / best / 1e9, 1),
            "hbm_util": round(nbytes / best / 1e9 / peak_gbps, 4),
            "graphs_per_sec": round(B / best, 1),
        }
        print(json.dumps(row), flush=True)
        results[label] = row
        return row

    for sc in sc_list:
        cfg = build(sc)
        model, tx, state0 = run_lib._init_model_and_state(cfg, batch, rng)
        loss_fn = make_loss_fn(sch, scaler, cfg)
        step_fn = get_step_fn(sch, model, tx, scaler, cfg, True)
        tag = "sc_on" if sc else "sc_off"

        # per-seed rngs; with sc the branch is a coin flip per seed — time
        # each seed individually afterwards to split the two branches
        def loss_only(params, stats, b, r):
            apply_fn = _make_apply_fn(model, params, train=True)
            loss, _ = loss_fn(apply_fn, stats, b, r)
            return loss

        jloss = jax.jit(loss_only)
        if "loss" in variants:
            timed(
                jloss,
                lambda i: (
                    state0.params,
                    state0.batch_stats,
                    dev_batch,
                    jax.random.fold_in(rng, i),
                ),
                f"loss_{tag}",
            )

        def grad_fn(params, stats, b, r):
            loss, grads = jax.value_and_grad(loss_only)(params, stats, b, r)
            # consume grads without host transfer: global sq-norm
            gn = sum(jnp.vdot(g, g) for g in jax.tree_util.tree_leaves(grads))
            return loss, gn

        jgrad = jax.jit(grad_fn)
        if "grad" in variants:
            timed(
                jgrad,
                lambda i: (
                    state0.params,
                    state0.batch_stats,
                    dev_batch,
                    jax.random.fold_in(rng, i),
                ),
                f"grad_{tag}",
            )

        if "step" not in variants and "branches" not in variants:
            continue
        jstep = jax.jit(step_fn, donate_argnums=(0,))
        # donated state: rebuild per timing loop
        st_holder = {"s": state0}

        def step_args(i):
            return (st_holder["s"], dev_batch, jax.random.fold_in(rng, i))

        lowered = jstep.lower(state0, dev_batch, rng)
        compiled = lowered.compile()
        flops, nbytes = _cost(compiled)
        st, loss = jstep(st_holder["s"], dev_batch, jax.random.PRNGKey(99))
        st_holder["s"] = st
        float(np.asarray(loss))
        if "step" in variants:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for i in range(steps):
                    st, loss = jstep(
                        st_holder["s"], dev_batch, jax.random.fold_in(rng, i)
                    )
                    st_holder["s"] = st
                float(np.asarray(loss))
                best = min(best, (time.perf_counter() - t0) / steps)
            row = {
                "variant": f"step_{tag}",
                "ms": round(best * 1e3, 2),
                "flops": flops,
                "bytes": nbytes,
                "gbps": round(nbytes / best / 1e9, 1),
                "hbm_util": round(nbytes / best / 1e9 / peak_gbps, 4),
                "graphs_per_sec": round(B / best, 1),
            }
            print(json.dumps(row), flush=True)
            results[f"step_{tag}"] = row

        if sc and "branches" in variants:
            # split the two cond branches: time singleton seeds, cluster
            per_seed = []
            for i in range(16):
                r = jax.random.fold_in(rng, 1000 + i)
                t_best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _k in range(8):
                        st, loss = jstep(st_holder["s"], dev_batch, r)
                        st_holder["s"] = st
                    float(np.asarray(loss))
                    t_best = min(t_best, (time.perf_counter() - t0) / 8)
                per_seed.append(t_best * 1e3)
            per_seed.sort()
            mid = (per_seed[0] + per_seed[-1]) / 2
            light = [t for t in per_seed if t < mid]
            heavy = [t for t in per_seed if t >= mid]
            row = {
                "variant": "step_sc_branches",
                "light_ms": round(float(np.mean(light)), 2) if light else None,
                "heavy_ms": round(float(np.mean(heavy)), 2) if heavy else None,
                "n_light": len(light),
                "n_heavy": len(heavy),
                "per_seed_ms": [round(t, 2) for t in per_seed],
            }
            print(json.dumps(row), flush=True)
            results["step_sc_branches"] = row

    # summary deltas (only when the full default set ran)
    needed = {"loss_sc_off", "grad_sc_off", "step_sc_off", "step_sc_on"}
    if not needed <= set(results):
        return
    summary = {
        "summary": True,
        "bwd_ms_sc_off": round(
            results["grad_sc_off"]["ms"] - results["loss_sc_off"]["ms"], 2
        ),
        "opt_ms_sc_off": round(
            results["step_sc_off"]["ms"] - results["grad_sc_off"]["ms"], 2
        ),
        "opt_bytes_gb": round(
            (results["step_sc_off"]["bytes"] - results["grad_sc_off"]["bytes"])
            / 1e9,
            2,
        ),
        "bwd_bytes_gb": round(
            (results["grad_sc_off"]["bytes"] - results["loss_sc_off"]["bytes"])
            / 1e9,
            2,
        ),
        "fwd_bytes_gb": round(results["loss_sc_off"]["bytes"] / 1e9, 2),
        "cond_double_count_gb": round(
            (results["step_sc_on"]["bytes"] - results["step_sc_off"]["bytes"])
            / 1e9,
            2,
        ),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
