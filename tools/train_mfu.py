"""Train-step MFU / FLOP accounting on the real chip (VERDICT r2 next-4).

bench.py accounts inference FLOPs; this measures the TRAIN step: fwd+bwd
FLOPs from XLA's cost analysis over the jitted production train step
(losses + grads + optimizer + EMA, the same builder run_lib uses), timed
over a K-step sequence with donated state so the async queue stays full and
per-call dispatch RTT amortizes (the axon tunnel adds ~ms per call).

Prints one JSON line:
  {"train_step_ms", "graphs_per_sec", "train_tflops_per_sec",
   "train_mfu_bf16_peak", "flops_per_step"}

Env: MFU_BATCH (128), MFU_N (29 — static; bucketed steps run per-bucket
versions of the same program), MFU_STEPS (30), BENCH_PEAK_TFLOPS (197).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from diffspectra_tpu.training.step import get_step_fn
    from diffspectra_tpu.utils.scalers import get_data_scaler

    B = int(os.environ.get("MFU_BATCH", 128))
    steps = int(os.environ.get("MFU_STEPS", 30))
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0)) * 1e12

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 2048
    cfg.training.batch_size = B
    cfg.training.base_batch_size = B
    from _overrides import apply_env_overrides

    # MFU probes sweep config knobs (remat_policy, specformer_bf16, ...)
    # via the same TRAIN_OVERRIDES surface the launchers use
    apply_env_overrides(cfg)
    cfg = run_lib.resolve_runtime_config(cfg, 1)

    _, train_ds, _, _, _ = get_dataset(cfg)
    it = get_batch_iterator(train_ds, B, "ir", shuffle=True, seed=0)
    batch = next(it)
    rng = jax.random.PRNGKey(0)
    model, tx, state = run_lib._init_model_and_state(cfg, batch, rng)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    step_fn = get_step_fn(sch, model, tx, get_data_scaler(cfg), cfg, True)
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # cost analysis BEFORE burning steps (lower+compile is cached)
    ca = (
        jax.jit(step_fn)
        .lower(state, dev_batch, rng)
        .compile()
        .cost_analysis()
    )
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca["flops"])
    bytes_acc = float(ca.get("bytes accessed", float("nan")))

    # warm (compile). NB: block_until_ready returns before this relay's
    # queue drains (RESULTS.md timing methodology note) — every timed
    # region must end on a HOST MATERIALISATION of a result instead.
    state, loss = jstep(state, dev_batch, jax.random.PRNGKey(1))
    float(np.asarray(loss))

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(steps):
            state, loss = jstep(state, dev_batch, jax.random.fold_in(rng, i))
        float(np.asarray(loss))  # drains the async queue for real
        best = min(best, (time.perf_counter() - t0) / steps)

    tflops = flops / best / 1e12
    out = {
        "train_step_ms": round(best * 1e3, 2),
        "graphs_per_sec": round(B / best, 1),
        "train_tflops_per_sec": round(tflops, 3),
        "train_mfu_bf16_peak": round(tflops * 1e12 / peak, 5),
        "flops_per_step": flops,
        "bytes_per_step": bytes_acc,
        "hbm_gbps": round(bytes_acc / best / 1e9, 1)
        if bytes_acc == bytes_acc
        else None,
        "batch": B,
        "n_pad": int(batch["atom_mask"].shape[1]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
