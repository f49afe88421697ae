"""Root-cause probe for the r4 allspectra NaN divergence (VERDICT r5 next-1).

Reproduces the campaign's partial warm start (allspectra model from the
IR-only fidelity-4 state, tools/r4_allspectra.sh) and answers, in order:

1. Is the training loss already wrong AT the warm state (interface bug in
   the partial restore), or does it blow up during the first steps
   (optimization dynamics)?
2. Which loss term / which parameter group carries the blow-up?

Usage: python tools/diag_as_nan.py [n_steps=300]
"""

import os
import sys
import logging

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from diffspectra_tpu import run_lib
    from diffspectra_tpu import warm_state as warm_lib
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data.pipeline import get_batch_iterator, get_dataset
    from diffspectra_tpu.diffusion.schedule import NoiseScheduleVP
    from diffspectra_tpu.training import optim as optim_lib
    from diffspectra_tpu.training.step import get_step_fn, _make_apply_fn, make_loss_fn
    from diffspectra_tpu.utils.scalers import get_data_scaler
    from _overrides import apply_env_overrides

    logging.basicConfig(level=logging.INFO, stream=sys.stdout, force=True)
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 131072
    cfg.training.base_batch_size = 128
    cfg.training.batch_size = 128
    cfg.optim.warmup = 5000
    with cfg.unlocked():
        cfg.training.warm_start_partial = True
    os.environ.setdefault(
        "TRAIN_OVERRIDES",
        "data.bucket_sizes=(17,21,25,29),data.synthetic_fidelity=4,"
        "data.synthetic_cache='data/synthetic_cache',"
        "data.spectra_version='allspectra'",
    )
    apply_env_overrides(cfg)
    cfg = run_lib.resolve_runtime_config(cfg, 1)
    run_lib.set_random_seed(cfg)

    _, train_ds, *_ = get_dataset(cfg)
    it = get_batch_iterator(
        train_ds, cfg.training.batch_size, cfg.data.spectra_version,
        shuffle=True, seed=cfg.seed,
        bucket_sizes=tuple(cfg.data.get("bucket_sizes", ())), drop_last=True,
    )
    batches = []
    for _ in range(8):
        b = next(it)
        b = {k: v for k, v in b.items() if k != "num_atom"}
        batches.append(b)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init = jax.random.split(rng)
    model, tx, state_fresh = run_lib._init_model_and_state(cfg, batches[0], k_init)
    zero_fresh = ()
    if os.environ.get("ZERO_FRESH", "1") == "1":
        zero_fresh = ("cond_encoder/head_linear/kernel",)
    state_warm = warm_lib.load_warm_state(
        state_fresh, "/root/repo/artifacts/warm_qm9s_f4.npz", partial=True,
        zero_fresh=zero_fresh,
    )

    noise_scheduler = NoiseScheduleVP(
        cfg.sde.schedule,
        continuous_beta_0=cfg.sde.continuous_beta_0,
        continuous_beta_1=cfg.sde.continuous_beta_1,
    )
    scaler = get_data_scaler(cfg)
    loss_fn = make_loss_fn(noise_scheduler, scaler, cfg)

    print(f"=== training dynamics from WARM state, {n_steps} steps ===", flush=True)
    step_fn = jax.jit(
        get_step_fn(noise_scheduler, model, tx, scaler, cfg), donate_argnums=(0,)
    )
    state = state_warm
    it2 = get_batch_iterator(
        train_ds, cfg.training.batch_size, cfg.data.spectra_version,
        shuffle=True, seed=cfg.seed + 1,
        bucket_sizes=tuple(cfg.data.get("bucket_sizes", ())), drop_last=True,
    )
    losses = []
    for s in range(n_steps):
        try:
            b = next(it2)
        except StopIteration:
            it2 = get_batch_iterator(
                train_ds, cfg.training.batch_size, cfg.data.spectra_version,
                shuffle=True, seed=cfg.seed + 2 + s,
                bucket_sizes=tuple(cfg.data.get("bucket_sizes", ())),
                drop_last=True,
            )
            b = next(it2)
        b = {k: v for k, v in b.items() if k != "num_atom"}
        rng, k = jax.random.split(rng)
        state, loss = step_fn(state, b, k)
        lv = float(loss)
        losses.append(lv)
        if s < 40 or s % 10 == 0 or not np.isfinite(lv) or lv > 1e6:
            print(f"step {s}: loss {lv:.6e}", flush=True)
        if not np.isfinite(lv):
            print(f"FIRST NON-FINITE at step {s}", flush=True)
            break
    print("done", flush=True)


if __name__ == "__main__":
    main()
