"""Forward-only probe for the allspectra warm-start blow-up: is the huge
loss context-driven (fresh SpecFormer head feeding the trained adaLN trunk)
or trunk-intrinsic? Prints output magnitudes with and without context."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp
    import logging

    from diffspectra_tpu import run_lib
    from diffspectra_tpu import warm_state as warm_lib
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data.pipeline import get_batch_iterator, get_dataset
    from diffspectra_tpu.models.dmt import encode_context
    from diffspectra_tpu.utils.scalers import get_data_scaler
    from diffspectra_tpu.training.losses import process_edge_batch
    from _overrides import apply_env_overrides

    logging.basicConfig(level=logging.INFO, stream=sys.stdout, force=True)

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 131072
    cfg.training.base_batch_size = 128
    cfg.training.batch_size = 128
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
    batch = next(it)
    batch = {k: v for k, v in batch.items() if k != "num_atom"}

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init = jax.random.split(rng)
    model, tx, state_fresh = run_lib._init_model_and_state(cfg, batch, k_init)
    state = warm_lib.load_warm_state(
        state_fresh, "/root/repo/artifacts/warm_qm9s_f4.npz", partial=True
    )

    if os.environ.get("ZERO_HEAD", "") == "1":
        p = dict(state.params)
        import flax

        p = flax.core.unfreeze(p) if hasattr(flax.core, "unfreeze") else p
        k = p["cond_encoder"]["head_linear"]["kernel"]
        p["cond_encoder"]["head_linear"]["kernel"] = jnp.zeros_like(k)
        state = state.replace(params=p)
        print("ZERO_HEAD: head_linear kernel zeroed", flush=True)

    scaler = get_data_scaler(cfg)
    xh, edge_x, node_mask, edge_mask, context = process_edge_batch(
        batch, scaler, cfg.model.name, bool(cfg.model.include_fc_charge)
    )
    bs, n, _ = xh.shape
    context = jax.tree_util.tree_map(jnp.asarray, context)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # context embedding stats (through cond_encoder + cond_lin)
    ctx = encode_context(model, variables, context, deterministic=True)
    print(
        f"ctx emb: shape {ctx.shape} max|.| {float(jnp.abs(ctx).max()):.4e} "
        f"mean|.| {float(jnp.abs(ctx).mean()):.4e} "
        f"std {float(ctx.std()):.4e}",
        flush=True,
    )

    from diffspectra_tpu.diffusion.schedule import NoiseScheduleVP

    sched = NoiseScheduleVP(
        cfg.sde.schedule,
        continuous_beta_0=cfg.sde.continuous_beta_0,
        continuous_beta_1=cfg.sde.continuous_beta_1,
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("use_ctx",))
    def fwd(t_scalar, use_ctx, key):
        t = jnp.full((bs,), t_scalar)
        alpha_t, sigma_t = sched.marginal_prob(t)
        noise = jax.random.normal(key, xh.shape) * node_mask
        z_t = alpha_t[:, None, None] * xh + sigma_t[:, None, None] * noise
        noise_level = jnp.log(alpha_t**2 / sigma_t**2)
        pred, edge_pred = model.apply(
            variables,
            t, z_t, node_mask, edge_mask,
            context if use_ctx else None,
            edge_x=edge_x * alpha_t[:, None, None, None],
            noise_level=noise_level,
            deterministic=True,
        )
        return (
            jnp.abs(pred[:, :, :3]).max(), jnp.abs(pred[:, :, 3:]).max(),
            jnp.abs(edge_pred).max(),
        )

    for use_ctx in (True, False):
        tag = "WITH ctx" if use_ctx else "NO ctx  "
        for t_val in (0.9, 0.5, 0.1, 0.01, 1e-4):
            k = jax.random.PRNGKey(7)
            mp, ma, me = fwd(t_val, use_ctx, k)
            print(
                f"{tag} t={t_val:<7} max|pos| {float(mp):.4e} "
                f"max|atom| {float(ma):.4e} max|edge| {float(me):.4e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
