"""Benchmark: sampled mols/sec for the 1000-step conditional reverse
diffusion on the flagship reference-scale DMT (nf=256, 8 blocks, 16 heads,
IR conditioning, N=29), measured on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: compile the jitted scan once, run a timed 50-step scan at batch
BATCH, extrapolate per-step cost to the reference's 1000-step protocol
(ref configs/diffspectra_qm9s.py:133, sampling.py:570). The spectra encoder
runs once per batch (hoisted out of the loop) exactly as in production
sampling.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is a documented engineering estimate of the reference
PyTorch pipeline on one A100: ~3.8e11 FLOP per model call at batch 128,
fp32 PyG scatter kernels at low MXU/TC utilisation plus 1000 host-dispatched
steps with DataParallel scatter/gather -> ~0.35 mols/s/GPU. Replace with a
measured number when the reference can be run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_A100_EST_MOLS_PER_SEC = 0.35

BATCH = int(os.environ.get("BENCH_BATCH", 128))
TIMED_STEPS = int(os.environ.get("BENCH_STEPS", 25))
PROTOCOL_STEPS = 1000


def main():
    import jax

    # persistent compilation cache: the ~5 min scan compile happens once per
    # machine, later invocations hit the cache
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.diffusion import NoiseScheduleVP
    from diffspectra_tpu.models.dmt import DMT, encode_context
    from diffspectra_tpu.sampling import AncestralSampler, make_time_steps
    from diffspectra_tpu.utils import masks as M
    from diffspectra_tpu.utils.scalers import get_self_cond_fn

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.model.dropout = 0.0
    # inference path: fully unrolled block scan (see run_lib._inference_model)
    cfg.model.scan_unroll = cfg.model.n_layers

    n = cfg.data.max_node
    bs = BATCH
    key = jax.random.PRNGKey(0)
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)

    # realistic atom-count mix
    import numpy as np

    rng = np.random.default_rng(0)
    n_nodes = jnp.asarray(rng.integers(12, n + 1, size=bs))
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    ctx = jnp.abs(jax.random.normal(key, (bs, 3501)))
    xh_dim = 3 + cfg.data.atom_types + 1
    variables = jax.jit(model.init)(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, xh_dim)), node_mask, edge_mask,
        ctx, edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )

    def make_sampler(steps):
        ts = make_time_steps(sch, steps)
        return AncestralSampler(
            sch, ts, model_pred_data=True, pred_edge=True, self_cond=True,
            cond_process_fn=get_self_cond_fn(cfg),
        )

    sampler = make_sampler(TIMED_STEPS)

    # params are jit ARGUMENTS: closing over them would embed ~7M constants
    # in the XLA graph and blow up TPU compile time
    @jax.jit
    def run(variables, rng):
        def model_apply(t, x, nm, em, edge_x, nl, cond_x, cond_edge_x, has_cond, c_emb):
            return model.apply(
                variables, t, x, nm, em, None, edge_x=edge_x, noise_level=nl,
                cond_x=cond_x, cond_edge_x=cond_edge_x, has_cond=has_cond,
                context_emb=c_emb,
            )

        k1, k2, k3 = jax.random.split(rng, 3)
        z = M.sample_combined_position_feature_noise(k1, bs, n, xh_dim - 3, node_mask)
        edge_z = M.sample_symmetric_edge_feature_noise(k2, bs, n, 2, edge_mask)
        ctx_emb = encode_context(model, variables, ctx)
        return sampler.sampling(model_apply, k3, z, node_mask, edge_mask, edge_z, ctx_emb)

    # compile
    x, e = run(variables, jax.random.PRNGKey(1))
    jax.block_until_ready((x, e))
    # timed
    t0 = time.perf_counter()
    x, e = run(variables, jax.random.PRNGKey(2))
    jax.block_until_ready((x, e))
    dt = time.perf_counter() - t0

    per_step = dt / TIMED_STEPS
    mols_per_sec = bs / (per_step * PROTOCOL_STEPS)
    print(
        json.dumps(
            {
                "metric": "sampled_mols_per_sec_1000step",
                "value": round(mols_per_sec, 4),
                "unit": "mols/sec/chip",
                "vs_baseline": round(mols_per_sec / REF_A100_EST_MOLS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
