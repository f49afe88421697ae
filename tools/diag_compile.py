"""Isolate compile costs: plain forward vs scan(1) vs scan(4) vs scan(50)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "diagc.log")


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.diffusion import NoiseScheduleVP
    from diffspectra_tpu.models.dmt import DMT, encode_context
    from diffspectra_tpu.sampling import AncestralSampler, make_time_steps
    from diffspectra_tpu.utils import masks as M
    from diffspectra_tpu.utils.scalers import get_self_cond_fn

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.model.dropout = 0.0
    n = cfg.data.max_node
    bs = 64
    key = jax.random.PRNGKey(0)
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    n_nodes = jnp.asarray(np.random.default_rng(0).integers(12, n + 1, size=bs))
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    ctx = jnp.abs(jax.random.normal(key, (bs, 3501)))
    t0 = time.time()
    variables = jax.jit(model.init)(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, 9)), node_mask, edge_mask, ctx,
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])
    log("init %.1fs" % (time.time() - t0))

    # plain forward compile
    xh = jax.random.normal(key, (bs, n, 9)) * node_mask
    edge_x = M.sample_symmetric_edge_feature_noise(key, bs, n, 2, edge_mask)

    @jax.jit
    def fwd(xh, edge_x):
        return model.apply(
            variables, jnp.full((bs,), 0.5), xh, node_mask, edge_mask, None,
            edge_x=edge_x, noise_level=jnp.full((bs,), -1.0),
            context_emb=jnp.zeros((bs, 1024)),
        )

    t0 = time.time()
    out = fwd(xh, edge_x)
    jax.block_until_ready(out)
    log("fwd compile %.1fs" % (time.time() - t0))

    def model_apply(t, x, nm, em, ex, nl, cx, cex, hc, ce):
        return model.apply(
            variables, t, x, nm, em, None, edge_x=ex, noise_level=nl,
            cond_x=cx, cond_edge_x=cex, has_cond=hc, context_emb=ce,
        )

    for steps in (1, 2):
        ts = make_time_steps(sch, steps)
        sampler = AncestralSampler(
            sch, ts, True, pred_edge=True, self_cond=True,
            cond_process_fn=get_self_cond_fn(cfg),
        )

        @jax.jit
        def run(rng):
            k1, k2, k3 = jax.random.split(rng, 3)
            z = M.sample_combined_position_feature_noise(k1, bs, n, 6, node_mask)
            ez = M.sample_symmetric_edge_feature_noise(k2, bs, n, 2, edge_mask)
            ce = encode_context(model, variables, ctx)
            return sampler.sampling(model_apply, k3, z, node_mask, edge_mask, ez, ce)

        t0 = time.time()
        lowered = run.lower(jax.random.PRNGKey(1))
        log("scan(%d) lower %.1fs" % (steps, time.time() - t0))
        t0 = time.time()
        compiled = lowered.compile()
        log("scan(%d) compile %.1fs" % (steps, time.time() - t0))
        t0 = time.time()
        out = compiled(jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        log("scan(%d) run %.2fs" % (steps, time.time() - t0))


if __name__ == "__main__":
    main()
