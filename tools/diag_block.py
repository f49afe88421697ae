"""Hardware diagnostic for the whole-block fused kernel (ops/pallas_block.py).

Builds the FLAGSHIP-dim DMT (nf=256, 8 blocks, 16 heads, N=29), runs one
forward through the XLA path and one through ``pallas_ops=('block',)`` on
the real chip, checks parity, and chain-times both (K calls inside one
jitted lax.scan — the relay's block_until_ready returns early, so only
chained dispatch gives honest per-call numbers; RESULTS.md methodology).

Env: DIAG_BATCH (default 32), DIAG_CALLS (default 20).
Appends to tools/diag_block.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/root/repo/tools/diag_block.log"


def log(m):
    print(m, flush=True)
    with open(LOG, "a") as f:
        f.write(m + "\n")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.models.dmt import DMT
    from diffspectra_tpu.utils import masks as M

    B = int(os.environ.get("DIAG_BATCH", 32))
    K = int(os.environ.get("DIAG_CALLS", 20))

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.model.dropout = 0.0
    n = int(cfg.data.max_node)

    key = jax.random.PRNGKey(0)
    n_nodes = jax.random.randint(key, (B,), 12, n + 1)
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    xh_dim = 3 + cfg.data.atom_types + int(cfg.model.include_fc_charge)
    xh = jax.random.normal(key, (B, n, xh_dim)) * node_mask
    edge_x = M.sample_symmetric_edge_feature_noise(
        key, B, n, cfg.model.edge_ch, edge_mask
    )
    ctx = jnp.abs(jax.random.normal(key, (B, 3501)))
    t = jnp.full((B,), 0.5)
    nl = jnp.full((B,), -1.0)
    args = (t, xh, node_mask, edge_mask, ctx)
    kwargs = dict(edge_x=edge_x, noise_level=nl)

    model_xla = DMT.from_config(cfg)
    variables = model_xla.init(jax.random.PRNGKey(1), *args, **kwargs)
    log(f"diag_block {time.strftime('%F %T')} B={B} N={n} bf16="
        f"{cfg.training.get('matmul_precision', '')}")

    with cfg.unlocked():
        cfg.model.use_pallas = True
        cfg.model.pallas_ops = ("block",)
    model_blk = DMT.from_config(cfg)

    def chain(model, label):
        def one(c, _):
            pos, edge = model.apply(
                variables, c[0], c[1], node_mask, edge_mask, ctx,
                edge_x=edge_x, noise_level=nl,
            )
            # thread outputs back so calls can't be folded/elided
            return (c[0], c[1] + 1e-6 * jnp.tanh(pos.sum()) * c[1]), pos.sum()

        f = jax.jit(
            lambda: jax.lax.scan(one, (t, xh), None, length=K)[1].sum()
        )
        t0 = time.time()
        first = float(f())
        log(f"{label}: compile+{K} calls {time.time() - t0:.1f}s")
        t0 = time.time()
        val = float(f())
        dt = time.time() - t0
        log(f"{label}: {K} calls {dt:.3f}s = {1000 * dt / K:.2f} ms/call "
            f"(sum {val:.3f})")
        return val

    # parity first (one call each)
    try:
        p_ref, e_ref = jax.jit(
            lambda: model_xla.apply(variables, *args, **kwargs)
        )()
        p_blk, e_blk = jax.jit(
            lambda: model_blk.apply(variables, *args, **kwargs)
        )()
        pe = float(jnp.max(jnp.abs(p_ref - p_blk)))
        ee = float(jnp.max(jnp.abs(e_ref - e_blk)))
        den_p = float(jnp.max(jnp.abs(p_ref))) + 1e-9
        den_e = float(jnp.max(jnp.abs(e_ref))) + 1e-9
        log(f"parity: pos max abs {pe:.5f} (rel {pe / den_p:.2e}), "
            f"edge max abs {ee:.5f} (rel {ee / den_e:.2e})")
    except Exception as e:
        log(f"BLOCK KERNEL FAILED: {type(e).__name__}: {str(e)[:800]}")
        return 1

    chain(model_xla, "xla")
    chain(model_blk, "block-kernel")
    log("diag_block DONE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
