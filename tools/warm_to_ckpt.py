"""Materialize an evaluable Orbax checkpoint from a committed warm-state
npz (tools/export_warm_state.py output).

The ``exp/`` scratch disk does not survive across build machines; the
compact warm states in ``artifacts/`` do. The eval pipeline
(tools/tpu_eval_10k.py) evaluates WORKDIR checkpoints, so a campaign whose
workdir is gone (e.g. the fidelity-3 915k state from a previous session)
needs its warm npz rehydrated into a numbered checkpoint first. Eval uses
only the EMA parameters (run_lib._ema_variables); the fresh optimizer
state in the skeleton is irrelevant.

Env:
  WARM       input npz (required)
  WORKDIR    output training workdir (required; created)
  CKPT       numbered checkpoint to write (default step // 25000)
  TRAIN_OVERRIDES / QUALITY_DATA_SIZE — config identity, as elsewhere
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    logging.basicConfig(level=logging.INFO, force=True)
    import jax

    from diffspectra_tpu import checkpoint as ckpt_lib
    from diffspectra_tpu import run_lib, warm_state
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.models.specformer import (
        SPECTRUM_LENGTHS,
        used_spectra_indices,
    )
    from diffspectra_tpu.utils import masks as M

    import numpy as np
    import jax.numpy as jnp

    warm = os.environ["WARM"]
    workdir = os.environ["WORKDIR"]

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.training.batch_size = 2
    cfg.training.base_batch_size = 2
    from _overrides import apply_env_overrides

    apply_env_overrides(cfg)
    cfg = run_lib.resolve_runtime_config(cfg, 1)

    bs, n = 2, int(cfg.data.max_node)
    node_mask, edge_mask = M.build_masks(jnp.full((bs,), n), n)
    idx = used_spectra_indices(cfg.data.spectra_version)
    specs = tuple(
        np.zeros((bs, SPECTRUM_LENGTHS[i]), np.float32) for i in idx
    )
    batch = {
        "atom_mask": np.asarray(node_mask)[..., 0],
        "edge_mask": np.asarray(edge_mask),
        "context": specs if len(specs) > 1 else specs[0],
    }
    _, _, state = run_lib._init_model_and_state(
        cfg, batch, jax.random.PRNGKey(0)
    )
    state = jax.device_get(state)
    state = warm_state.load_warm_state(state, warm)
    step = int(state.step)
    ck = int(os.environ.get("CKPT", step // 25000))
    dst = ckpt_lib.numbered_checkpoint_dir(workdir, ck)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    ckpt_lib.save_checkpoint(dst, state)
    logging.info("wrote %s from %s (step %d)", dst, warm, step)
    print(f"WARM_TO_CKPT OK ckpt={ck} step={step}")


if __name__ == "__main__":
    main()
