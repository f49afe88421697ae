"""Export the quality run's latest checkpoint as a git-committable warm
state (diffspectra_tpu/warm_state.py).

Runs on the CPU backend so it never touches the TPU mid-training; the
Orbax checkpoint was saved from host arrays, so restoring on CPU is exact.

Env:
  TRAIN_WORKDIR      workdir holding checkpoints (default exp/quality_run)
  QUALITY_DATA_SIZE  synthetic dataset size the run used (default 32768)
  WARM_OUT           output npz (default artifacts/warm_qm9s_ir.npz)
"""

import json
import logging
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from diffspectra_tpu import checkpoint as ckpt_lib
    from diffspectra_tpu import run_lib, warm_state
    from diffspectra_tpu.configs import diffspectra_qm9s
    from diffspectra_tpu.data.pipeline import get_batch_iterator, get_dataset

    logging.basicConfig(level=logging.INFO, force=True)

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.data.synthetic = True
    cfg.data.synthetic_size = int(os.environ.get("QUALITY_DATA_SIZE", 32768))
    from _overrides import apply_env_overrides

    apply_env_overrides(cfg)  # match the campaign's data config (cache etc.)
    cfg = run_lib.resolve_runtime_config(cfg, 1)

    workdir = os.environ.get("TRAIN_WORKDIR", "/root/repo/exp/quality_run")
    out = os.environ.get("WARM_OUT", "/root/repo/artifacts/warm_qm9s_ir.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)

    _, train_ds, _, _, _ = get_dataset(cfg)
    batch = next(
        get_batch_iterator(train_ds, 8, cfg.data.spectra_version, shuffle=False)
    )
    _, _, state = run_lib._init_model_and_state(cfg, batch, jax.random.PRNGKey(0))
    state = ckpt_lib.restore_for_resume(workdir, state)
    step = int(state.step)
    if step == 0:
        print("no checkpoint found in", workdir, "- nothing to export")
        return 1
    meta = {
        "spectra_version": cfg.data.spectra_version,
        "synthetic_size": cfg.data.synthetic_size,
        "step": step,
        "workdir": workdir,
    }
    warm_state.export_warm_state(state, out, meta=meta)
    size_mb = os.path.getsize(out) / 2**20
    print(f"exported step {step} to {out} ({size_mb:.1f} MB)")
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    sys.exit(main())
