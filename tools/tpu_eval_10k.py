"""Full reference eval protocol on TPU: 10k molecules, 1000-step ancestral
sampling, complete metric suite — run against a checkpoint produced by
tools/tpu_train_smoke.py. Logs to tools/eval_10k.log."""

import logging
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_ckpt(workdir: str, want: int) -> int:
    """Best evaluable checkpoint number for ``want``.

    A campaign cut short by a transport wedge can die before its FIRST
    numbered snapshot (cadence 25k steps) even though the 5k-cadence meta
    checkpoint is fresh. Prefer the requested numbered checkpoint; else the
    highest numbered one on disk; else materialize the meta checkpoint
    under the requested number (same orbax StandardCheckpointer layout for
    both flavors, diffspectra_tpu/checkpoint.py) so the staged eval
    pipeline still evaluates the newest weights instead of crashing.
    """
    from diffspectra_tpu import checkpoint as ckpt_lib

    if os.path.exists(ckpt_lib.numbered_checkpoint_dir(workdir, want)):
        return want
    latest = ckpt_lib.latest_numbered_checkpoint(workdir)
    if latest is not None:
        logging.warning(
            "checkpoint_%d missing; evaluating latest on disk checkpoint_%d",
            want, latest,
        )
        return latest
    meta = ckpt_lib.meta_checkpoint_dir(workdir)
    if os.path.exists(meta):
        dst = ckpt_lib.numbered_checkpoint_dir(workdir, want)
        logging.warning(
            "no numbered checkpoint on disk; copying meta checkpoint %s -> %s "
            "(restored step is logged at load)", meta, dst,
        )
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(meta, dst)
    return want


def main():
    # logging first: resolve_ckpt's checkpoint-substitution warnings must
    # land in eval_10k.log, or the committed artifact attributes results
    # to the wrong checkpoint (r2 review)
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "eval_10k.log"
                ),
                mode="w",
            ),
        ],
        force=True,
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffspectra_tpu import run_lib
    from diffspectra_tpu.configs import diffspectra_qm9s

    cfg = diffspectra_qm9s.get_config()
    cfg.data.spectra_version = "ir"
    cfg.data.synthetic = True
    # must match the trained checkpoint's dataset (tools/tpu_train_smoke.py
    # uses 4096; tools/tpu_quality_run.py uses 32768)
    cfg.data.synthetic_size = int(os.environ.get("QUALITY_DATA_SIZE", 4096))
    cfg.training.base_batch_size = 128
    cfg.training.batch_size = 128
    cfg.training.eval_batch_size = 128
    cfg.training.eval_samples = 128
    cfg.eval.batch_size = int(os.environ.get("EVAL_BATCH", 128))
    cfg.eval.num_samples = int(os.environ.get("EVAL_SAMPLES", 10000))
    workdir = os.environ.get("TRAIN_WORKDIR", "/root/repo/exp/tpu_train_smoke")
    ck = resolve_ckpt(workdir, int(os.environ.get("EVAL_CKPT", 1)))
    cfg.eval.begin_ckpt = ck
    cfg.eval.end_ckpt = ck
    cfg.sampling.steps = int(os.environ.get("EVAL_STEPS", 1000))
    cfg.sampling.method = os.environ.get("EVAL_METHOD", "ancestral")
    cfg.eval.num_candidates = int(os.environ.get("EVAL_CANDIDATES", 1))
    cfg.eval.sub_geometry = os.environ.get("EVAL_SUB_GEOMETRY", "1") == "1"
    cfg.eval.save_mols = os.environ.get("EVAL_SAVE_MOLS", "true")

    # the eval must see the same data-config overrides the training run used
    # (synthetic_fidelity/cache, bucket_sizes, ...) or it would evaluate
    # against a different dataset than the checkpoint was trained on
    from _overrides import apply_env_overrides

    apply_env_overrides(cfg)

    import time

    t0 = time.time()
    run_lib.evaluate(cfg, None, workdir, "eval")
    logging.info("TOTAL EVAL WALL TIME: %.1fs", time.time() - t0)


if __name__ == "__main__":
    main()
