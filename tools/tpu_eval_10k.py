"""Full reference eval protocol on TPU: 10k molecules, 1000-step ancestral
sampling, complete metric suite — run against a checkpoint produced by
tools/tpu_train_smoke.py. Logs to tools/eval_10k.log."""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    cfg.eval.begin_ckpt = int(os.environ.get("EVAL_CKPT", 1))
    cfg.eval.end_ckpt = int(os.environ.get("EVAL_CKPT", 1))
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

    workdir = os.environ.get("TRAIN_WORKDIR", "/root/repo/exp/tpu_train_smoke")
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "eval_10k.log"),
                mode="w",
            ),
        ],
        force=True,
    )
    import time

    t0 = time.time()
    run_lib.evaluate(cfg, None, workdir, "eval")
    logging.info("TOTAL EVAL WALL TIME: %.1fs", time.time() - t0)


if __name__ == "__main__":
    main()
