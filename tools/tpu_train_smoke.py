"""TPU training validation: run the real run_lib training loop on synthetic
QM9S-schema data with the full-size DMT for a few hundred steps, measuring
train graphs/sec/chip. Writes progress to tools/train_smoke.log via the
standard logging path.
"""

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
    cfg.data.synthetic_size = 4096
    bs = int(os.environ.get("TRAIN_BATCH", 128))
    steps = int(os.environ.get("TRAIN_STEPS", 200))
    cfg.training.base_batch_size = bs
    cfg.training.batch_size = bs
    cfg.training.eval_batch_size = 32
    cfg.training.eval_samples = 32
    cfg.training.n_iters = steps
    cfg.training.log_freq = 20
    cfg.training.snapshot_freq = steps
    cfg.training.snapshot_freq_for_preemption = steps * 2
    cfg.optim.warmup = 50
    cfg.sampling.steps = 50

    # comma-separated dotted config overrides for perf probes, e.g.
    # TRAIN_OVERRIDES="model.reuse_cond_emb=True,model.scan_unroll=2"
    from _overrides import apply_env_overrides

    apply_env_overrides(cfg)

    workdir = os.environ.get("TRAIN_WORKDIR", "/root/repo/exp/tpu_train_smoke")
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_smoke.log"),
                mode="w",
            ),
        ],
        force=True,
    )
    run_lib.train(cfg, None, workdir)


if __name__ == "__main__":
    main()
