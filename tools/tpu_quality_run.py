"""Extended quality run on TPU: train the full-size flagship DMT for
QUALITY_STEPS (default 100k) steps on a larger synthetic QM9S-schema set
(32k molecules vs the 4k used by the 10k-step demonstration), writing
numbered checkpoints for the 10k-molecule eval protocol
(tools/tpu_eval_10k.py with matching TRAIN_WORKDIR/synthetic_size).

Snapshot sampling is disabled during training (the eval protocol measures
quality afterwards); preemption checkpoints land every 5k steps so the run
is resumable. Logs to tools/quality_run.log.
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
    cfg.data.synthetic_size = int(os.environ.get("QUALITY_DATA_SIZE", 32768))
    bs = int(os.environ.get("QUALITY_BATCH", 128))
    steps = int(os.environ.get("QUALITY_STEPS", 100000))
    cfg.training.base_batch_size = bs
    cfg.training.batch_size = bs
    cfg.training.eval_batch_size = 32
    cfg.training.eval_samples = 32
    cfg.training.n_iters = steps
    cfg.training.log_freq = 500
    cfg.training.snapshot_freq = int(os.environ.get("QUALITY_SNAPSHOT", 25000))
    cfg.training.snapshot_freq_for_preemption = 5000
    cfg.training.snapshot_sampling = False
    cfg.optim.warmup = min(5000, steps // 10)
    # cross-machine warm start (warm_state.py): used only when the workdir
    # has no checkpoint of its own
    cfg.training.warm_start = os.environ.get("QUALITY_WARM_START", "")
    if os.environ.get("QUALITY_WARM_PARTIAL", "") == "1":
        # cross-spectra warm start (e.g. allspectra model from the IR-only
        # campaign state): restore intersecting leaves, fresh encoder.
        # The fresh SpecFormer flatten-head kernel is ZEROED so the context
        # embedding starts at the trained distribution's centre — a random
        # boundary kernel feeds the trained adaLN trunk out-of-distribution
        # context and the forward explodes (r4 allspectra NaN post-mortem,
        # tools/diag_as_fwd.py).
        with cfg.unlocked():
            cfg.training.warm_start_partial = True
            cfg.training.warm_start_zero_fresh = os.environ.get(
                "QUALITY_WARM_ZERO_FRESH", "cond_encoder/head_linear/kernel"
            )

    from _overrides import apply_env_overrides

    apply_env_overrides(cfg)

    workdir = os.environ.get("TRAIN_WORKDIR", "/root/repo/exp/quality_run")
    # per-campaign step log (QUALITY_LOG env, set by the resume launcher);
    # default matches the historical path so a watchdog that tails it keeps
    # seeing step lines across restarts
    log_path = os.environ.get(
        "QUALITY_LOG",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "quality_run.log"
        ),
    )
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler(log_path, mode="a"),
        ],
        force=True,
    )
    run_lib.train(cfg, None, workdir)


if __name__ == "__main__":
    main()
