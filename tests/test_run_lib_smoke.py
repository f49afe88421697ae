"""End-to-end smoke: tiny synthetic train -> checkpoint -> sample -> metrics
(BASELINE.json config 1 shape). This is the minimum end-to-end slice from
SURVEY.md §7."""

import os

import jax
import numpy as np
import pytest

from diffspectra_tpu import run_lib
from diffspectra_tpu.configs import smoke


def test_end_to_end_train_and_eval(tmp_path):
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 12
    cfg.data.synthetic_size = 64
    cfg.training.base_batch_size = 4
    cfg.training.batch_size = 4
    cfg.training.eval_batch_size = 4
    cfg.training.eval_samples = 4
    cfg.training.n_iters = 6
    cfg.training.snapshot_freq = 6
    cfg.training.snapshot_freq_for_preemption = 3
    cfg.training.log_freq = 2
    cfg.training.num_devices = 1
    cfg.sampling.steps = 6
    cfg.eval.num_samples = 4
    cfg.eval.batch_size = 4
    cfg.eval.begin_ckpt = 1
    cfg.eval.end_ckpt = 1
    cfg.eval.sub_geometry = True

    workdir = str(tmp_path / "run")
    run_lib.train(cfg, None, workdir)

    # checkpoints exist
    assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))
    assert os.path.exists(os.path.join(workdir, "checkpoints-meta", "checkpoint"))
    # samples visualised
    assert os.path.isdir(os.path.join(workdir, "samples", "iter_6"))

    run_lib.evaluate(cfg, None, workdir, "eval")
    eval_dir = os.path.join(workdir, "eval")
    # evaluation completed; similarity CSVs only appear when the barely
    # trained model emits valence-valid molecules (same gating as the
    # reference's compute_similarity_metrics), so only the dir is asserted
    assert os.path.isdir(eval_dir)
