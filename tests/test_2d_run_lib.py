"""only_2D pipeline end-to-end through run_lib: CDGS train + snapshot 2D
metrics + eval with the 2D sampler."""

import os

from diffspectra_tpu import run_lib
from diffspectra_tpu.configs import smoke_2d


def test_2d_train_and_eval(tmp_path):
    cfg = smoke_2d.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 10
    cfg.data.synthetic_size = 64
    cfg.training.base_batch_size = 4
    cfg.training.batch_size = 4
    cfg.training.eval_batch_size = 4
    cfg.training.eval_samples = 4
    cfg.training.n_iters = 4
    cfg.training.snapshot_freq = 4
    cfg.training.snapshot_freq_for_preemption = 8
    cfg.training.log_freq = 2
    cfg.training.num_devices = 1
    cfg.sampling.steps = 4
    cfg.eval.num_samples = 4
    cfg.eval.batch_size = 4
    cfg.eval.begin_ckpt = 1
    cfg.eval.end_ckpt = 1
    cfg.eval.sub_geometry = False  # 2D molecules carry no conformers

    workdir = str(tmp_path / "run2d")
    run_lib.train(cfg, None, workdir)
    assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))

    run_lib.evaluate(cfg, None, workdir, "eval")
    assert os.path.isdir(os.path.join(workdir, "eval"))
