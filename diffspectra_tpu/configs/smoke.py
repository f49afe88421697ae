"""Tiny CPU smoke config (BASELINE.json config 1): QM9S IR-only, small DMT,
batch 8, 50 diffusion steps — used by tests and the end-to-end smoke run."""

try:
    from . import diffspectra_qm9s
except ImportError:  # loaded standalone by ml_collections config_flags
    from diffspectra_tpu.configs import diffspectra_qm9s


def get_config():
    config = diffspectra_qm9s.get_config()
    config.data.spectra_version = "ir"
    config.data.max_node = 16
    config.data.synthetic = True
    config.data.synthetic_size = 256

    config.model.nf = 64
    config.model.n_layers = 4
    config.model.n_heads = 8
    config.model.dropout = 0.0

    config.training.base_batch_size = 8
    config.training.batch_size = 8
    config.training.eval_batch_size = 8
    config.training.eval_samples = 8
    config.training.n_iters = 20
    config.training.log_freq = 5
    config.training.snapshot_freq = 20
    config.training.snapshot_freq_for_preemption = 10
    config.training.matmul_precision = "float32"
    # '' means "inherit the CURRENT process default" (resolve_runtime_config
    # leaves jax_default_prng_impl untouched), NOT "force threefry": the
    # setting is a sticky process-global, so a config resolved earlier in
    # the same process (e.g. diffspectra_qm9s's 'rbg') carries over. Tests
    # that depend on a specific impl must set it explicitly or reset the
    # flag in a fixture (advisor r4).
    config.training.prng_impl = ""

    config.optim.warmup = 10

    config.pretrain.n_iters = 10
    config.pretrain.batch_size = 8
    config.pretrain.warmup = 2
    config.pretrain.log_freq = 5
    config.pretrain.snapshot_freq = 10
    config.pretrain.dropout = 0.0

    config.sampling.steps = 50

    config.eval.num_samples = 8
    config.eval.bucket_sizes = ()  # max_node=16; flagship buckets don't apply
    config.eval.batch_size = 8
    config.eval.begin_ckpt = 1
    config.eval.end_ckpt = 1
    return config
