"""End-to-end smoke: tiny synthetic train -> checkpoint -> sample -> metrics
(BASELINE.json config 1 shape). This is the minimum end-to-end slice from
SURVEY.md §7."""

import os

import jax
import numpy as np
import pytest

from diffspectra_tpu import run_lib
from diffspectra_tpu.configs import smoke


@pytest.mark.slow
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

    # eval with the auxiliary original-QM9 config: the metric reference
    # sets must come from its (original-split) dataset, ref run_lib.py:340-342
    cfg_qm9 = smoke.get_config()
    cfg_qm9.update(cfg)
    cfg_qm9.exp_type = "vpsde_edge_cond"
    run_lib.evaluate(cfg, cfg_qm9, workdir, "eval")
    eval_dir = os.path.join(workdir, "eval")
    # evaluation completed; similarity CSVs only appear when the barely
    # trained model emits valence-valid molecules (same gating as the
    # reference's compute_similarity_metrics), so only the dir is asserted
    assert os.path.isdir(eval_dir)


@pytest.mark.slow
def test_resume_into_bucketed_training(tmp_path):
    """A checkpoint trained with static N=29-style padding must resume
    cleanly into a bucketed-padding run (params/opt state carry no
    N-dependence) — the production quality run does exactly this when
    bucket_sizes are adopted mid-run."""
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 12
    cfg.data.synthetic_size = 64
    cfg.training.base_batch_size = 4
    cfg.training.batch_size = 4
    cfg.training.n_iters = 3
    cfg.training.snapshot_freq = 100
    cfg.training.snapshot_freq_for_preemption = 3
    cfg.training.log_freq = 2
    cfg.training.snapshot_sampling = False
    cfg.training.num_devices = 1

    workdir = str(tmp_path / "run")
    run_lib.train(cfg, None, workdir)
    assert os.path.exists(os.path.join(workdir, "checkpoints-meta", "checkpoint"))

    from diffspectra_tpu import checkpoint as ckpt_lib
    from diffspectra_tpu.models.dmt import DMT
    from diffspectra_tpu.training import optim as optim_lib
    from diffspectra_tpu.training.train_state import create_train_state

    import jax.numpy as jnp

    from diffspectra_tpu.utils import masks as M

    def restored_step():
        model = DMT.from_config(cfg)
        n = cfg.data.max_node
        node_mask, edge_mask = M.build_masks(jnp.full((2,), n), n)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, n, 9)),
            node_mask, edge_mask,
            jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (2, 3501))),
            edge_x=jnp.zeros((2, n, n, 2)), noise_level=jnp.zeros((2,)),
        )
        state = create_train_state(
            variables, optim_lib.get_optimizer(cfg), cfg.model.ema_decay
        )
        return int(ckpt_lib.restore_for_resume(workdir, state).step)

    # the loop runs loop-vars 0..n_iters inclusive and every iteration
    # advances the state counter: after run one the meta checkpoint holds
    # step 4 — assert it BEFORE the resume so a restart-from-0 in run two
    # is distinguishable from a genuine resume
    assert restored_step() == 4

    # resume the same workdir with bucketed padding on (one truncating
    # bucket, one at max N) and train three more steps
    cfg.data.bucket_sizes = (8, 12)
    cfg.training.n_iters = 6
    run_lib.train(cfg, None, workdir)

    # 4 (resumed) + loop-vars 4..6 = 7; a silent restart-from-0 would have
    # run 0..6 and also ended at 7, but the ==4 assert above pins run one
    assert restored_step() == 7


@pytest.mark.slow
def test_bucketed_sampling_harness(tmp_path):
    """Bucketed eval sampling produces per-molecule outputs in draw order,
    identical shapes and pairings as the single-bucket path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffspectra_tpu.data import get_dataset
    from diffspectra_tpu.diffusion import NoiseScheduleVP
    from diffspectra_tpu.models.dmt import DMT
    from diffspectra_tpu.sampling.harness import make_cond_sampling_fn
    from diffspectra_tpu.utils.scalers import get_data_inverse_scaler

    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 16
    cfg.data.synthetic_size = 64
    cfg.sampling.steps = 4
    cfg.eval.bucket_sizes = [12, 16]

    _, _, _, test_ds, _ = get_dataset(cfg)
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    inverse = get_data_inverse_scaler(cfg)

    key = jax.random.PRNGKey(0)
    n = cfg.data.max_node
    bs = 4
    from diffspectra_tpu.utils import masks as M

    node_mask, edge_mask = M.build_masks(jnp.full((bs,), n), n)
    variables = model.init(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, 9)), node_mask, edge_mask,
        jnp.abs(jax.random.normal(key, (bs, 3501))),
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )

    fn = make_cond_sampling_fn(
        cfg, model, sch, batch_size=bs, n_samples=8, inverse_scaler=inverse,
        ds=test_ds, fixed_seed=42,
    )
    mols, gt_pos, gt_mols = fn(variables, jax.random.PRNGKey(1))
    assert len(mols) == 8 and len(gt_mols) == 8
    for pred, gt in zip(mols, gt_mols):
        assert pred is not None
        # prediction size matches its ground truth molecule
        assert pred[1].shape[0] == gt[1].shape[0]


@pytest.mark.slow
def test_mesh_sampling_harness():
    """Mesh fan-out of the sampling sweep (SURVEY §2.12): 8 virtual chips,
    each running its batch shard; outputs pair with ground truth exactly as
    the single-device harness does."""
    import jax
    import jax.numpy as jnp

    from diffspectra_tpu.data import get_dataset
    from diffspectra_tpu.diffusion import NoiseScheduleVP
    from diffspectra_tpu.models.dmt import DMT
    from diffspectra_tpu.parallel import create_mesh
    from diffspectra_tpu.sampling.harness import make_cond_sampling_fn
    from diffspectra_tpu.utils import masks as M
    from diffspectra_tpu.utils.scalers import get_data_inverse_scaler

    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 16
    cfg.data.synthetic_size = 64
    cfg.sampling.steps = 4

    _, _, _, test_ds, _ = get_dataset(cfg)
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    inverse = get_data_inverse_scaler(cfg)

    key = jax.random.PRNGKey(0)
    n = cfg.data.max_node
    bs = 16  # 2 per chip
    node_mask, edge_mask = M.build_masks(jnp.full((bs,), n), n)
    variables = model.init(
        key, jnp.zeros((bs,)), jnp.zeros((bs, n, 9)), node_mask, edge_mask,
        jnp.abs(jax.random.normal(key, (bs, 3501))),
        edge_x=jnp.zeros((bs, n, n, 2)), noise_level=jnp.zeros((bs,)),
    )

    mesh = create_mesh()
    fn = make_cond_sampling_fn(
        cfg, model, sch, batch_size=bs, n_samples=24, inverse_scaler=inverse,
        ds=test_ds, fixed_seed=42, mesh=mesh,
    )
    mols, gt_pos, gt_mols = fn(variables, jax.random.PRNGKey(1))
    assert len(mols) == 24 and len(gt_mols) == 24
    for pred, gt in zip(mols, gt_mols):
        assert pred is not None
        assert pred[1].shape[0] == gt[1].shape[0]

    # ground-truth draws must match the single-device harness (same fixed
    # permutation; only the noise fan-out differs)
    fn1 = make_cond_sampling_fn(
        cfg, model, sch, batch_size=bs, n_samples=24, inverse_scaler=inverse,
        ds=test_ds, fixed_seed=42,
    )
    _, gt_pos1, _ = fn1(variables, jax.random.PRNGKey(1))
    for a, b in zip(gt_pos, gt_pos1):
        np.testing.assert_allclose(a, b)


def test_eval_top_k_candidates(tmp_path, caplog):
    """eval.num_candidates>1 repeats the sweep and logs Top-K accuracy."""
    import logging as _logging

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
    cfg.training.n_iters = 2
    cfg.training.snapshot_freq = 2
    cfg.training.snapshot_freq_for_preemption = 10
    cfg.training.log_freq = 2
    cfg.training.num_devices = 1
    cfg.training.snapshot_sampling = False
    cfg.sampling.steps = 4
    cfg.eval.num_samples = 4
    cfg.eval.batch_size = 4
    cfg.eval.begin_ckpt = 1
    cfg.eval.end_ckpt = 1
    cfg.eval.sub_geometry = False
    cfg.eval.num_candidates = 2

    workdir = str(tmp_path / "run")
    run_lib.train(cfg, None, workdir)
    with caplog.at_level(_logging.INFO):
        run_lib.evaluate(cfg, None, workdir, "eval")
    assert any("Top-2 accuracy" in r.getMessage() for r in caplog.records)


def test_init_with_bucket_padded_first_batch():
    """_init_model_and_state must take its N from the sample batch, not
    config.data.max_node: under bucketed TRAIN padding the first batch off
    the iterator is padded to its bucket's n_pad (< max_node), and mixing
    max_node-shaped zeros with bucket-shaped masks crashed the production
    quality run at model init (regression, 2026-08-18)."""
    import jax.numpy as jnp

    from diffspectra_tpu.utils import masks as M

    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 12
    cfg = run_lib.resolve_runtime_config(cfg, 1)

    def fake_batch(n_pad):
        node_mask, edge_mask = M.build_masks(jnp.full((4,), n_pad), n_pad)
        return {
            "atom_mask": np.asarray(node_mask[..., 0]),
            "edge_mask": np.asarray(edge_mask),
            "context": np.abs(
                np.random.default_rng(0).normal(size=(4, 3501))
            ).astype(np.float32),
        }

    # bucket-padded batch (n_pad 8 < max_node 12) must initialise the SAME
    # parameter tree as a max_node batch (the tree is N-independent)
    _, _, state_bucket = run_lib._init_model_and_state(
        cfg, fake_batch(8), jax.random.PRNGKey(0)
    )
    _, _, state_full = run_lib._init_model_and_state(
        cfg, fake_batch(cfg.data.max_node), jax.random.PRNGKey(0)
    )
    shapes = lambda s: jax.tree_util.tree_map(lambda x: x.shape, s.params)
    assert shapes(state_bucket) == shapes(state_full)


def test_fresh_train_with_bucketed_padding(tmp_path):
    """End-to-end: a step-0 training run with data.bucket_sizes set (the
    production quality-run configuration) must train and checkpoint. The
    resume-into-bucketed test above starts bucketed training from a warm
    state; this one covers the cold-start path that crashed on hardware
    (init shapes vs bucket-padded first batch)."""
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 12
    cfg.data.synthetic_size = 64
    cfg.data.bucket_sizes = (8, 12)
    cfg.training.base_batch_size = 4
    cfg.training.batch_size = 4
    cfg.training.n_iters = 3
    cfg.training.snapshot_freq = 3
    cfg.training.snapshot_freq_for_preemption = 3
    cfg.training.log_freq = 2
    cfg.training.snapshot_sampling = False
    cfg.training.num_devices = 1

    workdir = str(tmp_path / "run")
    run_lib.train(cfg, None, workdir)
    assert os.path.exists(os.path.join(workdir, "checkpoints", "checkpoint_1"))


def test_resolve_runtime_config_prng_impl():
    """training.prng_impl: '' leaves jax's default untouched; an explicit
    impl is applied process-globally (the round-4 HBM lever — RESULTS.md
    round-4 decomposition; production default 'rbg' lives in the qm9s
    config, while smoke keeps '' so the suite stays on threefry)."""
    import jax

    before = jax.config.jax_default_prng_impl
    try:
        cfg = smoke.get_config()
        assert cfg.training.prng_impl == ""
        run_lib.resolve_runtime_config(cfg, 1)
        assert jax.config.jax_default_prng_impl == before

        cfg2 = smoke.get_config()
        cfg2.training.prng_impl = "rbg"
        run_lib.resolve_runtime_config(cfg2, 1)
        assert jax.config.jax_default_prng_impl == "rbg"
        # rbg keys are uint32[4]; draws are finite and deterministic per key
        k = jax.random.PRNGKey(7)
        assert k.shape == (4,)
        a = float(jax.random.uniform(k))
        b = float(jax.random.uniform(k))
        assert a == b and 0.0 <= a < 1.0

        # the production config requests rbg by default
        from diffspectra_tpu.configs import diffspectra_qm9s

        assert diffspectra_qm9s.get_config().training.prng_impl == "rbg"
    finally:
        jax.config.update("jax_default_prng_impl", before)
        assert jax.random.PRNGKey(0).shape == (2,)
