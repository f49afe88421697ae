"""Training-step tests: loss decreases, EMA warmup, adaptive clipping."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.diffusion import NoiseScheduleVP
from diffspectra_tpu.models import ema as ema_lib
from diffspectra_tpu.models.dmt import DMT
from diffspectra_tpu.training import optim as optim_lib
from diffspectra_tpu.training.step import get_step_fn
from diffspectra_tpu.training.train_state import create_train_state
from diffspectra_tpu.utils import masks as M
from diffspectra_tpu.utils.scalers import get_data_scaler


def small_config():
    cfg = smoke.get_config()
    cfg.model.nf = 32
    cfg.model.n_layers = 2
    cfg.model.n_heads = 4
    cfg.data.max_node = 6
    cfg.optim.warmup = 2
    return cfg


def make_batch(key, cfg, bs=4):
    n = cfg.data.max_node
    ks = jax.random.split(key, 5)
    n_nodes = jax.random.randint(ks[0], (bs,), 3, n + 1)
    node_mask, edge_mask = M.build_masks(n_nodes, n)
    pos = jax.random.normal(ks[1], (bs, n, 3)) * node_mask
    atom_idx = jax.random.randint(ks[2], (bs, n), 0, cfg.data.atom_types)
    atom_one_hot = jax.nn.one_hot(atom_idx, cfg.data.atom_types) * node_mask
    edge = M.sample_symmetric_edge_feature_noise(ks[3], bs, n, 2, edge_mask)
    edge = (jnp.abs(edge) > 0.8).astype(jnp.float32)
    spectra = jnp.abs(jax.random.normal(ks[4], (bs, 3501)))
    return dict(
        positions=pos,
        atom_mask=node_mask[..., 0],
        edge_mask=edge_mask,
        atom_one_hot=atom_one_hot,
        edge_one_hot=edge,
        formal_charges=jnp.zeros((bs, n, 1)),
        context=spectra,
    )


def init_everything(cfg, batch):
    model = DMT.from_config(cfg)
    sch = NoiseScheduleVP(cfg.sde.schedule)
    scaler = get_data_scaler(cfg)
    tx = optim_lib.get_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    n = cfg.data.max_node
    bs = batch["positions"].shape[0]
    variables = model.init(
        key,
        jnp.zeros((bs,)),
        jnp.zeros((bs, n, 9)),
        batch["atom_mask"][..., None],
        batch["edge_mask"],
        batch["context"],
        edge_x=jnp.zeros((bs, n, n, 2)),
        noise_level=jnp.zeros((bs,)),
    )
    state = create_train_state(variables, tx, cfg.model.ema_decay)
    step_fn = jax.jit(get_step_fn(sch, model, tx, scaler, cfg, train=True))
    return model, state, step_fn


def test_train_step_runs_and_loss_decreases():
    cfg = small_config()
    batch = make_batch(jax.random.PRNGKey(1), cfg)
    _, state, step_fn = init_everything(cfg, batch)

    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(8):
        rng, k = jax.random.split(rng)
        state, loss = step_fn(state, batch, k)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 8
    # overfitting one small batch: average of later losses below first loss
    assert np.mean(losses[-3:]) < losses[0] * 1.5


def test_ema_warmup_decay():
    params = {"w": jnp.asarray([1.0, 2.0])}
    st = ema_lib.init(params, 0.999)
    new_params = {"w": jnp.asarray([2.0, 4.0])}
    st = ema_lib.update(st, new_params)
    # first update: decay = min(0.999, 2/11)
    d = 2.0 / 11.0
    want = 1.0 * d + 2.0 * (1 - d)
    np.testing.assert_allclose(float(st.shadow_params["w"][0]), want, rtol=1e-6)


def test_adaptive_clip_behaviour():
    clip = optim_lib.adaptive_gradient_clip(10.0)
    params = {"w": jnp.zeros(3)}
    st = clip.init(params)
    # queue starts [3000]; allowed = min(1.5*3000, 10) = 10
    big = {"w": jnp.full(3, 100.0)}
    upd, st = clip.update(big, st)
    gn = float(optax.global_norm(upd))
    np.testing.assert_allclose(gn, 10.0, rtol=1e-5)
    # queue now [10, 3000]; mean=1505 -> still clipped at 10
    upd, st = clip.update(big, st)
    np.testing.assert_allclose(float(optax.global_norm(upd)), 10.0, rtol=1e-5)
    assert int(st.count) == 3


def test_plain_clip_when_max_grad_le_1():
    clip = optim_lib.adaptive_gradient_clip(0.5)
    st = clip.init({"w": jnp.zeros(3)})
    upd, _ = clip.update({"w": jnp.full(3, 5.0)}, st)
    np.testing.assert_allclose(float(optax.global_norm(upd)), 0.5, rtol=1e-5)


def test_warmup_schedule():
    sched = optim_lib.make_lr_schedule(2e-4, 100)
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(50)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 2e-4, rtol=1e-6)


@pytest.mark.parametrize("policy", ["dots", "none"])
def test_train_step_remat_policy_variants(policy):
    """remat_policy='dots' (save MXU outputs in the block-scan backward) and
    'none' (no remat — scan stacks all residuals) must produce the same
    parameter tree and a finite loss — policy only changes what the backward
    rematerialises/saves, not the math."""
    cfg = small_config()
    cfg.model.self_cond = False
    batch = make_batch(jax.random.PRNGKey(1), cfg)

    cfg_full = small_config(); cfg_full.model.self_cond = False
    _, state_f, step_f = init_everything(cfg_full, batch)
    cfg.model.remat_policy = policy
    _, state_d, step_d = init_everything(cfg, batch)

    k = jax.random.PRNGKey(3)
    state_f, loss_f = step_f(state_f, batch, k)
    state_d, loss_d = step_d(state_d, batch, k)
    # identical init (same PRNG), identical math -> identical loss and
    # near-identical updated params (remat changes recompute order only)
    np.testing.assert_allclose(float(loss_f), float(loss_d), rtol=1e-5)
    leaves_f = jax.tree_util.tree_leaves(state_f.params)
    leaves_d = jax.tree_util.tree_leaves(state_d.params)
    for a, b in zip(leaves_f, leaves_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_reuse_cond_emb_matches_in_graph_encoding():
    """The hoisted train-mode spectra encode (models.dmt.encode_context_train)
    must be bit-compatible with the in-graph SpecFormer path: same model
    output AND the same BatchNorm statistics update (dropout is 0 inside the
    DMT's SpecFormer, so the only train-mode mutation is batch_stats)."""
    from diffspectra_tpu.models.dmt import encode_context_train

    cfg = small_config()
    batch = make_batch(jax.random.PRNGKey(1), cfg)
    model, state, _ = init_everything(cfg, batch)

    n = cfg.data.max_node
    bs = batch["positions"].shape[0]
    t = jnp.full((bs,), 0.5)
    xh = jax.random.normal(jax.random.PRNGKey(5), (bs, n, 9))
    edge_x = M.sample_symmetric_edge_feature_noise(
        jax.random.PRNGKey(6), bs, n, 2, batch["edge_mask"]
    )
    nl = jnp.zeros((bs,))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    (out_a, edge_a), mut_a = model.apply(
        variables, t, xh, batch["atom_mask"][..., None], batch["edge_mask"],
        batch["context"], edge_x=edge_x, noise_level=nl,
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)},
        mutable=["batch_stats"],
    )
    ctx_emb, enc_stats = encode_context_train(
        model, state.params, state.batch_stats, batch["context"],
        jax.random.PRNGKey(8),
    )
    (out_b, edge_b), mut_b = model.apply(
        variables, t, xh, batch["atom_mask"][..., None], batch["edge_mask"],
        None, edge_x=edge_x, noise_level=nl, context_emb=ctx_emb,
        deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)},
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(edge_a), np.asarray(edge_b), atol=1e-5)
    a_stats = jax.tree_util.tree_leaves(mut_a["batch_stats"]["cond_encoder"])
    b_stats = jax.tree_util.tree_leaves(enc_stats["cond_encoder"])
    assert len(a_stats) == len(b_stats) and len(a_stats) > 0
    for pa, pb in zip(a_stats, b_stats):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_reuse_cond_emb_train_step_grads_encoder():
    """With model.reuse_cond_emb the spectra encoder runs OUTSIDE the model
    graph; gradients must still reach its parameters and its BatchNorm
    statistics must still advance, else the encoder silently stops training."""
    cfg = small_config()
    cfg.model.self_cond = True
    cfg.model.reuse_cond_emb = True
    batch = make_batch(jax.random.PRNGKey(1), cfg)
    _, state, step_fn = init_everything(cfg, batch)
    before = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(state.params["cond_encoder"])]
    stats_before = [np.asarray(x) for x in
                    jax.tree_util.tree_leaves(state.batch_stats["cond_encoder"])]
    # 3 steps: the warmup LR schedule is exactly 0 at step 0, so a single
    # step cannot move parameters even with correct gradients
    rng = jax.random.PRNGKey(3)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, loss = step_fn(state, batch, k)
    assert np.isfinite(float(loss))
    after = jax.tree_util.tree_leaves(state.params["cond_encoder"])
    assert max(
        float(np.max(np.abs(np.asarray(a) - b)))
        for a, b in zip(after, before)
    ) > 0.0
    stats_after = jax.tree_util.tree_leaves(state.batch_stats["cond_encoder"])
    assert max(
        float(np.max(np.abs(np.asarray(a) - b)))
        for a, b in zip(stats_after, stats_before)
    ) > 0.0


def test_train_step_specformer_bf16_path():
    """model.specformer_bf16 runs the spectra encoder in the compute dtype;
    the step must produce a finite loss (the TPU remote-compiler gate is an
    environment issue, not a graph issue — this pins the graph)."""
    cfg = small_config()
    cfg.model.self_cond = False
    cfg.model.specformer_bf16 = True
    cfg.training.matmul_precision = "bfloat16"
    batch = make_batch(jax.random.PRNGKey(1), cfg)
    _, state, step_fn = init_everything(cfg, batch)
    state, loss = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
