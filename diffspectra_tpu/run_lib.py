"""Train / evaluate orchestration pipelines.

Rewrite of ref run_lib.py:172-459 in TPU terms: the training loop feeds
host-collated fixed-shape batches into a jitted shard_map step over the
device mesh; snapshot sampling runs the on-device lax.scan sampler with EMA
parameters; all RDKit-dependent evaluation stays host-side.
"""

from __future__ import annotations

import logging
import math
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from . import checkpoint as ckpt_lib
from . import visualize
from .data import device_store
from .data import get_dataset, get_batch_iterator, inf_iterator
from .data.pipeline import prefetch
from .data.pipeline import augment_positions
from .diffusion import NoiseScheduleVP
from .evaluation import get_2D_edm_metric, get_edm_metric
from .evaluation.molgraph import from_decoded
from .models import ema as ema_lib
from .parallel import (
    create_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from .sampling.harness import make_cond_sampling_fn
from .training import optim as optim_lib
from .training.step import get_step_fn
from .training.train_state import create_train_state
from .utils.registry import create_model
from .utils.scalers import get_data_inverse_scaler, get_data_scaler


def set_random_seed(config):
    seed = config.seed
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    random.seed(seed)


def resolve_runtime_config(config, n_devices: int):
    """Device-count scaling, mirroring ref configs/diffspectra_qm9s.py:87-115
    (which scales batch by GPU count and divides iteration counts).

    Also applies ``training.prng_impl`` to ``jax_default_prng_impl``: the
    round-4 HBM decomposition (tools/train_hbm_decomp.py) measured the
    train-mode forward at 207 GB/s vs 760 GB/s for the deterministic
    sampling forward, with per-block pair-grid dropout threefry generation
    (~1.3e9 bits/step incl. the remat recompute) a dominant non-streaming
    cost; 'rbg' lowers to the TPU-native XLA RngBitGenerator (the T5X /
    MaxText production setting) with identical key/split semantics and
    distribution. Every entrypoint (train, eval, tools) resolves its config
    through here BEFORE creating keys, so the switch takes effect globally.
    """
    impl = config.training.get("prng_impl", "")
    if impl:
        jax.config.update("jax_default_prng_impl", impl)
    t = config.training
    with config.unlocked():
        if t.get("num_devices", 0) == 0:
            t.num_devices = n_devices
        nd = t.num_devices
        base = t.base_batch_size
        if t.batch_size == 0:
            t.batch_size = base * nd
        if t.eval_batch_size == 0:
            t.eval_batch_size = base * nd
        if t.eval_samples == 0:
            t.eval_samples = base * nd
        if config.eval.batch_size == 0:
            config.eval.batch_size = base * nd
    return config


def _init_model_and_state(config, sample_batch, rng):
    if config.model.get("use_pallas", False):
        # The fused Pallas kernels are forward-only (pallas_call has no VJP
        # here): they serve the sampling/eval path (_inference_model). The
        # TRAINING model must stay on the XLA twins or grad() fails to
        # linearize — clear the flag for this instance only.
        logging.warning(
            "model.use_pallas is inference-only; training uses XLA kernels"
        )
        with config.unlocked():
            config.model.use_pallas = False
            model = create_model(config)
            config.model.use_pallas = True
    else:
        model = create_model(config)
    tx = optim_lib.get_optimizer(config)
    # init shapes must track the sample batch, not config.data.max_node:
    # under bucketed padding the first batch is padded to its bucket's
    # n_pad (< max_node) and the masks below come straight from it. The
    # parameter tree is N-independent, so any n initialises the same state.
    n = sample_batch["atom_mask"].shape[1]
    bs = sample_batch["atom_mask"].shape[0]
    # 2D pipelines carry no positions in xh (ref losses.py:494)
    xh_dim = config.data.atom_types + int(config.model.include_fc_charge)
    if not config.only_2D:
        xh_dim += 3
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((bs,)),
        jnp.zeros((bs, n, xh_dim)),
        jnp.asarray(sample_batch["atom_mask"])[..., None],
        jnp.asarray(sample_batch["edge_mask"]),
        sample_batch["context"],
        edge_x=jnp.zeros((bs, n, n, config.model.edge_ch)),
        noise_level=jnp.zeros((bs,)),
    )
    if config.model.get("pretrained_specformer_path", ""):
        from .models.pretrained import load_pretrained_specformer

        logging.info("Load pretrained SpecFormer")
        variables = load_pretrained_specformer(
            dict(variables),
            config.model.pretrained_specformer_path,
            config.data.spectra_version,
        )
    else:
        logging.info("Train SpecFormer from scratch")
    state = create_train_state(variables, tx, config.model.ema_decay)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logging.info("model size: %.1fMB", n_params * 4 / 2**20)
    return model, tx, state


def _inference_model(config):
    """Model instance with the block scan fully unrolled for sampling/eval.

    TPU profiling: the rolled per-block while-loop spends ~15% of a sampling
    step dynamic-slicing stacked layer weights out of HBM and layout-
    converting carries each iteration; full unroll turns those into static
    slices XLA folds away. The parameter tree is identical across unroll
    settings, so training states/checkpoints plug straight in.
    """
    unroll = config.model.get("scan_unroll_eval", 0) or config.model.n_layers
    prev = config.model.get("scan_unroll", 1)
    with config.unlocked():
        config.model.scan_unroll = unroll
    model = create_model(config)
    with config.unlocked():
        config.model.scan_unroll = prev
    return model


def _ema_variables(state):
    v = {"params": ema_lib.params(state.ema)}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def _augment_config(config):
    # aug flags per model (ref build_dataset.py:62-70 intent; SURVEY defect
    # note: reference only accepts legacy names — we map DMT/DMT_WO_EQ)
    name = config.model.name
    if name in ("DMT", "DiffSpectra_DMT", "DMT_WO_EQ"):
        return True, True
    return False, False


def _sampling_mesh(mesh, batch_size):
    """(mesh_or_none, batch): mesh for the sampling fan-out plus the batch
    size to run it at. An indivisible batch is rounded DOWN to the nearest
    multiple of the device count (keeping the n-times fan-out; round 1
    silently fell back to single-device, an 8x eval slowdown).

    Multi-host: the fan-out runs on a PROCESS-LOCAL mesh — the host decode
    gathers shard_map outputs, which must all be addressable, so the global
    mesh can't apply. Every process draws the same samples with the same
    keys (seeded harness), so each computes the full sweep on its own chips
    and gets identical results — reference-equivalent duplicated eval work,
    with no cross-host gather (ref has no multi-host at all, SURVEY §2.12).
    None when only one device is addressable."""
    if jax.process_count() > 1:
        local = jax.local_devices()
        if len(local) <= 1:
            return None, batch_size
        mesh = Mesh(np.asarray(local), ("data",))
    n = mesh.devices.size
    if n <= 1:
        return None, batch_size
    if batch_size < n:
        # rounding UP would silently exceed the configured batch (memory /
        # sample-count granularity the user chose); run single-device instead
        logging.info(
            "sampling batch %d < %d devices; fan-out disabled", batch_size, n,
        )
        return None, batch_size
    if batch_size % n != 0:
        adjusted = (batch_size // n) * n
        logging.info(
            "sampling batch %d not divisible over %d devices; running the "
            "fan-out at batch %d", batch_size, n, adjusted,
        )
        return mesh, adjusted
    return mesh, batch_size


def _maybe_init_distributed():
    """Multi-host DP over DCN: same shard_map program, more processes
    (SURVEY §2.12). Activated by the standard JAX coordinator env vars."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()
        logging.info(
            "jax.distributed initialised: process %d/%d",
            jax.process_index(), jax.process_count(),
        )


def diffspectra_train(config, config_original_qm9, workdir):
    """Training pipeline (ref run_lib.py:172-293)."""
    _maybe_init_distributed()
    config = resolve_runtime_config(config, len(jax.devices()))
    sample_dir = os.path.join(workdir, "samples")
    os.makedirs(sample_dir, exist_ok=True)

    _, second_train_ds, val_ds, test_ds, dataset_info = get_dataset(config)
    logging.info(
        "datasets: train %d val %d test %d", len(second_train_ds), len(val_ds), len(test_ds)
    )

    spectra_version = config.data.spectra_version
    batch_size = config.training.batch_size

    bucket_sizes = tuple(config.data.get("bucket_sizes", ()))

    def make_train_iter(epoch):
        return get_batch_iterator(
            second_train_ds, batch_size, spectra_version, shuffle=True,
            seed=config.seed + epoch, drop_last=True, bucket_sizes=bucket_sizes,
        )

    train_iter = prefetch(inf_iterator(make_train_iter), size=2)
    first_batch = next(train_iter)

    rng = jax.random.PRNGKey(config.seed)
    rng, k_init = jax.random.split(rng)
    model, tx, state = _init_model_and_state(config, first_batch, k_init)

    noise_scheduler = NoiseScheduleVP(
        config.sde.schedule,
        continuous_beta_0=config.sde.continuous_beta_0,
        continuous_beta_1=config.sde.continuous_beta_1,
    )
    scaler = get_data_scaler(config)
    inverse_scaler = get_data_inverse_scaler(config)

    # resume from preemption checkpoint (ref run_lib.py:204-215)
    meta_dir = ckpt_lib.meta_checkpoint_dir(workdir)
    ckpt_dir = os.path.join(workdir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    state = ckpt_lib.restore_for_resume(workdir, state)
    initial_step = int(state.step)
    warm_path = config.training.get("warm_start", "")
    if initial_step == 0 and warm_path:
        # cross-machine warm start (warm_state.py): only when the workdir
        # has no checkpoint of its own — a real resume always wins
        from . import warm_state as warm_lib

        zero_fresh = tuple(
            p for p in str(
                config.training.get("warm_start_zero_fresh", "")
            ).split(",") if p
        )
        state = warm_lib.load_warm_state(
            state, warm_path,
            partial=bool(config.training.get("warm_start_partial", False)),
            zero_fresh=zero_fresh,
        )
        initial_step = int(state.step)
    if initial_step == 0:
        logging.info("%s", config)

    mesh = create_mesh(config.training.num_devices)
    n_dev = mesh.devices.size
    use_mesh = n_dev > 1
    if use_mesh:
        assert batch_size % n_dev == 0, (
            f"training.batch_size {batch_size} must divide over {n_dev} devices"
        )
        axis_step = get_step_fn(noise_scheduler, model, tx, scaler, config, True, "data")
        step_fn = make_parallel_train_step(axis_step, mesh)
        state = replicate(mesh, state)
    else:
        # donate the train state (params/opt/EMA are rewritten every step;
        # aliasing saves a full state copy of HBM traffic per step)
        step_fn = jax.jit(
            get_step_fn(noise_scheduler, model, tx, scaler, config),
            donate_argnums=(0,),
        )

    aug_rot, aug_trans = _augment_config(config)

    @jax.jit
    def augment(key, positions, atom_mask):
        return augment_positions(
            key, positions, atom_mask, aug_rot, aug_trans,
            config.data.aug_translation_scale,
        )

    # Device-resident dataset fast path: the whole split lives in HBM and
    # batch assembly happens inside the jitted step, so the per-step
    # host->device traffic is the [B] index vector instead of the ~3MB
    # collated batch (see data/device_store.py for the trade-offs). Under a
    # mesh, rows are sharded over the data axis — each chip holds 1/n_dev of
    # the split and assembles its batch from the local shard inside
    # shard_map (shard-local shuffling). Multi-host uploads per-process
    # shards (device_store.py). Bucketed padding under a mesh uses a
    # globally-agreed (n_pad, idx) schedule — every process derives the same
    # bucket sequence from the seeded iterator, one compiled shard_map
    # program per bucket (device_store.sharded_bucket_index_iterator).
    store_bytes = device_store.estimate_bytes(second_train_ds, spectra_version)
    use_device_store = (
        config.data.get("device_resident", True)
        and store_bytes // n_dev
        <= config.data.get("device_store_max_bytes", 6_000_000_000)
    )
    if use_device_store:
        store = device_store.DeviceStore(
            second_train_ds, spectra_version, mesh=mesh if use_mesh else None
        )
        store_arrays = store.arrays()
        atom_types = config.data.atom_types
        include_aromatic = config.data.include_aromatic
        aug_scale = config.data.aug_translation_scale
        spectra_keys = tuple(store.spectra_keys)

        from functools import partial

        def _assemble(arrays, idx, k_aug, n_pad=0):
            batch = device_store.build_batch(
                arrays, idx, atom_types=atom_types,
                include_aromatic=include_aromatic, spectra_keys=spectra_keys,
                n_pad=n_pad,
            )
            batch["positions"] = augment_positions(
                k_aug, batch["positions"], batch["atom_mask"],
                aug_rot, aug_trans, aug_scale,
            )
            return batch

        base_step = get_step_fn(noise_scheduler, model, tx, scaler, config)

        if use_mesh:
            store_pstep = device_store.make_sharded_store_step(
                axis_step, mesh, atom_types=atom_types,
                include_aromatic=include_aromatic, spectra_keys=spectra_keys,
                aug_rotation=aug_rot, aug_translation=aug_trans,
                aug_translation_scale=aug_scale,
            )

            def store_step(state, arrays, idx, rng, n_pad=0):
                return store_pstep(
                    state, arrays, device_store.global_index_array(mesh, idx),
                    rng, n_pad=n_pad,
                )

            if bucket_sizes:
                def make_idx_iter(epoch):
                    return device_store.sharded_bucket_index_iterator(
                        store.host_num_atom, store.shard_size, n_dev,
                        batch_size // n_dev, bucket_sizes,
                        shuffle=True, seed=config.seed + epoch,
                    )
            else:
                def make_idx_iter(epoch):
                    return (
                        (0, idx)
                        for idx in device_store.sharded_index_iterator(
                            store.shard_size, n_dev, batch_size // n_dev,
                            shuffle=True, seed=config.seed + epoch,
                        )
                    )
        else:
            @partial(
                jax.jit, static_argnames="n_pad", donate_argnums=(0,)
            )
            def store_step(state, arrays, idx, rng, n_pad=0):
                k_aug, k_step = jax.random.split(rng)
                return base_step(state, _assemble(arrays, idx, k_aug, n_pad), k_step)

            store_num_atom = second_train_ds.arrays["num_atom"][second_train_ds.indices]

            def make_idx_iter(epoch):
                return device_store.index_iterator(
                    len(second_train_ds), batch_size, shuffle=True,
                    seed=config.seed + epoch, drop_last=True,
                    bucket_sizes=bucket_sizes, num_atom=store_num_atom,
                )

        idx_iter = inf_iterator(make_idx_iter)
        logging.info(
            "device-resident dataset: %.0f MB in HBM%s",
            store_bytes / 2**20,
            f" ({n_dev}-way row-sharded)" if use_mesh else "",
        )

    if config.training.snapshot_sampling:
        snap_mesh, snap_batch = _sampling_mesh(
            mesh, config.training.eval_batch_size
        )
        snapshot_sampling_fn = make_cond_sampling_fn(
            config, _inference_model(config), noise_scheduler, snap_batch,
            config.training.eval_samples, inverse_scaler, val_ds, fixed_seed=None,
            mesh=snap_mesh,
        )
        edm_metric = get_edm_metric(dataset_info)
        edm_metric_2d = get_2D_edm_metric(dataset_info)

    num_train_steps = config.training.n_iters
    log_freq = config.training.log_freq
    t_last = time.time()
    step_last = initial_step
    profile = bool(config.training.get("profile", False))

    for step in range(initial_step, num_train_steps + 1):
        # jax.profiler trace of a few steady-state steps (SURVEY §5: the
        # reference has no profiling; this is the TPU-native observability
        # hook — view with tensorboard or xprof)
        if profile and step == initial_step + 10:
            jax.profiler.start_trace(os.path.join(workdir, "profile"))
        if profile and step == initial_step + 15:
            jax.profiler.stop_trace()
        rng, k_step = jax.random.split(rng)
        if use_device_store:
            n_pad, idx = next(idx_iter)
            # idx conversion happens inside store_step (the mesh variant
            # builds a per-process sharded array under multi-host)
            state, loss = store_step(
                state, store_arrays, idx, k_step, n_pad=n_pad
            )
        else:
            batch = next(train_iter)
            rng, k_aug = jax.random.split(rng)
            batch = {k: v for k, v in batch.items() if k != "num_atom"}
            batch["positions"] = augment(
                k_aug, jnp.asarray(batch["positions"]), jnp.asarray(batch["atom_mask"])
            )
            if use_mesh:
                batch = shard_batch(mesh, batch)
            state, loss = step_fn(state, batch, k_step)

        if step % log_freq == 0:
            loss_val = float(loss)
            dt = time.time() - t_last
            tput = (step - step_last) * config.training.batch_size / dt if dt > 0 else 0
            t_last, step_last = time.time(), step
            logging.info(
                "step: %d, training_loss: %.5e, graphs/sec: %.1f", step, loss_val, tput
            )
            # Non-finite-loss trip (r4 post-mortem: the allspectra campaign
            # logged `training_loss: nan` for 4k+ steps while checkpointing
            # the poisoned state over the good one). A diverged model cannot
            # recover by itself — abort loudly; the last checkpoint on disk
            # stays finite because the saves below are finiteness-guarded.
            if not math.isfinite(loss_val):
                logging.error(
                    "NON-FINITE training loss %r at step %d — aborting "
                    "(checkpoints on disk keep the last finite state)",
                    loss_val, step,
                )
                raise FloatingPointError(
                    f"non-finite training loss at step {step}"
                )

        if step != 0 and step % config.training.snapshot_freq_for_preemption == 0:
            ckpt_lib.save_checkpoint_if_finite(meta_dir, jax.device_get(state))

        if step != 0 and (
            step % config.training.snapshot_freq == 0 or step == num_train_steps
        ):
            save_step = step // config.training.snapshot_freq
            ckpt_lib.save_checkpoint_if_finite(
                ckpt_lib.numbered_checkpoint_dir(workdir, save_step),
                jax.device_get(state),
            )

            if config.training.snapshot_sampling:
                rng, k_samp = jax.random.split(rng)
                host_state = jax.device_get(state)
                processed_mols, gt_pos, gt_mols = snapshot_sampling_fn(
                    _ema_variables(host_state), k_samp
                )
                if not config.only_2D:
                    stability_res, rdkit_res, sample_mols = edm_metric(processed_mols)
                    logging.info(
                        "step: %d, n_mol: %d, 3D atom stability: %.4f, mol stability: "
                        "%.4f, validity: %.4f, complete: %.4f, unique & valid: %.4f",
                        step, len(sample_mols), stability_res["atom_stable"],
                        stability_res["mol_stable"], rdkit_res["Validity"],
                        rdkit_res["Complete"], rdkit_res["Unique"],
                    )
                else:
                    sample_mols = []
                stability_res, rdkit_res, complete_mols = edm_metric_2d(processed_mols)
                logging.info(
                    "step: %d, n_mol: %d, 2D atom stability: %.4f, mol stability: "
                    "%.4f, validity: %.4f, complete: %.4f, unique & valid: %.4f",
                    step, len(sample_mols), stability_res["atom_stable"],
                    stability_res["mol_stable"], rdkit_res["Validity"],
                    rdkit_res["Complete"], rdkit_res["Unique"],
                )
                this_sample_dir = os.path.join(sample_dir, f"iter_{step}")
                visualize.visualize_mols(
                    sample_mols if sample_mols else complete_mols,
                    this_sample_dir, config,
                )
                gt_dir = os.path.join(sample_dir, f"iter_{step}_gt")
                atom_decoder = dataset_info["atom_decoder"]
                gt_graphs = [from_decoded(m, atom_decoder) for m in gt_mols]
                visualize.visualize_mols(gt_graphs, gt_dir, config)

    return state


def diffspectra_evaluate(config, config_original_qm9, workdir, eval_folder="eval"):
    """Evaluation pipeline (ref run_lib.py:297-441)."""
    config = resolve_runtime_config(config, len(jax.devices()))
    eval_dir = os.path.join(workdir, eval_folder)
    os.makedirs(eval_dir, exist_ok=True)

    _, second_train_ds, val_ds, test_ds, dataset_info = get_dataset(config)

    # one batch to initialise shapes
    init_iter = get_batch_iterator(
        test_ds, min(config.eval.batch_size, len(test_ds)),
        config.data.spectra_version, shuffle=False, drop_last=False,
    )
    first_batch = next(init_iter)
    rng = jax.random.PRNGKey(config.seed)
    rng, k_init = jax.random.split(rng)
    model, tx, state = _init_model_and_state(config, first_batch, k_init)

    noise_scheduler = NoiseScheduleVP(
        config.sde.schedule,
        continuous_beta_0=config.sde.continuous_beta_0,
        continuous_beta_1=config.sde.continuous_beta_1,
    )
    inverse_scaler = get_data_inverse_scaler(config)

    ckpts = config.eval.ckpts
    if ckpts != "":
        ckpts = [int(c) for c in ckpts.split(",")]
    else:
        ckpts = list(range(config.eval.begin_ckpt, config.eval.end_ckpt + 1))

    # fan the sweep out over the mesh when more than one chip is visible
    # (SURVEY §2.12: per-chip reverse-diffusion shards, host gather)
    eval_mesh = create_mesh(config.training.num_devices)
    fan_mesh, fan_batch = _sampling_mesh(eval_mesh, config.eval.batch_size)
    sampling_fn = make_cond_sampling_fn(
        config, _inference_model(config), noise_scheduler, fan_batch,
        config.eval.num_samples, inverse_scaler, test_ds, fixed_seed=42,
        sampling_temperature=config.eval.sampling_temperature,
        mesh=fan_mesh,
    )

    atom_decoder = dataset_info["atom_decoder"]
    # Metric reference sets come from the ORIGINAL-QM9 dataset when the
    # second config is provided (ref run_lib.py:340-342: train mols seed
    # novelty, test mols seed the moses statistics); without it, fall back
    # to the conditional-split dataset — logged so eval output states which
    # protocol produced the numbers.
    if config_original_qm9 is not None:
        logging.info("metric reference sets: original-QM9 (--config_original_qm9)")
        # transform=False: reference mols only need raw pos/atoms/bonds —
        # skips ~GBs of one-hot edge/spectra arrays this path never reads
        _, ref_train_ds, _, ref_test_ds, _ = get_dataset(
            config_original_qm9, transform=False
        )
    else:
        logging.info(
            "metric reference sets: conditional-split dataset "
            "(no --config_original_qm9 given)"
        )
        ref_train_ds, ref_test_ds = second_train_ds, test_ds
    logging.info("loading training mols")
    train_rows = ref_train_ds.take(np.arange(len(ref_train_ds)))
    train_graphs = _rows_to_molgraphs(train_rows, atom_decoder)
    logging.info("loading test mols")
    test_rows = ref_test_ds.take(np.arange(len(ref_test_ds)))
    test_graphs = _rows_to_molgraphs(test_rows, atom_decoder)

    edm_metric = get_edm_metric(dataset_info, train_graphs)
    edm_metric_2d = get_2D_edm_metric(dataset_info, train_graphs)

    from .evaluation.mose_metric import get_moses_metrics
    from .evaluation.cal_geometry import get_sub_geometry_metric
    from .evaluation import compute_metrics as cm

    mose_metric = get_moses_metrics(test_graphs)
    if config.eval.sub_geometry:
        sub_geo_metric = get_sub_geometry_metric(
            test_graphs, dataset_info, config.data.root
        )

    # Train-set WL hash set for the seen/unseen-target generalization split
    # (computed lazily once per eval: ~0.3ms/graph of host hashing).
    # ALWAYS built from the model's actual train split (second_train_ds),
    # never the metric-reference set: with --config_original_qm9 the
    # reference train set is an independent (heavily overlapping) draw of
    # the same molecule pool, which would mark targets "seen" that the
    # model never trained on and saturate the memorization bound (r2
    # review). Only novelty/moses statistics use the reference sets.
    _train_hash_cache = {}

    def _train_hash_set():
        if "h" not in _train_hash_cache:
            if config_original_qm9 is not None:
                rows = second_train_ds.take(np.arange(len(second_train_ds)))
                graphs = _rows_to_molgraphs(rows, atom_decoder)
            else:
                graphs = train_graphs  # same split, already materialized
            _train_hash_cache["h"] = {
                g.wl_hash() for g in graphs if g is not None
            }
        return _train_hash_cache["h"]

    for ckpt in ckpts:
        ckpt_path = ckpt_lib.numbered_checkpoint_dir(workdir, ckpt)
        if not os.path.exists(ckpt_path):
            raise FileNotFoundError("Checkpoint path error: " + ckpt_path)
        logging.info("load checkpoint: %s", ckpt_path)
        state = ckpt_lib.restore_checkpoint(ckpt_path, state)

        if config.eval.enable_sampling:
            # per-phase wall timers: the eval's non-sampling time is host
            # metric work — make its breakdown visible so speedups target
            # the real hotspot instead of the device sweep
            _phase_t = [time.monotonic()]

            def _tick(name):
                now = time.monotonic()
                logging.info("phase-time || %s: %.1fs", name, now - _phase_t[0])
                _phase_t[0] = now

            logging.info("Sampling -- ckpt: %d", ckpt)
            rng, k_samp = jax.random.split(rng)
            host_ema_vars = _ema_variables(jax.device_get(state))
            processed_mols, gt_pos, gt_mols = sampling_fn(host_ema_vars, k_samp)
            logging.info("Sampling accomplished")
            _tick("sampling+decode")

            if not config.only_2D:
                stability_res, rdkit_res, sample_mols = edm_metric(processed_mols)
                logging.info(
                    "Metric-3D || atom stability: %.4f, mol stability: %.4f, "
                    "validity: %.4f, complete: %.4f,",
                    stability_res["atom_stable"], stability_res["mol_stable"],
                    rdkit_res["Validity"], rdkit_res["Complete"],
                )
                mose_res = mose_metric(sample_mols)
                logging.info(
                    "Metric-3D || FCD: %.4f (FCD_proxy: %.4f)",
                    mose_res["FCD"], mose_res["FCD_proxy"],
                )
                _tick("metrics-3d")
            else:
                sample_mols = []

            stability_res, rdkit_res, complete_mols = edm_metric_2d(processed_mols)
            logging.info(
                "Metric-2D || atom stability: %.4f, mol stability: %.4f, "
                "validity: %.4f, complete: %.4f, unique & valid: %.4f, "
                "unique & valid & novelty: %.4f",
                stability_res["atom_stable"], stability_res["mol_stable"],
                rdkit_res["Validity"], rdkit_res["Complete"], rdkit_res["Unique"],
                rdkit_res["Novelty"],
            )
            mose_res = mose_metric(complete_mols)
            logging.info(
                "Metric-2D || FCD: %.4f (FCD_proxy: %.4f), SNN: %.4f, "
                "Frag: %.4f, Scaf: %.4f, IntDiv: %.4f",
                mose_res["FCD"], mose_res["FCD_proxy"], mose_res["SNN"],
                mose_res["Frag"], mose_res["Scaf"], mose_res["IntDiv"],
            )
            logging.info(
                "Metric-2D || Filters: %.4f, QED: %.4f, SA: %.4f, "
                "logP: %.4f, weight: %.4f",
                mose_res["Filters"], mose_res["QED"], mose_res["SA"],
                mose_res["logP"], mose_res["weight"],
            )
            _tick("metrics-2d")

            if config.eval.sub_geometry:
                sub_geo_res = sub_geo_metric(complete_mols)
                logging.info(
                    "Metric-Align || Bond Length MMD: %.4f, Bond Angle MMD: "
                    "%.4f, Dihedral Angle MMD: %.6f",
                    sub_geo_res["bond_length_mean"], sub_geo_res["bond_angle_mean"],
                    sub_geo_res["dihedral_angle_mean"],
                )
                _tick("geometry")

            gt_graphs = [from_decoded(m, atom_decoder) for m in gt_mols]

            # Top-K structure recovery (BASELINE.md headline: Top-1/Top-10):
            # repeat the sweep with fresh noise — the fixed seed-42
            # permutation redraws the SAME targets, so candidate k for
            # target i comes from sweep k's position i.
            num_candidates = int(config.eval.get("num_candidates", 1))
            # hits tracked per target incrementally: memory is O(targets)
            # booleans, not O(K x targets) candidate molecules (at 10k
            # targets x K=10 the old candidate lists dominated host RAM).
            # One memo dict shared across all K sweeps: each target is
            # scored against K candidates, and without it the RDKit mode
            # re-ran to_rdkit+SanitizeMol+MolToInchiKey on the target per
            # sweep (r2 review).
            match_cache = {}

            def _match(t, m):
                return cm._exact_match(t, m, _cache=match_cache)

            # Consensus (majority-vote) ranking across the K draws: per
            # target, count canonical structure ids and submit the mode as
            # the single answer — test-time compute the single-draw Top-1
            # protocol leaves on the table (miss analysis: ~half of Top-1
            # misses are 1-2 bond edits away, i.e. sampling noise).
            # Memory: O(targets x distinct-ids) short strings.
            cons_2d = [{} for _ in gt_graphs]
            cons_3d = [{} for _ in gt_graphs]

            def _cons_add(cons, mols):
                for slot, m in zip(cons, mols):
                    cid = cm.canonical_id(m, _cache=match_cache)
                    if cid is not None:
                        slot[cid] = slot.get(cid, 0) + 1

            def _cons_hits(cons):
                hits = []
                for t, slot in zip(gt_graphs, cons):
                    tid = (
                        cm.canonical_id(t, _cache=match_cache)
                        if t is not None
                        else None
                    )
                    # max() is stable over insertion order, so ties go to
                    # the earliest-drawn structure
                    hits.append(
                        bool(slot)
                        and tid is not None
                        and max(slot.items(), key=lambda kv: kv[1])[0] == tid
                    )
                return hits

            hit_3d = [_match(t, m) for t, m in zip(gt_graphs, sample_mols)]
            hit_2d = [_match(t, m) for t, m in zip(gt_graphs, complete_mols)]
            top1_3d, top1_2d = list(hit_3d), list(hit_2d)
            if num_candidates > 1:
                _cons_add(cons_2d, complete_mols)
                if not config.only_2D:
                    _cons_add(cons_3d, sample_mols)
                for extra in range(num_candidates - 1):
                    logging.info(
                        "Top-K candidate sweep %d/%d", extra + 2, num_candidates
                    )
                    rng, k_extra = jax.random.split(rng)
                    extra_processed, _, _ = sampling_fn(host_ema_vars, k_extra)
                    if not config.only_2D:
                        _, _, extra_3d = edm_metric(extra_processed)
                        hit_3d = [
                            h or _match(t, m)
                            for h, t, m in zip(hit_3d, gt_graphs, extra_3d)
                        ]
                        _cons_add(cons_3d, extra_3d)
                    _, _, extra_2d = edm_metric_2d(extra_processed)
                    hit_2d = [
                        h or _match(t, m)
                        for h, t, m in zip(hit_2d, gt_graphs, extra_2d)
                    ]
                    _cons_add(cons_2d, extra_2d)
                n_valid = max(sum(1 for t in gt_graphs if t is not None), 1)
                if not config.only_2D:
                    logging.info(
                        "Top-%d accuracy || 3D: %.4f", num_candidates,
                        sum(hit_3d) / n_valid,
                    )
                logging.info(
                    "Top-%d accuracy || 2D: %.4f", num_candidates,
                    sum(hit_2d) / n_valid,
                )
                cons_hit_2d = _cons_hits(cons_2d)
                cons_hit_3d = _cons_hits(cons_3d) if not config.only_2D else []
                if not config.only_2D:
                    logging.info(
                        "Consensus Top-1 (mode of %d draws) || 3D: %.4f",
                        num_candidates, sum(cons_hit_3d) / n_valid,
                    )
                logging.info(
                    "Consensus Top-1 (mode of %d draws) || 2D: %.4f",
                    num_candidates, sum(cons_hit_2d) / n_valid,
                )
                _tick(f"topk-extra-sweeps(x{num_candidates - 1})")

            # Seen/unseen-target generalization split: a pure memorizer
            # scores 0 on targets whose exact graph never occurs in the
            # train reference set, so the unseen-target accuracy is the
            # compositional-generalization axis (RESULTS.md ceiling
            # analysis; train set logged above — original-QM9 or fallback).
            gt_hashes = [None if g is None else g.wl_hash() for g in gt_graphs]
            splits = [("Top-1 2D", top1_2d)]
            if not config.only_2D:
                splits.append(("Top-1 3D", top1_3d))
            if num_candidates > 1:
                splits.append((f"Top-{num_candidates} 2D", hit_2d))
                if not config.only_2D:
                    splits.append((f"Top-{num_candidates} 3D", hit_3d))
                splits.append(("Consensus 2D", cons_hit_2d))
                if not config.only_2D:
                    splits.append(("Consensus 3D", cons_hit_3d))
            train_hashes = _train_hash_set()
            n_seen = sum(1 for h in gt_hashes if h is not None and h in train_hashes)
            n_tot = sum(1 for h in gt_hashes if h is not None)
            logging.info(
                "Generalization || memorization bound: %.4f of targets "
                "(%d/%d) have their exact graph in the train set",
                n_seen / max(n_tot, 1), n_seen, n_tot,
            )
            for tag, hits in splits:
                sh = st = uh = ut = 0
                for hit, h in zip(hits, gt_hashes):
                    if h is None:
                        continue
                    if h in train_hashes:
                        st += 1
                        sh += bool(hit)
                    else:
                        ut += 1
                        uh += bool(hit)
                logging.info(
                    "Generalization || %s exact match: seen-target %.4f "
                    "(%d/%d), unseen-target %.4f (%d/%d)",
                    tag, sh / max(st, 1), sh, st, uh / max(ut, 1), uh, ut,
                )

            cm.compute_similarity_metrics(
                sample_mols, gt_graphs, eval_dir, ckpt, "3D"
            )
            cm.compute_similarity_metrics(
                complete_mols, gt_graphs, eval_dir, ckpt, "2D"
            )
            _tick("similarity")

            if config.eval.save_mols.lower() == "true":
                import pickle

                analysis_dir = os.path.join(eval_dir, f"molecules_ckpt_{ckpt}")
                os.makedirs(analysis_dir, exist_ok=True)
                with open(os.path.join(analysis_dir, "sample_rdmols_3d.pkl"), "wb") as f:
                    pickle.dump(sample_mols, f)
                with open(os.path.join(analysis_dir, "complete_rdmols_2d.pkl"), "wb") as f:
                    pickle.dump(complete_mols, f)
                with open(os.path.join(analysis_dir, "groundtruth_rdmols.pkl"), "wb") as f:
                    pickle.dump(gt_mols, f)


def _rows_to_molgraphs(rows, atom_decoder):
    """Accepts transformed rows (positions / formal_charges [M,N,1]) or raw
    rows (pos / fc [M,N]) — metric reference sets are built from the RAW
    arrays (get_dataset(transform=False)) to skip the one-hot/spectra
    transform they never consume."""
    pos = rows["positions"] if "positions" in rows else rows["pos"]
    if "formal_charges" in rows:
        fc = rows["formal_charges"][..., 0]
    else:
        fc = rows["fc"]
    out = []
    for i in range(len(rows["num_atom"])):
        n = int(rows["num_atom"][i])
        out.append(
            from_decoded(
                (
                    pos[i][:n],
                    rows["atom_type"][i][:n],
                    rows["edge_type"][i][:n, :n],
                    fc[i][:n].astype(np.int64),
                ),
                atom_decoder,
            )
        )
    return out


run_train_dict = {"diffspectra": diffspectra_train}
run_eval_dict = {"diffspectra": diffspectra_evaluate}


def train(config, config_original_qm9, workdir):
    return run_train_dict[config.exp_type](config, config_original_qm9, workdir)


def evaluate(config, config_original_qm9, workdir, eval_folder="eval"):
    run_eval_dict[config.exp_type](config, config_original_qm9, workdir, eval_folder)
