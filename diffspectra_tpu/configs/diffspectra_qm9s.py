"""QM9S DiffSpectra config, mirroring ref configs/diffspectra_qm9s.py:8-154.

Differences from the reference surface (deliberate, documented):
- GPU-count scaling (``torch.cuda.device_count()``, ref :87-115) becomes
  device-count scaling over ``jax.devices()``; batch/iters semantics match.
- ``config.device`` is dropped; placement is governed by the jax mesh.
"""

import ml_collections


def get_config():
    config = ml_collections.ConfigDict()

    config.exp_type = "diffspectra"
    config.pred_edge = True
    config.only_2D = False

    # data
    config.data = data = ml_collections.ConfigDict()
    data.root = "data/QM9S"
    data.name = "QM9S"
    data.processed_file = ""
    data.info_name = "qm9_second_half"
    data.num_workers = 16
    data.compress_edge = True
    data.centered = True
    data.include_aromatic = False
    data.atom_types = 5
    data.bond_types = 4
    data.fc_scale = [-1.0, 1.0]
    data.max_node = 29
    # spectra
    data.spectra_version = "allspectra"  # 'ir', 'uv', 'raman', 'allspectra'
    data.aug_translation_scale = 0.1
    data.transform = "EdgeComSpectra"
    data.use_normalize = True  # log10(x+1) spectra normalisation
    # atom-count bucket boundaries for bucketed padding (empty = single
    # static N; each bucket adds one XLA compilation but removes padded pair
    # compute — see data/pipeline.py)
    data.bucket_sizes = ()  # tuple: CLI-overridable, e.g. --config.data.bucket_sizes='(17,21,25,29)'
    # synthetic fallback when no QM9S download is present (tests/benches)
    data.synthetic = False
    data.synthetic_size = 4096
    # spectra informativeness: 1 = bond-pattern counts only (Top-1
    # identifiability ceiling ~0.17, tools/ceiling_analysis.py); 2 = adds
    # WL-1/WL-2 local-environment peaks (near-injective, like real DFT
    # spectra)
    data.synthetic_fidelity = 1
    data.synthetic_cache = ""  # dir to persist generated sets (optional)
    # device-resident dataset (single-device train fast path): upload the
    # split to HBM once, assemble batches on device — per-step host traffic
    # becomes the index vector (see data/device_store.py)
    data.device_resident = True
    data.device_store_max_bytes = 6_000_000_000

    # SDE
    config.sde = sde = ml_collections.ConfigDict()
    sde.schedule = "cosine"  # 'discrete_poly', 'linear', 'cosine'
    sde.continuous_beta_0 = 0.1
    sde.continuous_beta_1 = 20.0

    # model
    config.model = model = ml_collections.ConfigDict()
    model.name = "DMT"
    model.pred_data = True
    model.include_fc_charge = True
    model.normalize_factors = "1, 4, 4, 1"
    model.ema_decay = 0.999
    model.edge_ch = 2
    model.nf = 256
    model.n_layers = 8
    model.n_heads = 16
    model.dropout = 0.1
    model.cond_time = True
    model.dist_gbf = True
    model.gbf_name = "CondGaussianLayer"
    model.self_cond = True
    model.self_cond_type = "ori"
    model.edge_quan_th = 0.0
    model.n_extra_heads = 2
    model.CoM = True
    model.mlp_ratio = 2
    model.spatial_cut_off = 2.0
    model.softmax_inf = True
    model.trans_name = "TransMixLayer"
    model.cond_ch = 1
    model.pretrained_specformer_path = ""
    # block-scan unroll: 1 for training (fast compile, remat-friendly);
    # eval/sampling paths unroll fully (0 = n_layers) — see run_lib
    model.scan_unroll = 1
    model.scan_unroll_eval = 0
    # block-scan backward remat policy: 'full' (recompute all, min memory)
    # or 'dots' (save MXU outputs, recompute only elementwise)
    model.remat_policy = "full"
    # bf16 SpecFormer compute inside the DMT graph (see models/dmt.py gate)
    model.specformer_bf16 = False
    # fused Pallas kernels for the pair-grid attention + equi-update chain
    # (ops/pallas_attention.py, ops/pallas_equi_update.py). Experimental:
    # interpret-verified, but this container's remote TPU compiler rejects
    # Mosaic payloads — see PALLAS.md for the fallback decision tree.
    model.use_pallas = False
    # encode the spectra ONCE per train step and share the embedding across
    # the self-conditioning double forward (losses._maybe_reuse_context);
    # False = reference semantics (SpecFormer re-runs inside each forward).
    # Default True: measured +17% train throughput on v5e (1104 -> ~1290
    # graphs/sec at batch 128); only semantic delta is one BatchNorm
    # running-stats update per step instead of two identical ones.
    model.reuse_cond_emb = True
    model.patch_len = [20, 50, 50]
    model.stride = [10, 25, 25]
    # loss
    model.loss_weights = "1., 0.25, 0.1"
    model.noise_align = True

    # training
    config.training = training = ml_collections.ConfigDict()
    training.dataloader_drop_last = True
    # device-count scaling (ref scales by num GPUs, :87-115); resolved at
    # runtime by run_lib against the jax mesh
    training.num_devices = 0  # 0 = use all local devices
    base_batch_size = 128
    training.base_batch_size = base_batch_size
    training.batch_size = 0  # 0 = base_batch_size * num_devices
    training.eval_batch_size = 0
    training.eval_samples = 0
    training.reduce_mean = False
    training.log_freq = 500
    training.n_iters = 2000000
    training.snapshot_freq = 50000
    training.snapshot_freq_for_preemption = 10000
    training.snapshot_sampling = True
    # precision: bf16 matmuls on TPU (f32 params); 'highest' falls back to f32
    training.matmul_precision = "bfloat16"
    # jax_default_prng_impl, applied by run_lib.resolve_runtime_config.
    # 'rbg' (production default) draws random bits with the TPU-native
    # XLA RngBitGenerator — same key/split API and distributions,
    # different (equally valid) streams, deterministic per key (remat
    # replays the identical dropout masks). Measured on v5e (RESULTS.md
    # round-4 HBM decomposition): pair-grid dropout threefry generation
    # was 18.4 ms of the 31.5 ms train-mode forward; 'rbg' removes it —
    # full train step 84.1 -> 67.0 ms (+25% graphs/s) at batch 128/N=29.
    # '' keeps jax's default threefry2x32 (the test-suite setting, see
    # configs/smoke.py).
    training.prng_impl = "rbg"
    # capture a jax.profiler trace of steps [init+10, init+15) to
    # <workdir>/profile
    training.profile = False
    # path to a warm-start .npz (warm_state.py): when set and no checkpoint
    # exists in the workdir, params/EMA/batch_stats/step are restored from
    # it (bf16-rounded; optimizer state fresh) so a training campaign can
    # continue across machines via the repository
    training.warm_start = ""

    # optimisation
    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0
    optim.optimizer = "AdamW"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 100000
    optim.grad_clip = 10.0
    optim.disable_grad_log = True

    # SpecFormer masked-patch pretraining (TPU-native addition; the reference
    # only consumes a pretrained checkpoint — see training/pretrain.py)
    config.pretrain = pretrain = ml_collections.ConfigDict()
    pretrain.mask_ratio = 0.4
    pretrain.n_iters = 200000
    pretrain.batch_size = 0  # 0 = training.base_batch_size
    pretrain.lr = 1e-4
    pretrain.warmup = 10000
    pretrain.weight_decay = 1e-4
    pretrain.grad_clip = 1.0
    pretrain.dropout = 0.1
    pretrain.log_freq = 500
    pretrain.snapshot_freq = 20000

    # sampling
    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.method = "ancestral"
    sampling.steps = 1000
    sampling.vis_row = 4
    sampling.vis_col = 4

    # evaluation
    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.enable_sampling = True
    evaluate.batch_size = 0
    evaluate.num_samples = 10000
    evaluate.begin_ckpt = 40
    evaluate.end_ckpt = 40
    evaluate.ckpts = ""
    evaluate.sub_geometry = True
    evaluate.save_mols = "false"
    evaluate.sampling_temperature = 1.0
    # Top-K structure recovery: candidates per spectrum (1 = Top-1 only;
    # 10 reproduces the reference's Top-10 protocol, README.md:15)
    evaluate.num_candidates = 1
    # atom-count buckets for the sampling sweep (empty = single static N).
    # Pair-grid compute scales ~N^2 and the QM9 mean is 18 atoms, so bucketed
    # padding trims ~2x of the padded compute at full batches (measured
    # ~1.25-1.6x end-to-end incl. partial final batches per bucket); the
    # harness restores draw order so outputs match the unbucketed sweep.
    evaluate.bucket_sizes = (17, 21, 25, 29)

    config.seed = 42
    return config
