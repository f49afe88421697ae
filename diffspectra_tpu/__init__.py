"""DiffSpectra-TPU: a TPU-native JAX framework for molecular structure
elucidation from multi-modal spectra (IR / Raman / UV-Vis) via conditional
diffusion.

This is a from-scratch TPU-first rebuild of the capabilities of the
AzureLeon1/DiffSpectra reference (PyTorch/PyG/CUDA). Nothing here is a
translation: the graph networks are dense masked-attention transformers over
padded ``[B, N, ...]`` / ``[B, N, N, ...]`` tensors (N <= 29 atoms on QM9S),
the reverse-diffusion sampler is a single ``lax.scan`` with zero host round
trips, training is one jitted step data-parallelised with
``shard_map``/``psum`` over a TPU mesh, and the hot attention path has a
fused Pallas kernel.

Package layout
--------------
- ``diffusion``   VP-SDE noise schedules (ref: diffusion/noise_schedule.py)
- ``models``      DMT / DMT_WO_EQ / CDGS / SpecFormer flax modules
                  (ref: models/*.py)
- ``ops``         dense graph ops, Kabsch, Pallas kernels
- ``training``    losses, optimizer (warmup + adaptive clip), EMA, train step
                  (ref: losses.py, models/ema.py)
- ``sampling``    ancestral sampler as lax.scan + decode harness
                  (ref: sampling.py)
- ``data``        QM9S ingest, dense transform, batching, augmentation
                  (ref: datasets/)
- ``parallel``    device mesh + sharding helpers (replaces torch DataParallel)
- ``evaluation``  host-side metrics: stability, validity, geometry MMD,
                  similarity (ref: evaluation/, compute_metrics.py)
- ``utils``       scalers, masks, registry, config
"""

__version__ = "0.1.0"
