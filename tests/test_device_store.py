"""DeviceStore batch assembly must reproduce the host collate exactly, and
the device-store train path must match the host-pipeline train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.data import get_dataset
from diffspectra_tpu.data.device_store import (
    DeviceStore,
    build_batch,
    estimate_bytes,
    index_iterator,
)
from diffspectra_tpu.data.pipeline import collate


def _store_and_ds():
    cfg = smoke.get_config()
    _, second, _, _, _ = get_dataset(cfg)
    return DeviceStore(second, "ir"), second, cfg


def test_build_batch_matches_host_collate():
    store, ds, cfg = _store_and_ds()
    idx = np.asarray([0, 3, 5, 7], dtype=np.int32)
    dev = build_batch(
        store.arrays(), jnp.asarray(idx),
        atom_types=cfg.data.atom_types,
        include_aromatic=cfg.data.include_aromatic,
        spectra_keys=("ir",),
    )
    host = collate(ds.take(idx), "ir")
    for k in ("atom_one_hot", "edge_one_hot", "positions", "formal_charges",
              "atom_mask", "edge_mask"):
        np.testing.assert_allclose(
            np.asarray(dev[k]), host[k], atol=1e-6, err_msg=k
        )
    np.testing.assert_allclose(np.asarray(dev["context"]), host["context"], atol=1e-6)


def test_build_batch_bucket_truncation():
    store, ds, cfg = _store_and_ds()
    idx = np.asarray([0, 1], dtype=np.int32)
    n_pad = 12
    dev = build_batch(
        store.arrays(), jnp.asarray(idx),
        atom_types=cfg.data.atom_types,
        include_aromatic=cfg.data.include_aromatic,
        spectra_keys=("ir",), n_pad=n_pad,
    )
    assert dev["atom_one_hot"].shape[1] == n_pad
    assert dev["edge_one_hot"].shape[1:3] == (n_pad, n_pad)


def test_index_iterator_covers_all_rows():
    it = index_iterator(50, 8, shuffle=True, seed=0, drop_last=False)
    seen = np.concatenate([idx for _, idx in it])
    assert sorted(seen.tolist()) == list(range(50))


def test_bucketed_index_iterator_trains_sparse_tail_bucket():
    """Leftover rows carry UP into the next-larger bucket: a tail bucket
    holding fewer rows than one batch (e.g. QM9's 26-29-atom 0.3%) must
    still be trained on, not silently dropped every epoch."""
    rng = np.random.default_rng(0)
    num_atom = np.concatenate([
        rng.integers(5, 18, size=120),   # bucket 17
        rng.integers(18, 22, size=100),  # bucket 21
        np.full(5, 28),                  # sparse tail: 5 rows < batch
    ]).astype(np.int32)
    buckets = (17, 21, 29)
    batch = 16
    batches = list(index_iterator(
        len(num_atom), batch, shuffle=True, seed=1, drop_last=True,
        bucket_sizes=buckets, num_atom=num_atom,
    ))
    seen = np.concatenate([idx for _, idx in batches])
    # every selected row fits its batch's n_pad
    for n_pad, idx in batches:
        assert num_atom[idx].max() <= n_pad
    # at most batch-1 rows dropped in the whole epoch, and the tail rows
    # (indices 220..224) are among the trained rows
    assert len(seen) >= len(num_atom) - (batch - 1)
    assert len(set(seen.tolist())) == len(seen)
    tail = set(range(220, 225))
    assert tail & set(seen.tolist()), "sparse tail bucket never trained"


def test_bucketed_iterators_reject_uncovered_rows():
    """bucket_sizes whose last bucket is below max(num_atom) would silently
    exclude the out-of-range rows from every epoch (searchsorted assigns
    them past the last bucket) — all bucketed iterators must fail loudly."""
    import pytest

    from diffspectra_tpu.data.device_store import sharded_bucket_index_iterator

    num_atom = np.array([10, 12, 26, 29], dtype=np.int32)
    with pytest.raises(ValueError, match="never be trained"):
        list(index_iterator(
            4, 2, bucket_sizes=(17, 25), num_atom=num_atom,
        ))
    with pytest.raises(ValueError, match="never be trained"):
        next(sharded_bucket_index_iterator(
            n_dev=2, shard_size=2, per_dev_batch=1,
            bucket_sizes=(17, 25), num_atom=num_atom,
        ))


def test_estimate_bytes_sane():
    store, ds, cfg = _store_and_ds()
    est = estimate_bytes(ds, "ir")
    # positions + spectra dominate; must be within 2x of the actual store
    actual = sum(
        np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(store.arrays())
    )
    assert 0.5 * actual <= est <= 2 * actual


@pytest.mark.slow
def test_device_store_train_smoke(tmp_path):
    """diffspectra_train end-to-end on the device-store path (smoke config
    fits trivially, device_resident defaults on)."""
    from diffspectra_tpu import run_lib

    cfg = smoke.get_config()
    cfg.training.n_iters = 3
    cfg.training.log_freq = 1
    cfg.training.snapshot_freq = 3
    cfg.training.snapshot_freq_for_preemption = 100
    cfg.training.snapshot_sampling = False
    state = run_lib.train(cfg, None, str(tmp_path / "wd"))
    # loop is inclusive of n_iters (ref run_lib.py:237 semantics)
    assert int(state.step) == cfg.training.n_iters + 1


# ---------------------------------------------------------------------------
# Mesh-sharded device store (per-shard HBM-resident split, ROADMAP item 6)
# ---------------------------------------------------------------------------

from jax.sharding import PartitionSpec as P  # noqa: E402
from jax import shard_map  # noqa: E402

from diffspectra_tpu.data.device_store import sharded_index_iterator  # noqa: E402
from diffspectra_tpu.parallel import create_mesh  # noqa: E402


def test_sharded_store_build_batch_matches_unsharded():
    """Each chip assembling from its LOCAL shard with shard-local indices
    must reproduce build_batch on the unsharded store at the corresponding
    global rows (incl. the wrap-padding row mapping)."""
    cfg = smoke.get_config()
    _, ds, _, _, _ = get_dataset(cfg)
    mesh = create_mesh()
    n_dev = mesh.devices.size
    store_s = DeviceStore(ds, "ir", mesh=mesh)
    store_u = DeviceStore(ds, "ir")
    shard = store_s.shard_size
    per_dev = 2

    rng = np.random.default_rng(0)
    local = rng.integers(0, shard, size=(n_dev, per_dev)).astype(np.int32)
    idx = local.reshape(-1)

    kw = dict(
        atom_types=cfg.data.atom_types,
        include_aromatic=cfg.data.include_aromatic,
        spectra_keys=("ir",),
    )

    def assemble(arrays, i):
        return build_batch(arrays, i, **kw)

    out = jax.jit(
        shard_map(
            assemble, mesh=mesh,
            in_specs=(P("data"), P("data")), out_specs=P("data"),
            check_vma=False,
        )
    )(store_s.arrays(), jnp.asarray(idx))

    # wrap-padded global row for (device d, local i)
    m = len(ds)
    padded = np.concatenate([np.arange(m), np.arange(n_dev * shard - m)])
    global_rows = np.stack(
        [padded[d * shard + local[d]] for d in range(n_dev)]
    ).reshape(-1)
    ref = build_batch(store_u.arrays(), jnp.asarray(global_rows), **kw)
    for k in ("atom_one_hot", "edge_one_hot", "positions", "formal_charges",
              "atom_mask", "edge_mask", "context"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=1e-6, err_msg=k
        )


def test_sharded_index_iterator_covers_each_shard():
    it = sharded_index_iterator(10, 4, 3, shuffle=True, seed=1)
    batches = list(it)
    assert len(batches) == 3  # 10 // 3
    stacked = np.stack(batches)  # [n_batches, n_dev*per_dev]
    assert stacked.min() >= 0 and stacked.max() < 10
    # per device: no repeats within an epoch
    for d in range(4):
        seen = stacked[:, d * 3 : (d + 1) * 3].reshape(-1)
        assert len(set(seen.tolist())) == len(seen)


def test_device_store_train_runs_under_mesh(tmp_path):
    """diffspectra_train on the mesh + sharded device-store path: 8 virtual
    devices, global batch 16, three steps."""
    from diffspectra_tpu import run_lib

    cfg = smoke.get_config()
    cfg.training.num_devices = 8
    cfg.training.base_batch_size = 2
    cfg.training.batch_size = 16
    cfg.training.eval_batch_size = 16
    cfg.training.n_iters = 3
    cfg.training.log_freq = 1
    cfg.training.snapshot_freq = 100
    cfg.training.snapshot_freq_for_preemption = 100
    cfg.training.snapshot_sampling = False
    state = run_lib.train(cfg, None, str(tmp_path / "wd"))
    assert int(state.step) == cfg.training.n_iters + 1


def test_sharded_bucket_iterator_contract():
    """Globally-agreed bucket schedule: deterministic for a seed, shard-local
    offsets in range, and every selected row fits its batch's n_pad."""
    from diffspectra_tpu.data.device_store import sharded_bucket_index_iterator

    n_dev, shard, per_dev = 4, 32, 3
    rng = np.random.default_rng(7)
    num_atom = rng.integers(5, 30, size=n_dev * shard).astype(np.int32)
    buckets = (18, 23, 29)

    a = list(sharded_bucket_index_iterator(
        num_atom, shard, n_dev, per_dev, buckets, seed=3))
    b = list(sharded_bucket_index_iterator(
        num_atom, shard, n_dev, per_dev, buckets, seed=3))
    # multi-process agreement = same (n_pad, idx) sequence from the same seed
    assert len(a) == len(b) > 0
    for (pa, ia), (pb, ib) in zip(a, b):
        assert pa == pb
        np.testing.assert_array_equal(ia, ib)

    per_shard = num_atom.reshape(n_dev, shard)
    for n_pad, idx in a:
        assert n_pad in buckets
        assert idx.shape == (n_dev * per_dev,)
        for d in range(n_dev):
            block = idx[d * per_dev : (d + 1) * per_dev]
            assert block.min() >= 0 and block.max() < shard
            assert per_shard[d][block].max() <= n_pad

    # drop_last accounting with carry-up: leftover rows of each bucket roll
    # into the next-larger bucket's count, so sparse tail buckets still get
    # steps (device_store.sharded_bucket_index_iterator)
    counts = {bs: 0 for bs in buckets}
    for n_pad, _ in a:
        counts[n_pad] += 1
    b_of = np.searchsorted(buckets, num_atom)
    gb = n_dev * per_dev
    leftover = 0
    for bi, bs in enumerate(buckets):
        total = int((b_of == bi).sum()) + leftover
        assert counts[bs] == total // gb
        leftover = total % gb


def test_sharded_bucket_iterator_empty_shard_fallback():
    """A shard with zero rows in a bucket must fall back to smaller rows
    (still shape-valid under n_pad) instead of crashing or skipping."""
    from diffspectra_tpu.data.device_store import sharded_bucket_index_iterator

    n_dev, shard, per_dev = 2, 8, 2
    # shard 0 has only tiny molecules; shard 1 spans both buckets
    num_atom = np.concatenate([
        np.full(shard, 6, dtype=np.int32),
        np.asarray([6, 6, 20, 20, 20, 20, 20, 20], dtype=np.int32),
    ])
    buckets = (10, 29)
    out = list(sharded_bucket_index_iterator(
        num_atom, shard, n_dev, per_dev, buckets, seed=0))
    assert any(n_pad == 29 for n_pad, _ in out)
    per_shard = num_atom.reshape(n_dev, shard)
    for n_pad, idx in out:
        for d in range(n_dev):
            block = idx[d * per_dev : (d + 1) * per_dev]
            assert per_shard[d][block].max() <= n_pad


def test_device_store_train_bucketed_mesh(tmp_path):
    """Bucketed padding through the mesh device-store path: per-bucket
    compiled store steps, globally-agreed schedule (closes the round-1
    'bucketing falls back to the host pipeline under a mesh' gap)."""
    from diffspectra_tpu import run_lib

    cfg = smoke.get_config()
    cfg.data.bucket_sizes = (12, 16)
    cfg.training.num_devices = 8
    cfg.training.base_batch_size = 2
    cfg.training.batch_size = 16
    cfg.training.eval_batch_size = 16
    cfg.training.n_iters = 3
    cfg.training.log_freq = 1
    cfg.training.snapshot_freq = 100
    cfg.training.snapshot_freq_for_preemption = 100
    cfg.training.snapshot_sampling = False
    state = run_lib.train(cfg, None, str(tmp_path / "wd"))
    assert int(state.step) == cfg.training.n_iters + 1


def test_device_store_train_allspectra_mesh(tmp_path):
    """allspectra (tuple context: uv+ir+raman) through the mesh store path —
    tuple leaves must shard correctly through shard_map in_specs."""
    from diffspectra_tpu import run_lib

    cfg = smoke.get_config()
    cfg.data.spectra_version = "allspectra"
    cfg.training.num_devices = 8
    cfg.training.base_batch_size = 2
    cfg.training.batch_size = 16
    cfg.training.eval_batch_size = 16
    cfg.training.n_iters = 2
    cfg.training.log_freq = 1
    cfg.training.snapshot_freq = 100
    cfg.training.snapshot_freq_for_preemption = 100
    cfg.training.snapshot_sampling = False
    state = run_lib.train(cfg, None, str(tmp_path / "wd"))
    assert int(state.step) == cfg.training.n_iters + 1


def test_sharded_bucket_carry_draws_leftover_rows():
    """Carried steps must draw the actual leftover rows from smaller
    buckets, not wraparound duplicates of a tiny tail-bucket pool
    (regression: 5 tail rows filling a 128-slot carried step ~25x each
    while the leftovers that justified the step went untrained)."""
    from diffspectra_tpu.data.device_store import sharded_bucket_index_iterator

    n_dev, shard, per_dev = 2, 32, 8
    rng = np.random.default_rng(11)
    # shard 0: mostly small molecules + 3 tail rows; shard 1: small only
    s0 = np.concatenate([
        rng.integers(5, 17, size=29), np.asarray([28, 29, 29])
    ]).astype(np.int32)
    s1 = rng.integers(5, 17, size=shard).astype(np.int32)
    num_atom = np.concatenate([s0, s1])
    buckets = (17, 29)

    out = list(sharded_bucket_index_iterator(
        num_atom, shard, n_dev, per_dev, buckets, seed=5))
    tail_batches = [idx for n_pad, idx in out if n_pad == 29]
    assert tail_batches, "carried counts must schedule tail-bucket steps"

    per_shard = num_atom.reshape(n_dev, shard)
    draws0 = np.concatenate([idx[:per_dev] for idx in tail_batches])
    # shard 0's tail steps draw from carry(leftover small rows) + 3 tail
    # rows: the 3 tail rows must not dominate via wraparound
    tail_rows = set(np.where(per_shard[0] >= 18)[0].tolist())
    frac_tail = np.isin(draws0, list(tail_rows)).mean()
    assert frac_tail < 0.6, (
        f"tail rows are {frac_tail:.0%} of shard-0 tail-bucket draws — "
        "carried leftover rows are not being consumed"
    )
    # and carried (small) leftover rows genuinely appear
    assert (~np.isin(draws0, list(tail_rows))).any()
    # every drawn row still fits the bucket
    for n_pad, idx in out:
        for d in range(n_dev):
            block = idx[d * per_dev : (d + 1) * per_dev]
            assert per_shard[d][block].max() <= n_pad
