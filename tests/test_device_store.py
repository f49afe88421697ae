"""DeviceStore batch assembly must reproduce the host collate exactly, and
the device-store train path must match the host-pipeline train step."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_estimate_bytes_sane():
    store, ds, cfg = _store_and_ds()
    est = estimate_bytes(ds, "ir")
    # positions + spectra dominate; must be within 2x of the actual store
    actual = sum(
        np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(store.arrays())
    )
    assert 0.5 * actual <= est <= 2 * actual


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
