"""pack_from_pyg against a miniature fake processed .pt (VERDICT r1 weak #4:
the real-ingest path had zero coverage against an actual file).

The fixture emulates the reference's processed-file layout
(ref qm9s_dataset.py:167-277 + PyG InMemoryDataset.collate): a pickled
``(Data, slices)`` pair where node tensors are concatenated across molecules,
``edge_index`` carries GLOBAL (offset) node indices, and spectra are
row-per-molecule. Classes are pickled under the torch_geometric module paths
so the unpickle shims in data/qm9s.py are exercised for real.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _make_fake_processed(root, mols, max_n=6):
    """mols: list of dicts with atom_type [n], pos [n,3], fc [n],
    bonds [(i, j, order)] (local indices). Thin wrapper over the shared
    processed-layout writer (data/qm9s.py:write_processed_pt) so the test
    and the at-scale rehearsal (tools/make_rehearsal_pt.py) exercise one
    implementation."""
    from diffspectra_tpu.data.qm9s import write_processed_pt

    return write_processed_pt(root, mols)


def _fake_mols():
    rng = np.random.default_rng(0)
    mols = []
    for n, bonds in [
        (3, [(0, 1, 1), (1, 2, 2)]),
        (5, [(0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 1)]),
        (4, [(0, 1, 4), (1, 2, 4), (2, 3, 1)]),
    ]:
        mols.append(
            dict(
                atom_type=rng.integers(1, 9, size=n),
                pos=rng.normal(size=(n, 3)).astype(np.float32),
                fc=rng.integers(-1, 2, size=n),
                bonds=bonds,
            )
        )
    return mols


def test_pack_from_pyg_roundtrip(tmp_path):
    from diffspectra_tpu.data.qm9s import load_qm9s, pack_from_pyg

    root = str(tmp_path)
    mols = _fake_mols()
    _make_fake_processed(root, mols)
    raw, splits = pack_from_pyg(root, max_n=6)

    assert raw["num_atom"].tolist() == [3, 5, 4]
    for m, mol in enumerate(mols):
        n = len(mol["atom_type"])
        np.testing.assert_array_equal(raw["atom_type"][m, :n], mol["atom_type"])
        assert (raw["atom_type"][m, n:] == 0).all()
        np.testing.assert_allclose(raw["pos"][m, :n], mol["pos"], atol=1e-6)
        np.testing.assert_array_equal(raw["fc"][m, :n], mol["fc"])
        # dense bond matrix: LOCAL indices, symmetric, right orders
        expect = np.zeros((6, 6), np.int64)
        for i, j, o in mol["bonds"]:
            expect[i, j] = expect[j, i] = o
        np.testing.assert_array_equal(raw["edge_type"][m], expect)
    assert raw["ir"].shape == (3, 3501)

    # packed store written and reloadable (the production load path)
    raw2, splits2 = load_qm9s(root, max_n=6)
    for k in raw:
        np.testing.assert_array_equal(np.asarray(raw2[k]), raw[k])
    # 4 splits cover all molecules exactly once
    all_idx = np.concatenate([np.asarray(s) for s in splits2])
    assert sorted(all_idx.tolist()) == [0, 1, 2]


def test_pack_from_pyg_uses_split_file(tmp_path):
    from diffspectra_tpu.data.qm9s import pack_from_pyg

    root = str(tmp_path)
    _make_fake_processed(root, _fake_mols())
    torch.save(
        {"first_train": torch.tensor([2]), "second_train": torch.tensor([0]),
         "valid": torch.tensor([1]), "test": torch.tensor([1])},
        os.path.join(root, "split_dict_diffspectra_qm9.pt"),
    )
    _, splits = pack_from_pyg(root, max_n=6)
    assert [s.tolist() for s in splits] == [[2], [0], [1], [1]]


@pytest.mark.slow
def test_real_ingest_feeds_production_trainer(tmp_path):
    """End-to-end: a processed .pt in the reference layout is auto-converted
    by load_qm9s (pack_from_pyg) and feeds the PRODUCTION trainer
    (run_lib.train with data.synthetic=False) — the turnkey real-data entry
    (ref run_lib.py:172 + qm9s_dataset.py:195-277). Uses a real split file so
    the tiny fixture bypasses the full-dataset 13k/5k split constants."""
    from diffspectra_tpu import run_lib
    from diffspectra_tpu.configs import smoke

    rng = np.random.default_rng(1)
    mols = []
    for k in range(32):
        n = int(rng.integers(3, 7))
        bonds = [(i, i + 1, int(rng.integers(1, 4))) for i in range(n - 1)]
        mols.append(
            dict(
                atom_type=rng.integers(0, 5, size=n),  # type indices (H..F)
                pos=rng.normal(size=(n, 3)).astype(np.float32),
                fc=np.zeros(n, np.int64),
                bonds=bonds,
            )
        )
    root = str(tmp_path / "qm9s")
    _make_fake_processed(root, mols)
    idx = rng.permutation(32)
    torch.save(
        {"first_train": torch.tensor(idx[:8]),
         "second_train": torch.tensor(idx[8:24]),
         "valid": torch.tensor(idx[24:28]),
         "test": torch.tensor(idx[28:])},
        os.path.join(root, "split_dict_diffspectra_qm9.pt"),
    )

    cfg = smoke.get_config()
    cfg.data.synthetic = False
    cfg.data.root = root
    cfg.training.n_iters = 2
    cfg.training.log_freq = 1
    cfg.training.snapshot_freq = 2
    cfg.training.snapshot_freq_for_preemption = 2
    cfg.training.snapshot_sampling = False

    workdir = str(tmp_path / "run")
    run_lib.train(cfg, None, workdir)
    # n_iters=2 with snapshot_freq=2 -> numbered checkpoint_1 written from
    # real-ingest training steps (stdout.txt is main.py's tee, absent here)
    assert os.path.isdir(os.path.join(workdir, "checkpoints", "checkpoint_1"))
    # the conversion wrote the packed store next to the .pt (one-time cost)
    assert os.path.exists(os.path.join(root, "packed", "atom_type.npy"))


def test_pack_rejects_unoffset_layout(tmp_path):
    """Guard: if edge_index is NOT globally offset (unexpected layout), the
    converter must fail loudly, not scatter bonds into the wrong molecules."""
    from diffspectra_tpu.data.qm9s import pack_from_pyg

    root = str(tmp_path)
    mols = _fake_mols()
    mapping = _make_fake_processed(root, mols)
    # rewrite edge_index with local (unoffset) indices: molecule 1's edges
    # will look out-of-place relative to its slice offsets... local indices
    # stay in range only when they alias molecule 0's atoms, so corrupt one
    # column to be clearly out of range instead
    ei = mapping["edge_index"].clone()
    ei[0, -1] = 100
    mapping["edge_index"] = ei
    import torch_geometric.data.data as pyg_data
    import torch_geometric.data.storage as pyg_storage

    storage = pyg_storage.GlobalStorage.__new__(pyg_storage.GlobalStorage)
    storage.__dict__["_mapping"] = dict(mapping)
    data = pyg_data.Data.__new__(pyg_data.Data)
    data.__dict__["_store"] = storage
    edge_counts = [2 * len(m["bonds"]) for m in mols]
    offsets = np.cumsum([0] + [len(m["atom_type"]) for m in mols])
    slices = {
        "atom_type": torch.tensor(offsets),
        "edge_index": torch.tensor(np.cumsum([0] + edge_counts)),
        "num_atom": torch.tensor(np.arange(len(mols) + 1)),
    }
    torch.save((data, slices),
               os.path.join(root, "processed", "data_qm9_allspectra.pt"))
    with pytest.raises(ValueError, match="edge_index outside"):
        pack_from_pyg(root, max_n=6)
