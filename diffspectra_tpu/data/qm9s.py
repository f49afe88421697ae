"""QM9S ingest: real-dataset loading into the dense array store.

The reference builds a PyG ``InMemoryDataset`` from gdb9.sdf + spectra
tensors (ref datasets/qm9s_dataset.py:60-361, processed file
``data_qm9_allspectra.pt``) and a conditional split file
``split_dict_diffspectra_qm9.pt`` (ref :306-312). This module accepts either:

1. a directory of packed ``.npy`` arrays (our native format, produced once by
   ``pack_from_pyg`` from the reference's processed .pt), or
2. the reference's torch processed file directly (torch-cpu unpickle).

Either way the result is the raw dict consumed by
``transform.edge_com_spectra_transform``.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

RAW_KEYS = ("atom_type", "pos", "edge_type", "fc", "num_atom", "uv", "ir", "raman")
SPLIT_KEYS = ("first_train", "second_train", "valid", "test")


def load_qm9s(root: str, max_n: int = 29) -> Tuple[Dict[str, np.ndarray], tuple]:
    """Load the packed QM9S store from ``root``.

    Expects ``<root>/packed/{atom_type,pos,edge_type,fc,num_atom,uv,ir,raman}.npy``
    plus ``<root>/packed/split_{first_train,second_train,valid,test}.npy``.
    Falls back to converting the reference torch processed file if present.
    """
    packed = os.path.join(root, "packed")
    if os.path.isdir(packed):
        raw = {k: np.load(os.path.join(packed, f"{k}.npy"), mmap_mode="r") for k in RAW_KEYS}
        splits = tuple(
            np.load(os.path.join(packed, f"split_{k}.npy")) for k in SPLIT_KEYS
        )
        if raw["atom_type"].shape[1] != max_n:
            raise ValueError(
                f"packed store has N={raw['atom_type'].shape[1]}, config wants {max_n}"
            )
        return raw, splits

    pt_file = os.path.join(root, "processed", "data_qm9_allspectra.pt")
    if os.path.exists(pt_file):
        raw, splits = pack_from_pyg(root, max_n)
        return raw, splits

    raise FileNotFoundError(
        f"No QM9S data found under {root!r}: expected packed/*.npy or "
        f"processed/data_qm9_allspectra.pt. For tests/benches set "
        f"config.data.synthetic=True."
    )


def _install_pyg_unpickle_shims():
    """Allow unpickling PyG ``Data`` objects without torch_geometric.

    The processed file stores ``(Data, slices)``; pickle only needs the class
    paths importable with generic ``__setstate__`` behaviour. Attribute reads
    route through the PyG storage mapping."""
    import sys
    import types

    try:
        import torch_geometric  # noqa: F401

        return  # real library available
    except ImportError:
        pass

    class _ShimStorage:
        def __setstate__(self, state):
            self.__dict__.update(state)

        def __getattr__(self, key):
            mapping = self.__dict__.get("_mapping", {})
            if key in mapping:
                return mapping[key]
            raise AttributeError(key)

    class _ShimData:
        def __setstate__(self, state):
            self.__dict__.update(state)

        def __getattr__(self, key):
            store = self.__dict__.get("_store")
            if store is not None:
                try:
                    return getattr(store, key)
                except AttributeError:
                    pass
            mapping = self.__dict__.get("_mapping", {})
            if key in mapping:
                return mapping[key]
            raise AttributeError(key)

    # proper module/qualname so the shims also PICKLE under the PyG paths
    # (lets tests write miniature processed files through the same classes)
    _ShimData.__module__ = "torch_geometric.data.data"
    _ShimData.__qualname__ = "Data"
    _ShimData.__name__ = "Data"
    _ShimStorage.__module__ = "torch_geometric.data.storage"
    _ShimStorage.__qualname__ = "GlobalStorage"
    _ShimStorage.__name__ = "GlobalStorage"

    mods = {
        "torch_geometric": types.ModuleType("torch_geometric"),
        "torch_geometric.data": types.ModuleType("torch_geometric.data"),
        "torch_geometric.data.data": types.ModuleType("torch_geometric.data.data"),
        "torch_geometric.data.storage": types.ModuleType("torch_geometric.data.storage"),
    }
    mods["torch_geometric.data.data"].Data = _ShimData
    mods["torch_geometric.data.data"].DataEdgeAttr = type("DataEdgeAttr", (), {})
    mods["torch_geometric.data.data"].DataTensorAttr = type("DataTensorAttr", (), {})
    mods["torch_geometric.data.storage"].GlobalStorage = _ShimStorage
    mods["torch_geometric.data.storage"].BaseStorage = _ShimStorage
    mods["torch_geometric.data"].Data = _ShimData
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)


def write_processed_pt(root: str, mols, spectra=None):
    """Write a processed-layout ``data_qm9_allspectra.pt`` (the exact
    ``(Data, slices)`` PyG-collate layout of the reference,
    ref qm9s_dataset.py:167-277): node tensors concatenated across
    molecules, ``edge_index`` with GLOBAL node offsets, spectra
    row-per-molecule. Used by the ingest fixture tests AND the
    at-scale rehearsal (tools/make_rehearsal_pt.py) so the conversion
    path is exercised against real files without the real download.

    ``mols``: list of dicts with ``atom_type [n]``, ``pos [n,3]``,
    ``fc [n]``, ``bonds`` [(i, j, order)] in LOCAL indices.
    ``spectra``: optional dict with uv [M,701] / ir [M,3501] /
    raman [M,3501] float arrays (random if omitted)."""
    import torch  # host-only dependency

    _install_pyg_unpickle_shims()
    import torch_geometric.data.data as pyg_data
    import torch_geometric.data.storage as pyg_storage

    n_mol = len(mols)
    atom_type = np.concatenate([m["atom_type"] for m in mols])
    pos = np.concatenate([m["pos"] for m in mols])
    fc = np.concatenate([m["fc"] for m in mols])
    ei_cols, et_vals = [], []
    offsets = np.cumsum([0] + [len(m["atom_type"]) for m in mols])
    for k, m in enumerate(mols):
        for i, j, o in m["bonds"]:
            ei_cols += [[i + offsets[k], j + offsets[k]],
                        [j + offsets[k], i + offsets[k]]]
            et_vals += [o, o]
    edge_index = (
        np.asarray(ei_cols, dtype=np.int64).T if ei_cols else np.zeros((2, 0), np.int64)
    )
    edge_type = np.asarray(et_vals, dtype=np.int64)

    mapping = {
        "atom_type": torch.tensor(atom_type),
        "pos": torch.tensor(pos, dtype=torch.float32),
        "fc": torch.tensor(fc),
        "edge_index": torch.tensor(edge_index),
        "edge_type": torch.tensor(edge_type),
        "num_atom": torch.tensor([len(m["atom_type"]) for m in mols]),
    }
    for key, length in (("uv", 701), ("ir", 3501), ("raman", 3501)):
        if spectra is not None and key in spectra:
            mapping[key] = torch.tensor(
                np.asarray(spectra[key], dtype=np.float32)
            )
        else:
            mapping[key] = torch.rand(n_mol, length)
    storage = pyg_storage.GlobalStorage.__new__(pyg_storage.GlobalStorage)
    storage.__dict__["_mapping"] = mapping
    data = pyg_data.Data.__new__(pyg_data.Data)
    data.__dict__["_store"] = storage

    edge_counts = [2 * len(m["bonds"]) for m in mols]
    # per-key slices for EVERY stored key, as PyG's collate writes them
    # (pos/fc share atom offsets, edge_type shares edge offsets, spectra
    # are row-per-molecule) — a reader using separate()-style per-key
    # slicing must survive, not just pack_from_pyg (ADVICE r3)
    atom_off = torch.tensor(offsets)
    edge_off = torch.tensor(np.cumsum([0] + edge_counts))
    per_mol = torch.tensor(np.arange(n_mol + 1))
    slices = {
        "atom_type": atom_off,
        "pos": atom_off,
        "fc": atom_off,
        "edge_index": edge_off,
        "edge_type": edge_off,
        "num_atom": per_mol,
        "uv": per_mol,
        "ir": per_mol,
        "raman": per_mol,
    }
    os.makedirs(os.path.join(root, "processed"), exist_ok=True)
    torch.save(
        (data, slices),
        os.path.join(root, "processed", "data_qm9_allspectra.pt"),
    )
    return mapping


def pack_from_pyg(root: str, max_n: int = 29):
    """One-time conversion of the reference's processed PyG .pt into the
    packed dense .npy store (requires torch; runs on host CPU)."""
    import torch  # host-only dependency, never on the device path

    _install_pyg_unpickle_shims()
    pt_file = os.path.join(root, "processed", "data_qm9_allspectra.pt")
    data, slices = torch.load(pt_file, map_location="cpu", weights_only=False)

    n_mol = len(slices["num_atom"]) - 1
    out = {
        "atom_type": np.zeros((n_mol, max_n), np.int64),
        "pos": np.zeros((n_mol, max_n, 3), np.float32),
        "edge_type": np.zeros((n_mol, max_n, max_n), np.int64),
        "fc": np.zeros((n_mol, max_n), np.int64),
        "num_atom": np.zeros((n_mol,), np.int64),
        "uv": np.zeros((n_mol, 701), np.float32),
        "ir": np.zeros((n_mol, 3501), np.float32),
        "raman": np.zeros((n_mol, 3501), np.float32),
    }
    atom_sl = slices["atom_type"].numpy()
    edge_sl = slices["edge_index"].numpy()
    for m in range(n_mol):
        a0, a1 = atom_sl[m], atom_sl[m + 1]
        n = a1 - a0
        out["num_atom"][m] = n
        out["atom_type"][m, :n] = data.atom_type[a0:a1].numpy()
        out["pos"][m, :n] = data.pos[a0:a1].numpy()
        out["fc"][m, :n] = data.fc[a0:a1].numpy() if hasattr(data, "fc") else 0
        e0, e1 = edge_sl[m], edge_sl[m + 1]
        # PyG's InMemoryDataset collate stores edge_index with GLOBAL node
        # offsets (cumulative across molecules); separate() subtracts the
        # molecule's first-node offset, and so must we (ref
        # qm9s_dataset.py:195-277 builds per-mol local indices pre-collate).
        ei = data.edge_index[:, e0:e1].numpy() - a0
        et = data.edge_type[e0:e1].numpy()
        if ei.size and (ei.min() < 0 or ei.max() >= n):
            raise ValueError(
                f"molecule {m}: edge_index outside [0,{n}) after offset "
                f"removal — unexpected processed-file layout"
            )
        out["edge_type"][m, ei[0], ei[1]] = et
        for key in ("uv", "ir", "raman"):
            spec = getattr(data, key)[m].numpy().reshape(-1)
            out[key][m] = spec

    split_file = os.path.join(root, "split_dict_diffspectra_qm9.pt")
    if os.path.exists(split_file):
        sd = torch.load(split_file, map_location="cpu", weights_only=False)
        splits = tuple(np.asarray(sd[k]) for k in SPLIT_KEYS)
    else:
        rng = np.random.default_rng(42)
        perm = rng.permutation(n_mol)
        n_test, n_val = 13000, 5000
        n_train = n_mol - n_test - n_val
        splits = (
            perm[: n_train // 2],
            perm[n_train // 2 : n_train],
            perm[n_train : n_train + n_val],
            perm[n_train + n_val :],
        )

    packed = os.path.join(root, "packed")
    os.makedirs(packed, exist_ok=True)
    for k, v in out.items():
        np.save(os.path.join(packed, f"{k}.npy"), v)
    for k, v in zip(SPLIT_KEYS, splits):
        np.save(os.path.join(packed, f"split_{k}.npy"), v)
    return out, splits
