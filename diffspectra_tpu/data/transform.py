"""EdgeComSpectra transform over dense numpy arrays.

Vectorised rewrite of ref datasets/build_dataset.py:94-149
(``EdgeComSpectraTransform``): one-hot atom types, compress bond orders into
the 2(/3)-channel dense edge tensor [exists; order/3; (aromatic)], and apply
log10(x+1) spectra normalisation. The reference applies this per-molecule in
DataLoader workers; here it runs once over the whole array store (or in the
C++ packer for streaming ingest).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def edge_com_spectra_transform(
    raw: Dict[str, np.ndarray],
    atom_types: int = 5,
    include_aromatic: bool = False,
    use_normalize: bool = True,
) -> Dict[str, np.ndarray]:
    """raw: atom_type [M,N], pos, edge_type [M,N,N] int bond orders
    (4 = aromatic), fc, num_atom, uv/ir/raman.

    Returns the model-facing arrays: atom_one_hot [M,N,A] f32,
    edge_one_hot [M,N,N,C] f32, positions, formal_charges [M,N,1],
    num_atom, uv/ir/raman (log-normalised).
    """
    atom_type = raw["atom_type"]
    edge_type = raw["edge_type"]
    m, n = atom_type.shape

    ar = np.arange(n)
    node_mask = (ar[None, :] < raw["num_atom"][:, None]).astype(np.float32)

    atom_one_hot = (
        atom_type[..., None] == np.arange(atom_types)[None, None, :]
    ).astype(np.float32) * node_mask[..., None]

    # bond-order channel: aromatic(4) -> 0, divide by 3 (ref :117-120)
    edge_bond = edge_type.astype(np.float32).copy()
    edge_bond[edge_type == 4] = 0.0
    edge_bond = edge_bond / 3.0
    feats = [edge_bond]
    if include_aromatic:
        feats.append((edge_type == 4).astype(np.float32))
    edge_feat = np.stack(feats, axis=-1)
    edge_exist = (edge_feat.sum(-1, keepdims=True) != 0).astype(np.float32)
    edge_one_hot = np.concatenate([edge_exist, edge_feat], axis=-1)

    out = dict(
        atom_one_hot=atom_one_hot,
        edge_one_hot=edge_one_hot,
        positions=raw["pos"].astype(np.float32),
        formal_charges=raw["fc"].astype(np.float32)[..., None],
        num_atom=raw["num_atom"],
        atom_type=atom_type,
        edge_type=edge_type,
    )
    for k in ("uv", "ir", "raman"):
        if k in raw:
            spec = raw[k].astype(np.float32)
            if use_normalize:
                spec = np.log10(spec + 1.0)  # ref :141-148
            out[k] = spec
    return out
