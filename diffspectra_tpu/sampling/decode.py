"""Decode sampled tensors into discrete molecules.

Rewrite of ref sampling.py:12-141 (``post_process`` / ``mol_process``):
un-normalise, argmax atom types, threshold edge existence at 0.5 and
quantise bond order x3 into {0,1,2,3(,4 aromatic)}. ``post_process`` is pure
jnp (runs on device, inside jit if desired); ``mol_process`` is the single
device->host boundary producing per-molecule numpy tuples.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


def quantize_edges(h_edge: jnp.ndarray, compress_edge: bool = True) -> jnp.ndarray:
    """Edge tensor [B,N,N,C] -> integer bond orders [B,N,N]
    (ref sampling.py:72-95)."""
    if compress_edge:
        edge_exist = (h_edge[..., 0] >= 0.5).astype(h_edge.dtype)
        et = h_edge[..., 1] * 3.0
        edge_type = jnp.where(
            et >= 2.5,
            3.0,
            jnp.where(et >= 1.5, 2.0, jnp.where(et >= 0.5, 1.0, 0.0)),
        )
        edge_type = edge_exist * edge_type
        if h_edge.shape[-1] == 3:
            aroma = (h_edge[..., 2] >= 0.5).astype(h_edge.dtype) * edge_exist
            edge_type = jnp.where((aroma > 0) & (edge_type == 0), 4.0, edge_type)
        return edge_type
    # one-hot edge channels: 0 if all below 0.5, else argmax+1 (ref :92-94)
    exist = (jnp.sum(h_edge > 0.5, axis=-1) != 0).astype(h_edge.dtype)
    return exist * (jnp.argmax(h_edge, axis=-1) + 1.0)


def post_process(
    xh,
    atom_types: int,
    include_charge: bool,
    node_mask,
    inverse_scaler,
    edge_x=None,
    edge_mask=None,
    compress_edge: bool = False,
    has_positions: bool = True,
):
    """Split and discretise sampled tensors (ref sampling.py:53-141).

    Returns (pos, one_hot, fc[, edge_types]); pos is None when
    ``has_positions=False`` (2D models).
    """
    if has_positions:
        pos = xh[:, :, :3]
        h = xh[:, :, 3:]
    else:
        pos = None
        h = xh
    if include_charge:
        h_int = h[:, :, -1:]
        h_cat = h[:, :, :-1]
    else:
        h_int = jnp.zeros(h.shape[:2] + (0,))
        h_cat = h

    assert h_cat.shape[-1] == atom_types

    if edge_x is not None:
        pos, h_cat, h_int, h_edge = inverse_scaler(
            pos, h_cat, h_int, node_mask, edge_x, edge_mask
        )
    else:
        pos, h_cat, h_int = inverse_scaler(pos, h_cat, h_int, node_mask)

    one_hot = (
        jnp.eye(atom_types)[jnp.argmax(h_cat, axis=2)] * node_mask
    )
    fc = jnp.round(h_int) * node_mask

    if edge_x is not None:
        edge_types = quantize_edges(h_edge, compress_edge)
        return pos, one_hot, fc, edge_types
    return pos, one_hot, fc


def mol_process(
    one_hot,
    pos,
    formal_charges,
    n_nodes,
    edge_types=None,
) -> List[Tuple]:
    """Device->host decode into per-molecule tuples
    ``(pos, atom_type, edge_type, fc)`` trimmed to the true atom count
    (ref sampling.py:12-50). ``pos`` may be None for 2D molecules."""
    one_hot = np.asarray(one_hot)
    pos_np = np.asarray(pos) if pos is not None else None
    fc_np = np.asarray(formal_charges)
    edge_np = np.asarray(edge_types) if edge_types is not None else None
    n_nodes = np.asarray(n_nodes)

    mol_list = []
    for i in range(one_hot.shape[0]):
        n = int(n_nodes[i])
        atom_type = one_hot[i, :n].argmax(axis=1)
        p = pos_np[i, :n] if pos_np is not None else None
        if edge_np is not None:
            e = edge_np[i, :n, :n]
            if fc_np.shape[-1] != 0:
                fc = fc_np[i, :n, 0].astype(np.int64)
            else:
                fc = fc_np[i, :n]
            mol_list.append((p, atom_type, e, fc))
        else:
            mol_list.append((p, atom_type))
    return mol_list
