"""Hungarian atom-assignment RMSD with two-stage alignment.

Rewrite of ref eval_sampled_mols/rmsd.py:12-273 over ``MolGraph`` (works
with RDKit mols too): centroid removal, rough Hungarian match -> Kabsch
rotation (PCA principal-axis fallback), final thresholded match, RMSD and
atom-type accuracy. scipy ``linear_sum_assignment`` is host-side.
"""

from __future__ import annotations

import warnings
from typing import List, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment

from .molgraph import MolGraph


def _as_graph(mol) -> Optional[MolGraph]:
    if isinstance(mol, MolGraph):
        return mol if mol.positions is not None else None
    if mol is None:
        return None
    from .cal_geometry import _to_molgraph

    g = _to_molgraph(mol)
    return g if g.positions is not None else None


def _atom_type_penalty(s1: str, s2: str) -> float:
    """ref rmsd.py:190-198."""
    if s1 == s2:
        return 0.0
    if s1 in ("C", "N", "O", "S") and s2 in ("C", "N", "O", "S"):
        return 2.0
    return 10.0


def _distance_matrix(ref: MolGraph, prb: MolGraph, ref_coords, prb_coords):
    spatial = np.linalg.norm(
        prb_coords[:, None, :] - ref_coords[None, :, :], axis=-1
    )
    penalty = np.array(
        [[_atom_type_penalty(sp, sr) for sr in ref.atom_syms] for sp in prb.atom_syms]
    )
    return spatial + penalty


def _hungarian_match(ref, prb, ref_coords, prb_coords, max_distance=np.inf):
    """ref rmsd.py:153-174: {prb_idx: ref_idx} with threshold clipping."""
    dist = _distance_matrix(ref, prb, ref_coords, prb_coords)
    if np.isfinite(max_distance):
        dist = dist.copy()
        dist[dist > max_distance] = 1000.0
    try:
        prb_idx, ref_idx = linear_sum_assignment(dist)
    except Exception as e:  # pragma: no cover
        warnings.warn(f"Hungarian algorithm failed: {e}")
        return None
    out = {}
    for p, r in zip(prb_idx, ref_idx):
        if dist[p, r] <= (max_distance if np.isfinite(max_distance) else np.inf):
            out[int(p)] = int(r)
    return out


def _kabsch_rotation(P, Q):
    """min ||P R - Q|| with det(R)=+1 (ref rmsd.py:111-124)."""
    H = P.T @ Q
    U, _, Vt = np.linalg.svd(H)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        Vt[-1, :] *= -1
        R = U @ Vt
    return R


def _pca_alignment(P, Q):
    """Correspondence-free principal-axes alignment (ref rmsd.py:130-151)."""

    def axes(X):
        C = np.cov(X.T)
        w, V = np.linalg.eigh(C)
        return V[:, np.argsort(w)[::-1]]

    R = axes(P) @ axes(Q).T
    if np.linalg.det(R) < 0:
        R[:, -1] *= -1
    return R


def hungarian_atom_mapping(ref_mol, prb_mol, max_distance=5.0, min_atoms=3):
    """Returns (atom_map {prb: ref}, rmsd, atom_type_accuracy)
    (ref rmsd.py:12-73)."""
    ref = _as_graph(ref_mol)
    prb = _as_graph(prb_mol)
    if ref is None or prb is None:
        return None, None, None
    ref = ref.largest_fragment()
    prb = prb.largest_fragment()

    ref_c = ref.positions - ref.positions.mean(0, keepdims=True)
    prb_c = prb.positions - prb.positions.mean(0, keepdims=True)

    tmp_map = _hungarian_match(ref, prb, ref_c, prb_c, max_distance=np.inf)
    if not tmp_map or len(tmp_map) < min_atoms:
        R = _pca_alignment(prb_c, ref_c)
        prb_aligned = prb_c @ R
    else:
        P = prb_c[list(tmp_map.keys()), :]
        Q = ref_c[list(tmp_map.values()), :]
        R = _kabsch_rotation(P, Q)
        prb_aligned = prb_c @ R

    final_map = _hungarian_match(ref, prb, ref_c, prb_aligned, max_distance)
    if not final_map or len(final_map) < min_atoms:
        return None, None, None

    diffs2 = [
        np.sum((prb_aligned[p] - ref_c[r]) ** 2) for p, r in final_map.items()
    ]
    rmsd = float(np.sqrt(np.mean(diffs2)))
    correct = sum(
        1 for p, r in final_map.items() if prb.atom_syms[p] == ref.atom_syms[r]
    )
    return final_map, rmsd, correct / len(final_map)


def hungarian_rmsd_batch(ref_mols, prb_mols, max_distance=5.0, min_atoms=3, verbose=False):
    """Batch interface (ref rmsd.py:232-273): returns
    (rmsd_list, success_rate, mean_rmsd, mean_atom_type_accuracy)."""
    assert len(ref_mols) == len(prb_mols)
    rmsd_list: List[Optional[float]] = []
    acc_list: List[Optional[float]] = []
    success = 0
    for i, (ref, prb) in enumerate(zip(ref_mols, prb_mols)):
        try:
            _, rmsd, acc = hungarian_atom_mapping(ref, prb, max_distance, min_atoms)
            rmsd_list.append(rmsd)
            acc_list.append(acc)
            if rmsd is not None:
                success += 1
        except Exception:
            rmsd_list.append(None)
            acc_list.append(None)
    valid = [r for r in rmsd_list if r is not None]
    accs = [a for a in acc_list if a is not None]
    return (
        rmsd_list,
        success / len(ref_mols) if ref_mols else 0.0,
        float(np.mean(valid)) if valid else None,
        float(np.mean(accs)) if accs else None,
    )
