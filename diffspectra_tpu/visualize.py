"""Molecule visualisation.

The reference imports a ``visualize`` module that does not exist in its
snapshot (run_lib.py:15,287-293 — a known defect recorded in SURVEY.md);
this module provides the missing surface: ``visualize_mols(mols, save_dir,
config)`` writes a grid image via RDKit drawing when available, and always
writes .xyz coordinate files as a dependency-free fallback.
"""

from __future__ import annotations

import os
from typing import List


from .evaluation.molgraph import MolGraph
from .evaluation.rdkit_metric import HAS_RDKIT


def _write_xyz(path: str, syms, positions):
    with open(path, "w") as f:
        f.write(f"{len(syms)}\n\n")
        for s, p in zip(syms, positions):
            f.write(f"{s} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def visualize_mols(mols: List, save_dir: str, config=None, max_mols: int = 16):
    """Save a molecule grid (RDKit) and per-molecule xyz files."""
    os.makedirs(save_dir, exist_ok=True)
    mols = [m for m in mols if m is not None][:max_mols]

    for i, mol in enumerate(mols):
        try:
            if isinstance(mol, MolGraph):
                if mol.positions is not None:
                    _write_xyz(
                        os.path.join(save_dir, f"mol_{i}.xyz"),
                        mol.atom_syms,
                        mol.positions,
                    )
            elif HAS_RDKIT:
                from rdkit import Chem

                conf = mol.GetConformer() if mol.GetNumConformers() else None
                if conf is not None:
                    syms = [a.GetSymbol() for a in mol.GetAtoms()]
                    pos = conf.GetPositions()
                    _write_xyz(os.path.join(save_dir, f"mol_{i}.xyz"), syms, pos)
        except Exception:
            continue

    if HAS_RDKIT:
        try:
            from rdkit.Chem import Draw

            img = Draw.MolsToGridImage(
                mols, molsPerRow=4, subImgSize=(200, 200)
            )
            img.save(os.path.join(save_dir, "grid.png"))
        except Exception:
            pass
