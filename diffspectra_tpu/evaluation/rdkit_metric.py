"""Basic molecule metrics: Validity / Complete / Unique / Novelty.

Rewrite of ref evaluation/rdkit_metric.py:86-129. RDKit (host C++ library)
is optional here: when present, metrics use sanitisation + canonical SMILES
exactly like the reference; when absent, a pure-python fallback uses the
valence rules for validity and WL canonical hashes for uniqueness/novelty
(documented approximation; same definitions, different canonicaliser).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

try:
    from rdkit import Chem

    HAS_RDKIT = True
except ImportError:  # pragma: no cover - environment without RDKit
    Chem = None
    HAS_RDKIT = False

from .molgraph import MolGraph


def eval_rdmol(rdmols, train_smiles: Optional[Sequence[str]] = None) -> dict:
    """RDKit-backed metrics (ref rdkit_metric.py:86-129)."""
    if not HAS_RDKIT:
        raise RuntimeError("RDKit not available; use eval_molgraphs instead")
    results = {"Validity": 0.0, "Complete": 0.0, "Unique": 0.0, "Novelty": 0.0}
    n = len(rdmols)
    valid_smiles = []
    complete_smiles = []
    for mol in rdmols:
        if mol is None:
            continue
        try:
            Chem.SanitizeMol(mol)
            smiles = Chem.MolToSmiles(mol)
        except Exception:
            continue
        if smiles is None:
            continue
        valid_smiles.append(smiles)
        mol_frags = Chem.rdmolops.GetMolFrags(mol, asMols=True, sanitizeFrags=False)
        if len(mol_frags) == 1:
            complete_smiles.append(smiles)
    results["Validity"] = len(valid_smiles) / n if n else 0.0
    results["Complete"] = len(complete_smiles) / n if n else 0.0
    unique = set(complete_smiles)
    results["Unique"] = len(unique) / n if n else 0.0
    if train_smiles is not None:
        train_set = set(train_smiles)
        novel = [s for s in unique if s not in train_set]
        results["Novelty"] = len(novel) / n if n else 0.0
    return results


def eval_molgraphs(
    mols: List[MolGraph], train_hashes: Optional[set] = None
) -> dict:
    """Pure-python fallback with the same metric definitions."""
    results = {"Validity": 0.0, "Complete": 0.0, "Unique": 0.0, "Novelty": 0.0}
    n = len(mols)
    if n == 0:
        return results
    valid = []
    complete_hashes = []
    for m in mols:
        if m.n_atoms == 0:
            continue
        if not m.valence_ok():
            continue
        valid.append(m)
        if m.n_fragments() == 1:
            complete_hashes.append(m.wl_hash())
    results["Validity"] = len(valid) / n
    results["Complete"] = len(complete_hashes) / n
    unique = set(complete_hashes)
    results["Unique"] = len(unique) / n
    if train_hashes is not None:
        novel = [h for h in unique if h not in train_hashes]
        results["Novelty"] = len(novel) / n
    return results


def get_rdkit_rmsd(mols, n_conf: int = 10, random_seed: int = 42):
    """Best conformer-ensemble RMSD via MMFF (ref rdkit_metric.py:132-164).
    RDKit-only; raises when unavailable."""
    if not HAS_RDKIT:
        raise RuntimeError("RDKit not available for conformer RMSD")
    from rdkit.Chem import AllChem

    rmsds = []
    for mol in mols:
        if mol is None:
            continue
        try:
            mol3d = Chem.AddHs(Chem.Mol(mol))
            ids = AllChem.EmbedMultipleConfs(mol3d, n_conf, randomSeed=random_seed)
            AllChem.MMFFOptimizeMoleculeConfs(mol3d)
            best = min(
                AllChem.GetConformerRMS(mol3d, 0, cid) for cid in ids if cid != 0
            )
            rmsds.append(best)
        except Exception:
            continue
    return float(np.mean(rmsds)) if rmsds else float("nan")
