"""moses-protocol `Filters` pass-rate and Ertl SA score.

The reference reports ``Filters`` (fraction of generated molecules passing
moses' medchem filters) and mean ``SA`` via its moses fork
(ref evaluation/mose_metric.py:117-128).  moses' ``mol_passes_filters``
(moses/metrics/utils.py) checks, in order:

  1. the molecule parses / sanitises,
  2. no SSSR ring of size >= 8,
  3. no atom carries a formal charge,
  4. every atom is in {C, N, S, O, F, Cl, Br, H},
  5. no MCF / PAINS SMARTS hits (on the H-added mol),
  6. the canonical SMILES is non-empty and re-parses.

This module implements that protocol first-party:

- PAINS: RDKit's built-in ``FilterCatalog`` PAINS family (A+B+C).  moses
  vendors ``wehi_pains.csv``; both derive from Baell & Holloway (2010), so
  the hit set is the same family of patterns sourced from the RDKit
  distribution instead of a vendored CSV.
- MCF: moses' 22-row ``mcf.csv`` is not redistributable from memory; supply
  it via the ``DIFFSPECTRA_MCF_CSV`` env var (or drop it at
  ``diffspectra_tpu/data/mcf.csv``) and it is applied exactly.  Without it,
  checks 1-4 + PAINS + 6 still run (on QM9's H/C/N/O/F vocabulary the
  structural checks dominate; the gap is logged once).
- SA: RDKit ships Ertl & Schuffenhauer's ``sascorer`` (and its fragment
  score table) in ``RDKit/Contrib/SA_Score`` — the very file moses vendors —
  so with RDKit installed the SA number is the published score, no extra
  data needed.

Without RDKit entirely, a structural subset of the Filters protocol runs on
MolGraph (charges, element set, shortest-cycle >= 8 via per-edge BFS as the
SSSR stand-in); SA is NaN (the fragment table is RDKit data).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from .molgraph import MolGraph
from .rdkit_metric import HAS_RDKIT

_ALLOWED_ATOMS = {"C", "N", "S", "O", "F", "Cl", "Br", "H"}

_warned_no_mcf = False
_pains_catalog = None
_mcf_patterns = None
_sascorer = None


# ------------------------------------------------------------------ SA score
def _load_sascorer():
    """Import RDKit's Contrib sascorer (lazy, cached)."""
    global _sascorer
    if _sascorer is not None:
        return _sascorer
    import sys

    from rdkit.Chem import RDConfig

    sa_dir = os.path.join(RDConfig.RDContribDir, "SA_Score")
    if sa_dir not in sys.path:
        sys.path.append(sa_dir)
    import sascorer  # type: ignore

    _sascorer = sascorer
    return _sascorer


def sa_score(mol) -> float:
    """Ertl SA score via RDKit Contrib sascorer (1=easy .. 10=hard)."""
    if not HAS_RDKIT:
        return float("nan")
    try:
        return float(_load_sascorer().calculateScore(mol))
    except Exception as e:  # Contrib layout changed / table unreadable
        logging.warning("sa_score unavailable: %s", e)
        return float("nan")


# ------------------------------------------------------------------- filters
def _get_pains_catalog():
    global _pains_catalog
    if _pains_catalog is None:
        from rdkit.Chem.FilterCatalog import FilterCatalog, FilterCatalogParams

        params = FilterCatalogParams()
        params.AddCatalog(FilterCatalogParams.FilterCatalogs.PAINS)
        _pains_catalog = FilterCatalog(params)
    return _pains_catalog


def _get_mcf_patterns():
    """MCF SMARTS from DIFFSPECTRA_MCF_CSV or diffspectra_tpu/data/mcf.csv."""
    global _mcf_patterns, _warned_no_mcf
    if _mcf_patterns is not None:
        return _mcf_patterns
    from rdkit import Chem

    paths = [
        os.environ.get("DIFFSPECTRA_MCF_CSV", ""),
        os.path.join(os.path.dirname(__file__), "..", "data", "mcf.csv"),
    ]
    patterns = []
    for path in paths:
        if path and os.path.isfile(path):
            import csv

            with open(path) as f:
                for row in csv.DictReader(f):
                    smarts = row.get("smarts") or row.get("SMARTS")
                    if smarts:
                        patt = Chem.MolFromSmarts(smarts)
                        if patt is not None:
                            patterns.append(patt)
            break
    if not patterns and not _warned_no_mcf:
        logging.info(
            "Filters: no mcf.csv found (DIFFSPECTRA_MCF_CSV unset) — "
            "running PAINS + structural checks only"
        )
        _warned_no_mcf = True
    _mcf_patterns = patterns
    return _mcf_patterns


def mol_passes_filters_rdkit(mol) -> bool:
    from rdkit import Chem

    if mol is None:
        return False
    try:
        Chem.SanitizeMol(mol)
    except Exception:
        return False
    ring_info = mol.GetRingInfo()
    if ring_info.NumRings() != 0 and any(
        len(x) >= 8 for x in ring_info.AtomRings()
    ):
        return False
    if any(a.GetFormalCharge() != 0 for a in mol.GetAtoms()):
        return False
    if any(a.GetSymbol() not in _ALLOWED_ATOMS for a in mol.GetAtoms()):
        return False
    # moses matches BOTH filter families against the explicit-H mol
    # (moses utils.mol_passes_filters builds h_mol = AddHs(mol) and runs all
    # SMARTS on it); PAINS patterns with H-count constraints can differ on
    # the implicit-H mol
    h_mol = Chem.AddHs(mol)
    if _get_pains_catalog().HasMatch(h_mol):
        return False
    for patt in _get_mcf_patterns():
        if h_mol.HasSubstructMatch(patt):
            return False
    smiles = Chem.MolToSmiles(mol)
    if not smiles or Chem.MolFromSmiles(smiles) is None:
        return False
    return True


def _shortest_cycle_through_edge(bo: np.ndarray, i: int, j: int) -> Optional[int]:
    """Length of the shortest cycle containing edge (i, j): 1 + shortest
    i->j path avoiding the edge itself (BFS)."""
    n = bo.shape[0]
    dist = np.full(n, -1, dtype=np.int64)
    dist[i] = 0
    queue = [i]
    while queue:
        u = queue.pop(0)
        for v in np.nonzero(bo[u])[0]:
            v = int(v)
            if (u == i and v == j) or (u == j and v == i):
                continue
            if dist[v] < 0:
                dist[v] = dist[u] + 1
                queue.append(v)
    return None if dist[j] < 0 else int(dist[j]) + 1


def mol_passes_filters_graph(mol: MolGraph) -> bool:
    """Structural subset of the moses protocol on MolGraph (no SMARTS)."""
    if mol is None or mol.n_atoms == 0:
        return False
    if any(int(c) != 0 for c in mol.formal_charges):
        return False
    if any(s not in _ALLOWED_ATOMS for s in mol.atom_syms):
        return False
    bo = mol.bond_orders
    iu, ju = np.nonzero(np.triu(bo, 1))
    for i, j in zip(iu, ju):
        cyc = _shortest_cycle_through_edge(bo, int(i), int(j))
        if cyc is not None and cyc >= 8:
            return False
    return True


def mol_passes_filters(mol) -> bool:
    if isinstance(mol, MolGraph) or not HAS_RDKIT:
        return mol_passes_filters_graph(mol)
    return mol_passes_filters_rdkit(mol)
