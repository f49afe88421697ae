"""MOSES-style distribution metrics: FCD / SNN / Frag / Scaf / IntDiv /
Filters / QED / SA / logP / weight.

Rewrite of ref evaluation/mose_metric.py:28-159. The reference consumes a
custom moses fork + fcd_torch ChemNet (both absent here); this module:

- with RDKit: sanitises to canonical SMILES like the reference; Morgan(2,
  1024) bit fingerprints for SNN/IntDiv over the FULL sets (blockwise
  matmuls), moses-protocol Filters + Ertl SA via filters.py, rdkit QED /
  logP / weight;
- without RDKit: WL-subtree fingerprints (fingerprints.py), prune-based
  scaffolds, bond-environment fragments, structural-subset Filters, exact
  molecular weight.

FCD: the real metric (ChemNet activations, chemnet.py) is reported under
'FCD' when converted weights are installed, NaN otherwise; the structural
descriptor Frechet stand-in is always reported under the separate
'FCD_proxy' key so the two can never be conflated.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import fingerprints as FP
from .molgraph import MolGraph
from .rdkit_metric import HAS_RDKIT


def _sanitize_graphs(mols) -> List[MolGraph]:
    """Valid, deduplicated molecules (ref get_smiles + set(), :12-21,103-109)."""
    out = {}
    for m in mols:
        if not isinstance(m, MolGraph):
            m = _rdkit_to_graph(m)
            if m is None:
                continue
        if m.n_atoms == 0 or not m.valence_ok():
            continue
        out[m.wl_hash()] = m
    return list(out.values())


def _rdkit_to_graph(mol) -> Optional[MolGraph]:
    if not HAS_RDKIT or mol is None:
        return None
    from .cal_geometry import _to_molgraph

    try:
        return _to_molgraph(mol)
    except Exception:
        return None


def _precalc(mols: List[MolGraph]):
    return {
        "fps": [FP.wl_fingerprint(m) for m in mols],
        "frag": _counter_sum([FP.fragment_counts(m) for m in mols]),
        "scaf": _counter_sum_strings([FP.scaffold_hash(m) for m in mols]),
        "desc": np.stack([FP.descriptor_vector(m) for m in mols])
        if mols
        else np.zeros((0, 12)),
    }


def _counter_sum(counters):
    from collections import Counter

    total = Counter()
    for c in counters:
        total.update(c)
    return total


def _counter_sum_strings(strings):
    from collections import Counter

    return Counter(s for s in strings if s)


def _cos_counters(c1, c2) -> float:
    keys = set(c1) | set(c2)
    if not keys:
        return float("nan")
    v1 = np.array([c1.get(k, 0) for k in keys], dtype=np.float64)
    v2 = np.array([c2.get(k, 0) for k in keys], dtype=np.float64)
    denom = np.linalg.norm(v1) * np.linalg.norm(v2)
    return float(np.dot(v1, v2) / denom) if denom else 0.0


def _morgan_matrix(smiles_list):
    """[n, 1024] uint8 Morgan(r=2) bit matrix (RDKit mode; moses' exact
    fingerprint family for SNN/IntDiv)."""
    from rdkit import Chem, DataStructs
    from rdkit.Chem import AllChem

    rows = []
    for smi in smiles_list:
        mol = Chem.MolFromSmiles(smi)
        if mol is None:
            continue
        bv = AllChem.GetMorganFingerprintAsBitVect(mol, 2, nBits=1024)
        arr = np.zeros(1024, dtype=np.uint8)
        DataStructs.ConvertToNumpyArray(bv, arr)
        rows.append(arr)
    return (
        np.stack(rows).astype(np.float32)
        if rows
        else np.zeros((0, 1024), np.float32)
    )


def _canonical_smiles(mols) -> list:
    """Canonical SMILES of valid mols (empty without RDKit).

    MolGraph entries are converted via molgraph.to_rdkit — the run_lib eval
    pipeline builds its reference sets as MolGraphs, and without this
    conversion the real-FCD and Morgan SNN/IntDiv paths below would be dead
    in every RDKit deployment."""
    if not HAS_RDKIT:
        return []
    from rdkit import Chem

    from .molgraph import to_rdkit

    out = []
    for m in mols:
        if m is None:
            continue
        try:
            if isinstance(m, MolGraph):
                m = to_rdkit(m)
            Chem.SanitizeMol(m)
            smi = Chem.MolToSmiles(m, canonical=True)
            if smi:
                out.append(smi)
        except Exception:
            continue
    return out


def _chemnet_fcd(ptest, gen_mols, gen_smiles=None) -> float:
    """Real ChemNet FCD; NaN unless RDKit + converted weights are present
    (chemnet.py documents the weight-installation path). ``gen_smiles``:
    pre-canonicalised + deduplicated generated SMILES, to share the
    sanitize pass with the SNN/IntDiv path instead of re-running it over
    the whole set (the reference feeds its FCD the deduplicated SMILES
    set, ref mose_metric.py:104-110)."""
    ref_smiles = ptest.get("smiles", [])
    if not ref_smiles:
        return float("nan")
    from .chemnet import fcd_from_smiles, load_default

    if load_default() is None:
        return float("nan")
    if gen_smiles is None:
        gen_smiles = sorted(set(_canonical_smiles(gen_mols)))
    return fcd_from_smiles(gen_smiles, ref_smiles)


def _mols_from_smiles(smiles_list):
    """Reconstruct RDKit mols from canonical SMILES — the reference's
    ``re_mols`` (ref mose_metric.py:110), i.e. the deduplicated generated
    set every downstream metric consumes."""
    from rdkit import Chem

    out = []
    for smi in smiles_list:
        mol = Chem.MolFromSmiles(smi)
        if mol is not None:
            out.append(mol)
    return out


def get_moses_metrics(test_mols, n_jobs: int = 1, device=None, batch_size: int = 2000, ptest_pool=None):
    """Metric factory with precomputed test statistics
    (ref mose_metric.py:88-128)."""
    test_graphs = _sanitize_graphs(test_mols)
    ptest = _precalc(test_graphs)
    ptest["smiles"] = _canonical_smiles(test_mols)

    def moses_metrics(gen_mols, pool=None):
        gen_graphs = _sanitize_graphs(gen_mols)
        metrics = {}
        if not gen_graphs:
            return {
                k: float("nan")
                for k in ("FCD", "FCD_proxy", "SNN", "Frag", "Scaf", "IntDiv",
                          "Filters", "QED", "SA", "logP", "weight")
            }
        pgen = _precalc(gen_graphs)

        # one canonicalisation pass shared by ChemNet FCD, Morgan SNN/IntDiv
        # and the property means (each is a full sanitize+MolToSmiles sweep
        # over the generated set)
        gen_smiles_all = _canonical_smiles(gen_mols) if HAS_RDKIT else None

        # FCD_proxy: Frechet distance over structural descriptors. The 'FCD'
        # key is reserved for the real ChemNet metric (chemnet.py) so proxy
        # numbers can never be mistaken for published-comparable FCD.
        try:
            metrics["FCD_proxy"] = FP.frechet_distance(pgen["desc"], ptest["desc"])
        except Exception:
            metrics["FCD_proxy"] = float("nan")

        # SNN / IntDiv over the FULL sets (round 1 capped at 2000/1000 —
        # silently off-protocol; now blockwise matmuls make full sets cheap).
        # The reference DEDUPLICATES the generated set before every metric
        # (ref mose_metric.py:104-108: set() over gen SMILES, then re_mols
        # feed SNN/Frag/Scaf/IntDiv/Filters and the property means). The
        # graph path gets that for free — _sanitize_graphs dedups by WL
        # hash, so pgen/gen_graphs are already unique; the RDKit-mode
        # SMILES/mol inputs below dedup explicitly (r2 review).
        gen_smiles = (
            sorted(set(gen_smiles_all)) if gen_smiles_all is not None else None
        )
        metrics["FCD"] = _chemnet_fcd(ptest, gen_mols, gen_smiles)
        if gen_smiles is not None and ptest.get("smiles"):
            gen_mat = _morgan_matrix(gen_smiles)
            ref_mat = ptest.get("morgan")
            if ref_mat is None:
                ref_mat = _morgan_matrix(ptest["smiles"])
                ptest["morgan"] = ref_mat
        else:
            # reference-side CSR + vocab cached across calls (multi-ckpt
            # evals re-scored the fixed ~13k-mol reference per checkpoint);
            # the vocab grows append-only with unseen gen features, so
            # cached ref column indices stay valid and the copy below is
            # only re-widened.
            if "wl_csr" not in ptest:
                ptest["wl_vocab"] = {}
                ptest["wl_csr"] = FP.counters_to_csr(
                    ptest["fps"], ptest["wl_vocab"]
                )
            gen_mat = FP.counters_to_csr(pgen["fps"], ptest["wl_vocab"])
            ref_mat = ptest["wl_csr"]
            if ref_mat.shape[1] != gen_mat.shape[1]:
                ref_mat = ref_mat.copy()
                ref_mat.resize((ref_mat.shape[0], gen_mat.shape[1]))
        metrics["SNN"] = FP.snn_matrix(gen_mat, ref_mat)
        metrics["IntDiv"] = FP.internal_diversity_matrix(gen_mat)
        metrics["Frag"] = _cos_counters(pgen["frag"], ptest["frag"])
        metrics["Scaf"] = _cos_counters(pgen["scaf"], ptest["scaf"])

        if HAS_RDKIT:
            metrics.update(
                _rdkit_properties(_mols_from_smiles(gen_smiles or []))
            )
        else:
            from .filters import mol_passes_filters_graph

            metrics["Filters"] = float(
                np.mean([mol_passes_filters_graph(m) for m in gen_graphs])
            )
            metrics["QED"] = float("nan")
            metrics["SA"] = float("nan")
            metrics["logP"] = float("nan")
            metrics["weight"] = float(
                np.mean([FP.mol_weight(m) for m in gen_graphs])
            )
        return metrics

    return moses_metrics


def get_fcd_metric(test_mols, **kwargs):
    """FCD-only factory (ref mose_metric.py:131-154): real ChemNet FCD when
    weights are installed (chemnet.py), descriptor proxy under FCD_proxy."""
    test_graphs = _sanitize_graphs(test_mols)
    ptest = {
        "desc": np.stack([FP.descriptor_vector(m) for m in test_graphs])
        if test_graphs
        else np.zeros((0, 12)),
        "smiles": _canonical_smiles(test_mols),
    }

    def fcd_metric(gen_mols, pool=None):
        gen_graphs = _sanitize_graphs(gen_mols)
        out = {"FCD": _chemnet_fcd(ptest, gen_mols)}
        try:
            desc = np.stack([FP.descriptor_vector(m) for m in gen_graphs])
            out["FCD_proxy"] = FP.frechet_distance(desc, ptest["desc"])
        except Exception:
            out["FCD_proxy"] = float("nan")
        return out

    return fcd_metric


def _rdkit_properties(gen_mols) -> dict:
    from rdkit import Chem
    from rdkit.Chem import Crippen, Descriptors, QED

    from .filters import mol_passes_filters_rdkit, sa_score

    qeds, sas, logps, weights, passes = [], [], [], [], []
    for mol in gen_mols:
        if isinstance(mol, MolGraph) or mol is None:
            continue
        try:
            Chem.SanitizeMol(mol)
        except Exception:
            continue
        passes.append(mol_passes_filters_rdkit(mol))
        try:
            qeds.append(QED.qed(mol))
            sas.append(sa_score(mol))
            logps.append(Crippen.MolLogP(mol))
            weights.append(Descriptors.MolWt(mol))
        except Exception:
            continue
    return {
        "Filters": float(np.mean(passes)) if passes else float("nan"),
        "QED": float(np.mean(qeds)) if qeds else float("nan"),
        "SA": float(np.nanmean(sas)) if sas else float("nan"),
        "logP": float(np.mean(logps)) if logps else float("nan"),
        "weight": float(np.mean(weights)) if weights else float("nan"),
    }
