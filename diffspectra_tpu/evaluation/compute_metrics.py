"""Structure-recovery similarity metrics between predicted and true
molecules: Top-1 exact match, MCES, Morgan/MACCS Tanimoto, cosine, Fraggle,
functional-group similarity — CSV + detailed CSV/JSON outputs.

Rewrite of ref compute_metrics.py:38-333 + run_lib.py:59-169. Two modes:

- RDKit present: tautomer-canonicalised SMILES / InChIKey exact match,
  Morgan(2, 2048) + MACCS fingerprints, Fraggle, SMARTS functional groups —
  the reference's exact definitions. MCES uses pulp+myopic_mces when
  installed (exact protocol); otherwise the first-party exact
  branch-and-bound in mces.py (same quantity at QM9 scale).
- RDKit absent: WL-hash exact match (isomorphism-invariant stand-in for
  InChIKey), WL fingerprints for Tanimoto/cosine, graph-pattern functional
  groups, and the exact MCES distance from mces.py.

Output file shapes and metric row names match the reference so downstream
tooling is drop-in.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from . import fingerprints as FP
from .molgraph import MolGraph
from .rdkit_metric import HAS_RDKIT

try:
    import pulp  # noqa: F401
    from myopic_mces import MCES as _MCES

    HAS_MCES = True
except ImportError:
    HAS_MCES = False

FUNCTIONAL_GROUPS = {
    "alkane": "[CX4]",
    "alkene": "[CX3]=[CX3]",
    "alkyne": "[CX2]#C",
    "arene": "[$([cX3](:*):*),$([cX2+](:*):*)]",
    "alcohol": "[#6][OX2H]",
    "ether": "[OD2]([#6])[#6]",
    "aldehyde": "[CX3H1](=O)[#6]",
    "ketone": "[#6][CX3](=O)[#6]",
    "carboxylic acid": "[CX3](=O)[OX2H1]",
    "ester": "[#6][CX3](=O)[OX2H0][#6]",
    "haloalkane": "[#6][F,Cl,Br,I]",
    "acyl halide": "[CX3](=[OX1])[F,Cl,Br,I]",
    "amine": "[NX3;!$(NC=O)]",
    "amide": "[NX3][CX3](=[OX1])[#6]",
    "nitrile": "[NX1]#[CX2]",
    "sulfide": "[#16X2H0]",
    "thiol": "[#16X2H]",
}

METRIC_NAMES = [
    "Top-1 Accuracy",
    "MCES",
    "Tanimoto Similarity (Morgan)",
    "Cosine Similarity (Morgan)",
    "Tanimoto Similarity (MACCS)",
    "Fraggle Similarity",
    "Functional Group Similarity",
]


# ---------------------------------------------------------------- graph mode
def _graph_functional_groups(mol: MolGraph) -> set:
    """Pattern detection of the common functional groups on the H,C,N,O,F
    vocabulary (fallback for the SMARTS table above)."""
    groups = set()
    syms = mol.atom_syms
    bo = mol.bond_orders
    n = mol.n_atoms
    deg_h = [
        sum(1 for j in np.nonzero(bo[i])[0] if syms[j] == "H") for i in range(n)
    ]
    for i in range(n):
        si = syms[i]
        nbrs = np.nonzero(bo[i])[0]
        if si == "C":
            if all(bo[i, j] == 1 for j in nbrs):
                groups.add("alkane")
            for j in nbrs:
                if syms[j] == "C" and bo[i, j] == 2:
                    groups.add("alkene")
                if syms[j] == "C" and bo[i, j] == 3:
                    groups.add("alkyne")
                if syms[j] == "C" and bo[i, j] == 4:
                    groups.add("arene")
                if syms[j] == "F" and bo[i, j] == 1:
                    groups.add("haloalkane")
                if syms[j] == "O" and bo[i, j] == 2:
                    heavy = [k for k in nbrs if syms[k] != "H" and k != j]
                    if deg_h[i] >= 1 and any(syms[k] == "C" for k in heavy):
                        groups.add("aldehyde")
                    c_nbrs = [k for k in heavy if syms[k] == "C"]
                    o_single = [
                        k for k in heavy if syms[k] == "O" and bo[i, k] == 1
                    ]
                    if len(c_nbrs) >= 2:
                        groups.add("ketone")
                    for k in o_single:
                        if deg_h[k] >= 1:
                            groups.add("carboxylic acid")
                        elif any(
                            syms[l] == "C" for l in np.nonzero(bo[k])[0] if l != i
                        ):
                            groups.add("ester")
                if syms[j] == "N" and bo[i, j] == 3:
                    groups.add("nitrile")
        elif si == "O":
            c_nbrs = [j for j in nbrs if syms[j] == "C" and bo[i, j] == 1]
            if deg_h[i] >= 1 and c_nbrs:
                groups.add("alcohol")
            if len(c_nbrs) >= 2:
                groups.add("ether")
        elif si == "N":
            has_acyl = any(
                syms[j] == "C"
                and any(
                    syms[k] == "O" and bo[j, k] == 2 for k in np.nonzero(bo[j])[0]
                )
                for j in nbrs
            )
            if has_acyl:
                groups.add("amide")
            elif nbrs.size:
                groups.add("amine")
    return groups


def _mces_exact(m1: MolGraph, m2: MolGraph) -> float:
    """Exact MCES distance (first-party branch-and-bound, mces.py).

    Replaces the round-1 bond-multiset proxy: at QM9 scale this computes the
    same quantity as the reference's myopic_mces ILP (ref
    compute_metrics.py:235-243), so MCES numbers are comparable even without
    pulp/myopic_mces installed."""
    from .mces import mces_distance

    return mces_distance(m1, m2)


# ----------------------------------------------------------------- rdkit mode
def canonical_mol_from_smiles(smiles):
    """Tautomer-standardised mol from SMILES (ref compute_metrics.py:59-70)."""
    if not HAS_RDKIT:
        raise RuntimeError("RDKit required")
    from rdkit import Chem
    from rdkit.Chem.MolStandardize.rdMolStandardize import TautomerEnumerator

    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    return TautomerEnumerator().Canonicalize(mol)


def mol2smiles(mol):
    from rdkit import Chem

    try:
        Chem.SanitizeMol(mol)
    except ValueError:
        return None
    return Chem.MolToSmiles(mol, canonical=True)


def _pair_scores_rdkit(true_mol, pred_mol, solver):
    from rdkit import Chem
    from rdkit.Chem import AllChem, DataStructs, MACCSkeys
    from rdkit.Chem.Fraggle import FraggleSim

    scores = {}
    true_smi, pred_smi = mol2smiles(true_mol), mol2smiles(pred_mol)
    try:
        scores["inchikey_match"] = Chem.MolToInchiKey(true_mol) == Chem.MolToInchiKey(
            pred_mol
        )
    except Exception:
        scores["inchikey_match"] = None
    if HAS_MCES and true_smi and pred_smi:
        scores["mces"] = _MCES(
            true_smi, pred_smi, solver=solver, threshold=100,
            always_stronger_bound=False, solver_options=dict(msg=0),
        )[1]
    else:
        from .cal_geometry import _to_molgraph

        scores["mces"] = _mces_exact(_to_molgraph(true_mol), _to_molgraph(pred_mol))
    tf = AllChem.GetMorganFingerprintAsBitVect(true_mol, 2, nBits=2048)
    pf = AllChem.GetMorganFingerprintAsBitVect(pred_mol, 2, nBits=2048)
    tm = MACCSkeys.GenMACCSKeys(true_mol)
    pm = MACCSkeys.GenMACCSKeys(pred_mol)
    scores["tanimoto"] = DataStructs.TanimotoSimilarity(tf, pf)
    scores["tanimoto_maccs"] = DataStructs.TanimotoSimilarity(tm, pm)
    scores["cosine"] = DataStructs.CosineSimilarity(tf, pf)
    try:
        fraggle = FraggleSim.GetFraggleSimilarity(true_mol, pred_mol)
        scores["fraggle"] = fraggle[0] if isinstance(fraggle, tuple) else fraggle
    except Exception:
        scores["fraggle"] = 0.0
    from rdkit import Chem as C

    fg1 = {
        name
        for name, smarts in FUNCTIONAL_GROUPS.items()
        if true_mol.GetSubstructMatches(C.MolFromSmarts(smarts))
    }
    fg2 = {
        name
        for name, smarts in FUNCTIONAL_GROUPS.items()
        if pred_mol.GetSubstructMatches(C.MolFromSmarts(smarts))
    }
    all_g = fg1 | fg2
    scores["fg"] = len(fg1 & fg2) / len(all_g) if all_g else 1.0
    return scores


def _pair_scores_graph(true_mol: MolGraph, pred_mol: MolGraph):
    fp_t = FP.wl_fingerprint(true_mol)
    fp_p = FP.wl_fingerprint(pred_mol)
    fg1 = _graph_functional_groups(true_mol)
    fg2 = _graph_functional_groups(pred_mol)
    all_g = fg1 | fg2
    return {
        "inchikey_match": true_mol.wl_hash() == pred_mol.wl_hash(),
        "mces": _mces_exact(true_mol, pred_mol),
        "tanimoto": FP.tanimoto(fp_t, fp_p),
        # MACCS keys are RDKit-only; duplicating the WL tanimoto here would
        # mislabel the column — NaN, like fraggle
        "tanimoto_maccs": float("nan"),
        "cosine": FP.cosine(fp_t, fp_p),
        "fraggle": float("nan"),
        "fg": len(fg1 & fg2) / len(all_g) if all_g else 1.0,
    }


def _coerce_pair(true_mol, pred_mol):
    """Bring a mixed MolGraph/RDKit pair onto one representation.

    run_lib builds its targets as MolGraphs while stability returns RDKit
    RWMols when RDKit is installed; comparing across the two types would
    silently score 0 (wl_hash on an RWMol raises, the caller's except
    swallows it). With RDKit present, MolGraph sides are lifted to RDKit
    (molgraph.to_rdkit); without it no RDKit mols can exist."""
    if not HAS_RDKIT:
        return true_mol, pred_mol
    from rdkit import Chem

    from .cal_geometry import _to_molgraph
    from .molgraph import to_rdkit

    def lift(mg):
        m = to_rdkit(mg)
        Chem.SanitizeMol(m)
        return m

    if isinstance(true_mol, MolGraph) and not isinstance(pred_mol, MolGraph):
        try:
            true_mol = lift(true_mol)
        except Exception:  # unsanitizable target: demote the RDKit side
            pred_mol = _to_molgraph(pred_mol)
    elif isinstance(pred_mol, MolGraph) and not isinstance(true_mol, MolGraph):
        try:
            pred_mol = lift(pred_mol)
        except Exception:
            true_mol = _to_molgraph(true_mol)
    return true_mol, pred_mol


def _exact_match(true_mol, pred_mol, _cache=None):
    """Graph-identity exact match: InChIKey equality under RDKit (ref
    compute_metrics.py:222-233), WL-hash equality otherwise. Mixed
    MolGraph/RDKit pairs follow _coerce_pair's semantics: lift the MolGraph
    side, demote the RDKit side when the lift fails.

    ``_cache``: optional dict shared across calls — the Top-K sweep scores
    the SAME target against K candidates, and without the memo each call
    re-ran to_rdkit+SanitizeMol+MolToInchiKey on the target (r2 review)."""
    if true_mol is None or pred_mol is None:
        return False
    if not HAS_RDKIT:
        try:
            return true_mol.wl_hash() == pred_mol.wl_hash()
        except Exception:
            return False

    cache = _cache if _cache is not None else {}

    def memo(kind, mol, fn):
        key = (kind, id(mol))
        if key not in cache:
            try:
                cache[key] = fn(mol)
            except Exception:
                cache[key] = None
        return cache[key]

    from rdkit import Chem

    from .cal_geometry import _to_molgraph
    from .molgraph import to_rdkit

    def lift(mg):
        m = to_rdkit(mg)
        Chem.SanitizeMol(m)
        return m

    def inchi(m):
        Chem.SanitizeMol(m)
        return Chem.MolToInchiKey(m)

    def wl(m):
        return m.wl_hash()

    t_graph = isinstance(true_mol, MolGraph)
    p_graph = isinstance(pred_mol, MolGraph)
    if t_graph and p_graph:
        th, ph = memo("wl", true_mol, wl), memo("wl", pred_mol, wl)
        return th is not None and th == ph
    if t_graph != p_graph:
        graph_side, rdkit_side = (
            (true_mol, pred_mol) if t_graph else (pred_mol, true_mol)
        )
        lifted = memo("lift", graph_side, lift)
        if lifted is None:  # unsanitizable graph: demote the RDKit side
            demoted = memo("demote", rdkit_side, _to_molgraph)
            if demoted is None:
                return False
            gh = memo("wl", graph_side, wl)
            dh = memo("wl", demoted, wl)
            return gh is not None and gh == dh
        ti = memo("inchi", lifted, inchi)
        pi = memo("inchi", rdkit_side, inchi)
        return ti is not None and ti == pi
    ti = memo("inchi", true_mol, inchi)
    pi = memo("inchi", pred_mol, inchi)
    return ti is not None and ti == pi


def canonical_id(mol, _cache=None):
    """Canonical structure identity string for consensus grouping: the same
    keys `_exact_match` compares — InChIKey under RDKit (lifting MolGraphs,
    demoting unsanitizable RDKit mols to WL hashes), WL hash otherwise.
    Returns None when no identity can be computed. ``_cache`` shares the
    per-mol memo with `_exact_match` (same ("wl"/"lift"/"inchi", id(mol))
    keys), so consensus grouping adds no re-sanitization cost to a Top-K
    sweep that already scored the molecule."""
    if mol is None:
        return None
    cache = _cache if _cache is not None else {}

    def memo(kind, m, fn):
        key = (kind, id(m))
        if key not in cache:
            try:
                cache[key] = fn(m)
            except Exception:
                cache[key] = None
        return cache[key]

    def wl(m):
        return m.wl_hash()

    if not HAS_RDKIT:
        h = memo("wl", mol, wl)
        return None if h is None else "wl:" + h
    from rdkit import Chem

    from .cal_geometry import _to_molgraph
    from .molgraph import to_rdkit

    def lift(mg):
        m = to_rdkit(mg)
        Chem.SanitizeMol(m)
        return m

    def inchi(m):
        Chem.SanitizeMol(m)
        return Chem.MolToInchiKey(m)

    if isinstance(mol, MolGraph):
        lifted = memo("lift", mol, lift)
        if lifted is not None:
            key = memo("inchi", lifted, inchi)
            if key is not None:
                return "ik:" + key
        h = memo("wl", mol, wl)
        return None if h is None else "wl:" + h
    key = memo("inchi", mol, inchi)
    if key is not None:
        return "ik:" + key
    demoted = memo("demote", mol, _to_molgraph)
    if demoted is None:
        return None
    h = memo("wl", demoted, wl)
    return None if h is None else "wl:" + h


def consensus_rank(candidates, _cache=None):
    """Rank candidate molecules by sampling frequency (majority vote over
    repeated conditional draws — test-time compute the reference's
    single-draw Top-1 protocol leaves on the table). Returns
    ``[(canonical_id, count, first_index), ...]`` sorted by descending
    count, ties broken by first appearance; candidates with no computable
    identity are skipped."""
    counts: dict = {}
    for i, m in enumerate(candidates):
        cid = canonical_id(m, _cache=_cache)
        if cid is None:
            continue
        if cid in counts:
            counts[cid][0] += 1
        else:
            counts[cid] = [1, i]
    return sorted(
        ((cid, c, first) for cid, (c, first) in counts.items()),
        key=lambda t: (-t[1], t[2]),
    )


def top_k_exact_match(true_mols, pred_lists):
    """Top-K structure-recovery accuracy: fraction of targets where ANY of
    the K candidates exact-matches (the reference's 40.76%/99.49% Top-1 /
    Top-10 headline, README.md:15 — its repo only scores Top-1 per pair,
    compute_metrics.py:205-233; the multi-candidate sweep lives here)."""
    hits, n = 0, 0
    cache: dict = {}  # memoizes per-target lift/sanitize/InChIKey across K
    for t, preds in zip(true_mols, pred_lists):
        if t is None:
            continue
        n += 1
        if any(_exact_match(t, p, _cache=cache) for p in preds):
            hits += 1
    return hits / max(n, 1)


def evaluate_jsonl_predictions(input_data, output_csv: str):
    """Evaluate prediction pairs (ref compute_metrics.py:147-319).

    ``input_data``: a JSONL path of {'predict','label'} SMILES rows (RDKit
    mode only) or a (true_mols, pred_mols) tuple where pred_mols entries may
    be single molecules or lists (top-k; only [0] is scored, ref :205-207).
    """
    import pandas as pd

    if isinstance(input_data, str):
        if not HAS_RDKIT:
            raise RuntimeError("JSONL SMILES mode requires RDKit")
        pairs = []
        with open(input_data) as f:
            for line in f:
                d = json.loads(line)
                pairs.append(
                    (
                        d["predict"].replace("##SMILES: ", ""),
                        d["label"].replace("##SMILES: ", ""),
                    )
                )
        true_mols, pred_mols = [], []
        for pred_smiles, true_smiles in pairs:
            t = canonical_mol_from_smiles(true_smiles)
            p = canonical_mol_from_smiles(pred_smiles)
            if t is not None and p is not None:
                true_mols.append(t)
                pred_mols.append(p)
    else:
        true_mols, pred_mols = input_data

    if not true_mols:
        logging.error("No valid mol objects available for evaluation!")
        return None

    solver = None
    if HAS_MCES:
        import pulp

        solver = pulp.listSolvers(onlyAvailable=True)[0]

    rows = {k: [] for k in ("inchikey_match", "mces", "tanimoto",
                             "tanimoto_maccs", "cosine", "fraggle", "fg")}
    from . import mces as _mces_mod

    mces_exhausted_before = _mces_mod.EXHAUSTED_PAIRS
    for true_mol, pred_entry in zip(true_mols, pred_mols):
        pred_mol = pred_entry[0] if isinstance(pred_entry, list) else pred_entry
        true_mol, pred_mol = _coerce_pair(true_mol, pred_mol)
        if isinstance(true_mol, MolGraph) or not HAS_RDKIT:
            scores = _pair_scores_graph(true_mol, pred_mol)
        else:
            scores = _pair_scores_rdkit(true_mol, pred_mol, solver)
        for k, v in scores.items():
            rows[k].append(v)

    exhausted = _mces_mod.EXHAUSTED_PAIRS - mces_exhausted_before
    if exhausted:
        logging.warning(
            "MCES: %d/%d pairs hit the B&B budget — their distances are "
            "incumbent upper bounds, the reported mean is an upper bound",
            exhausted, len(true_mols),
        )

    n = len(true_mols)
    matches = [b for b in rows["inchikey_match"] if b is not None]

    def _nanmean(xs):
        # all-NaN columns are expected in MolGraph mode (MACCS/Fraggle are
        # RDKit-only by design, see _pair_scores_graph) — report nan without
        # numpy's RuntimeWarning noise
        arr = np.asarray(xs, dtype=np.float64)
        return arr[~np.isnan(arr)].mean() if (~np.isnan(arr)).any() else float("nan")

    values = [
        f"{sum(matches) / n:.4f}",
        f"{_nanmean(rows['mces']):.4f}",
        f"{_nanmean(rows['tanimoto']):.4f}",
        f"{_nanmean(rows['cosine']):.4f}",
        f"{_nanmean(rows['tanimoto_maccs']):.4f}",
        f"{_nanmean(rows['fraggle']):.4f}",
        f"{_nanmean(rows['fg']):.4f}",
    ]
    df = pd.DataFrame({"Evaluation Metric": METRIC_NAMES, "Value": values})
    df.to_csv(output_csv, index=False, encoding="utf-8-sig")

    detailed = {
        "Top-1 Accuracy": rows["inchikey_match"],
        "MCES": rows["mces"],
        "Tanimoto Similarity (Morgan)": rows["tanimoto"],
        "Cosine Similarity (Morgan)": rows["cosine"],
        "Tanimoto Similarity (MACCS)": rows["tanimoto_maccs"],
        "Fraggle Similarity": rows["fraggle"],
        "Functional Group Similarity": rows["fg"],
    }
    pd.DataFrame(detailed).to_csv(
        output_csv.replace(".csv", "_detailed_scores.csv"),
        index=False,
        encoding="utf-8-sig",
    )
    with open(output_csv.replace(".csv", "_detailed_scores.json"), "w") as f:
        json.dump(
            {k: [bool(x) if isinstance(x, (bool, np.bool_)) else x for x in v]
             for k, v in detailed.items()},
            f,
            indent=2,
        )
    return df


def compute_similarity_metrics(pred_mols, true_mols, eval_dir, ckpt, version_name):
    """Pairwise similarity wrapper (ref run_lib.py:59-169): filters invalid
    pairs, runs evaluate_jsonl_predictions, logs headline values."""
    try:
        valid_true, valid_pred = [], []
        skipped = 0
        for t, p in zip(true_mols, pred_mols):
            if t is None or p is None:
                skipped += 1
                continue
            if isinstance(p, MolGraph) and (p.n_atoms == 0 or not p.valence_ok()):
                skipped += 1
                continue
            valid_true.append(t)
            valid_pred.append([p])
        logging.info(
            "%s molecule pair statistics - Input: %d, Valid: %d, Skipped: %d",
            version_name, min(len(pred_mols), len(true_mols)), len(valid_true),
            skipped,
        )
        if not valid_true:
            logging.warning(
                "No valid %s molecule pairs found for similarity computation",
                version_name,
            )
            return False
        csv_path = os.path.join(
            eval_dir, f"similarity_metrics_{version_name.lower()}_ckpt_{ckpt}.csv"
        )
        df = evaluate_jsonl_predictions((valid_true, valid_pred), csv_path)
        if df is not None:
            for _, row in df.iterrows():
                logging.info(
                    "%s %s: %s", version_name, row["Evaluation Metric"], row["Value"]
                )
        return True
    except Exception as e:  # pragma: no cover
        logging.error("Error computing %s similarity metrics: %s", version_name, e)
        return False
