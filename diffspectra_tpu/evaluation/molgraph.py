"""Lightweight host-side molecular graph + canonical hashing.

RDKit is an optional dependency of the evaluation stack (it is a C++ host
library, ref §2.11); when absent, this module provides the structural
operations the metrics need: validity-style sanitisation via valence rules,
connectivity, and a Weisfeiler-Lehman canonical hash standing in for
canonical SMILES in uniqueness / novelty / exact-match computations.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from .bond_analyze import allowed_fc_bonds

BOND_ORDER_VALUE = {1: 1.0, 2: 2.0, 3: 3.0, 4: 1.5}  # 4 = aromatic


@dataclass
class MolGraph:
    """A decoded molecule: atoms + dense bond-order matrix (+ positions)."""

    atom_syms: List[str]
    formal_charges: np.ndarray  # [n] int
    bond_orders: np.ndarray  # [n, n] int in {0,1,2,3,4}
    positions: Optional[np.ndarray] = None  # [n, 3]

    @property
    def n_atoms(self) -> int:
        return len(self.atom_syms)

    def n_fragments(self) -> int:
        """Connected components over nonzero bonds."""
        n = self.n_atoms
        if n == 0:
            return 0
        adj = self.bond_orders > 0
        seen = np.zeros(n, dtype=bool)
        comps = 0
        for s in range(n):
            if seen[s]:
                continue
            comps += 1
            stack = [s]
            seen[s] = True
            while stack:
                u = stack.pop()
                for v in np.nonzero(adj[u])[0]:
                    if not seen[v]:
                        seen[v] = True
                        stack.append(int(v))
        return comps

    def largest_fragment(self) -> "MolGraph":
        n = self.n_atoms
        adj = self.bond_orders > 0
        seen = np.zeros(n, dtype=bool)
        best: List[int] = []
        for s in range(n):
            if seen[s]:
                continue
            comp = [s]
            seen[s] = True
            stack = [s]
            while stack:
                u = stack.pop()
                for v in np.nonzero(adj[u])[0]:
                    if not seen[v]:
                        seen[v] = True
                        comp.append(int(v))
                        stack.append(int(v))
            if len(comp) > len(best):
                best = comp
        idx = np.asarray(sorted(best))
        return MolGraph(
            [self.atom_syms[i] for i in idx],
            self.formal_charges[idx],
            self.bond_orders[np.ix_(idx, idx)],
            None if self.positions is None else self.positions[idx],
        )

    def valence_ok(self) -> bool:
        """Formal-charge-aware valence check (ref stability.py:146-158)."""
        orders = np.vectorize(lambda o: BOND_ORDER_VALUE.get(int(o), 0.0))(
            self.bond_orders
        ) if self.n_atoms else self.bond_orders
        val = orders.sum(axis=1) if self.n_atoms else np.zeros(0)
        for sym, fc, v in zip(self.atom_syms, self.formal_charges, val):
            allowed = allowed_fc_bonds.get(sym)
            if allowed is None:
                return False
            if isinstance(allowed, dict):
                exp = allowed.get(int(fc), allowed.get(0))
            else:
                exp = allowed
            if isinstance(exp, int):
                if v != exp:
                    return False
            else:
                if v not in exp:
                    return False
        return True

    def wl_hash(self, iters: int = 4) -> str:
        """Weisfeiler-Lehman canonical hash over (symbol, fc, bond orders).

        Memoized per instance (graphs are immutable once decoded): the
        Top-K sweep and the generalization split re-hash the same target
        up to 2K+1 times per eval, and the train-split hash set covers
        tens of thousands of graphs (r2 review).
        """
        memo = getattr(self, "_wl_memo", None)
        if memo is None:
            memo = {}
            self._wl_memo = memo
        if iters in memo:
            return memo[iters]
        n = self.n_atoms
        colors = [
            f"{s}|{int(c)}" for s, c in zip(self.atom_syms, self.formal_charges)
        ]
        for _ in range(iters):
            new_colors = []
            for i in range(n):
                nbrs = sorted(
                    f"{int(self.bond_orders[i, j])}:{colors[j]}"
                    for j in np.nonzero(self.bond_orders[i])[0]
                )
                sig = colors[i] + "|" + ",".join(nbrs)
                new_colors.append(hashlib.md5(sig.encode()).hexdigest()[:16])
            colors = new_colors
        memo[iters] = hashlib.md5(",".join(sorted(colors)).encode()).hexdigest()
        return memo[iters]


def to_rdkit(mg: MolGraph):
    """Convert to an RDKit RWMol (with conformer when positions are set).

    Raises ImportError when RDKit is absent — callers gate on availability.
    Same construction as stability._build_rdkit_mol so MolGraph-backed
    reference sets interoperate with RDKit-backed generated molecules
    (Top-K exact match, moses SMILES paths)."""
    from rdkit import Chem
    from rdkit.Geometry import Point3D

    bond_list = [
        None,
        Chem.rdchem.BondType.SINGLE,
        Chem.rdchem.BondType.DOUBLE,
        Chem.rdchem.BondType.TRIPLE,
        Chem.rdchem.BondType.AROMATIC,
    ]
    mol = Chem.RWMol()
    for sym in mg.atom_syms:
        mol.AddAtom(Chem.Atom(sym))
    for idx, fc in enumerate(mg.formal_charges):
        if int(fc) != 0:
            mol.GetAtomWithIdx(idx).SetFormalCharge(int(fc))
    if mg.positions is not None:
        conf = Chem.Conformer(mol.GetNumAtoms())
        for i in range(mol.GetNumAtoms()):
            conf.SetAtomPosition(
                i,
                Point3D(
                    float(mg.positions[i][0]),
                    float(mg.positions[i][1]),
                    float(mg.positions[i][2]),
                ),
            )
        mol.AddConformer(conf)
    n = mg.n_atoms
    for i in range(n):
        for j in range(i + 1, n):
            order = int(mg.bond_orders[i, j])
            if order > 0:
                mol.AddBond(i, j, bond_list[order])
    return mol


def from_decoded(mol_tuple, atom_decoder: Sequence[str]) -> MolGraph:
    """Build from a decoded sampler tuple (pos, atom_type, edge_type, fc)."""
    pos, atom_type, edge_type, fc = (
        mol_tuple if len(mol_tuple) == 4 else (*mol_tuple, None, None)
    )
    syms = [atom_decoder[int(a)] for a in np.asarray(atom_type)]
    fc_arr = (
        np.asarray(fc, dtype=np.int64)
        if fc is not None and np.asarray(fc).size
        else np.zeros(len(syms), dtype=np.int64)
    )
    eo = (
        np.asarray(edge_type, dtype=np.int64)
        if edge_type is not None
        else np.zeros((len(syms), len(syms)), dtype=np.int64)
    )
    p = np.asarray(pos, dtype=np.float64) if pos is not None else None
    return MolGraph(syms, fc_arr, eo, p)
