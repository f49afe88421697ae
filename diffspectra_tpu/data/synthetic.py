"""Synthetic QM9S-like dataset for tests and benchmarks.

The real QM9S download (gdb9.sdf + computed IR/Raman/UV-Vis spectra,
ref datasets/qm9s_dataset.py:60-361) is several GB and unavailable in a
zero-egress environment; this generator produces molecules with the same
schema and broadly realistic statistics (atom-count histogram, bond-length
scale, valence-plausible graphs, smooth positive spectra) so that every
pipeline stage — transform, collate, training, sampling, evaluation — runs
end-to-end. Swap in the real ingest (data/qm9s.py) when the download exists.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .info import get_dataset_info

SPEC_LENS = {"uv": 701, "ir": 3501, "raman": 3501}

# covalent-ish single-bond lengths in Angstrom for H,C,N,O,F (symmetric)
_BOND_LEN = np.array(
    [
        [0.74, 1.09, 1.01, 0.96, 0.92],
        [1.09, 1.54, 1.47, 1.43, 1.35],
        [1.01, 1.47, 1.45, 1.40, 1.36],
        [0.96, 1.43, 1.40, 1.48, 1.42],
        [0.92, 1.35, 1.36, 1.42, 1.42],
    ]
)


def _sample_n_atoms(rng, info, size):
    hist = info["train_n_nodes"]
    ns = np.array(sorted(hist))
    probs = np.array([hist[n] for n in ns], dtype=np.float64)
    probs /= probs.sum()
    return rng.choice(ns, size=size, p=probs)


_VALENCE = np.array([1, 4, 3, 2, 1])  # H, C, N, O, F


def _random_tree_molecule(rng, n, max_n):
    """Build a random VALENCE-CORRECT molecule with plausible geometry.

    A heavy-atom tree is grown respecting remaining valences, bond orders are
    upgraded only where both endpoints have spare valence, and hydrogens fill
    every remaining slot — so the ground-truth set passes the same stability
    checks real QM9 molecules do (evaluation/bond_analyze.py valence rules)
    and validity/novelty/similarity metrics are meaningful on synthetic data.
    May return fewer than ``n`` atoms (valences bound the H count)."""
    n_heavy = max(1, int(round(n * rng.uniform(0.35, 0.5))))
    heavy_types = rng.choice([1, 2, 3, 4], size=n_heavy, p=[0.72, 0.12, 0.14, 0.02])
    free = _VALENCE[heavy_types].astype(np.int64)

    bonds = {}  # (i, j) -> order over heavy atoms
    order_in_tree = [0]
    for i in range(1, n_heavy):
        candidates = [j for j in order_in_tree if free[j] >= 1]
        if not candidates or free[i] < 1:
            # cannot attach more heavy atoms; stop growing
            n_heavy = i
            heavy_types = heavy_types[:n_heavy]
            free = free[:n_heavy]
            break
        p = int(rng.choice(candidates))
        bonds[(p, i)] = 1
        free[p] -= 1
        free[i] -= 1
        order_in_tree.append(i)

    # bond-order upgrades where both endpoints have spare valence
    for (a, b) in list(bonds):
        if rng.random() < 0.2:
            extra = int(rng.choice([1, 2], p=[0.85, 0.15]))
            extra = min(extra, free[a], free[b])
            if extra > 0:
                bonds[(a, b)] += extra
                free[a] -= extra
                free[b] -= extra

    # hydrogens MUST fill every remaining valence (validity); if the total
    # exceeds max_n, drop trailing heavy atoms (and their bonds) first
    def required_h(nh):
        return int(free[:nh].sum())

    while n_heavy > 1 and n_heavy + required_h(n_heavy) > max_n:
        # remove the last heavy atom: restore valence consumed by its bonds
        i = n_heavy - 1
        for (a, b) in [k for k in bonds if i in k]:
            o = bonds.pop((a, b))
            other = a if b == i else b
            free[other] += o
        n_heavy -= 1
        heavy_types = heavy_types[:n_heavy]
        free = free[:n_heavy]
    h_hosts = []
    for i in range(n_heavy):
        h_hosts += [i] * int(free[i])
    rng.shuffle(h_hosts)
    n_total = n_heavy + len(h_hosts)

    types = np.zeros(n_total, dtype=np.int64)
    types[:n_heavy] = heavy_types
    edge = np.zeros((max_n, max_n), dtype=np.int64)
    for (a, b), o in bonds.items():
        edge[a, b] = edge[b, a] = o
    for k, host in enumerate(h_hosts):
        i = n_heavy + k
        edge[i, host] = edge[host, i] = 1

    # geometry: place each atom near its (first) bonded parent
    pos = np.zeros((n_total, 3), dtype=np.float64)
    placed = {0}
    parent = np.full(n_total, -1, dtype=np.int64)
    for (a, b) in bonds:
        parent[b] = a if parent[b] < 0 else parent[b]
        parent[a] = parent[a]
    for k, host in enumerate(h_hosts):
        parent[n_heavy + k] = host
    # rejection-sample directions so non-bonded atoms keep their distance
    # (the 3D stability metric infers bonds from distances,
    # evaluation/bond_analyze.py:108-133 — clashes create spurious bonds)
    for i in range(1, n_total):
        p = parent[i] if parent[i] >= 0 else 0
        blen = _BOND_LEN[types[p], types[i]] * rng.uniform(0.97, 1.03)
        best, best_min = None, -1.0
        for _ in range(24):
            d = rng.normal(size=3)
            d /= np.linalg.norm(d) + 1e-9
            cand = pos[p] + d * blen
            others = np.delete(np.arange(i), p)
            min_dist = (
                np.min(np.linalg.norm(pos[others] - cand, axis=1))
                if len(others)
                else np.inf
            )
            if min_dist > best_min:
                best, best_min = cand, min_dist
            if min_dist > 1.8:
                break
        pos[i] = best
    pos -= pos.mean(0, keepdims=True)

    out_pos = np.zeros((max_n, 3), dtype=np.float32)
    out_pos[:n_total] = pos
    out_types = np.zeros(max_n, dtype=np.int64)
    out_types[:n_total] = types
    return out_types, out_pos, edge, n_total


def _wl_environments(atom_types, edge_type, n_atoms):
    """Per-atom WL-1 and WL-2 local-environment labels (stable hashes).

    WL-1: (own type, sorted multiset of (neighbor type, bond order)).
    WL-2: (own WL-1 label, sorted multiset of neighbor WL-1 labels).
    Real vibrational modes are functions of the local bonding environment;
    these labels are the graph-theoretic analogue, and their multiset is
    near-injective over isomorphism classes of QM9-sized molecules (see
    tools/ceiling_analysis.py)."""
    import hashlib

    def h64(obj) -> int:
        return int.from_bytes(
            hashlib.md5(repr(obj).encode()).digest()[:8], "little"
        )

    nbrs = [
        [(int(atom_types[j]), int(edge_type[i, j]))
         for j in np.nonzero(edge_type[i, :n_atoms])[0]]
        for i in range(n_atoms)
    ]
    wl1 = [h64((int(atom_types[i]), tuple(sorted(nbrs[i]))))
           for i in range(n_atoms)]
    wl2 = [
        h64((wl1[i], tuple(sorted(
            wl1[j] for j in np.nonzero(edge_type[i, :n_atoms])[0]
        ))))
        for i in range(n_atoms)
    ]
    return wl1, wl2


def _structure_spectrum(
    rng, length, atom_types, edge_type, n_atoms, channel, fidelity=1,
    wl_envs=None,
):
    """Deterministic structure -> spectrum mapping (+ small noise).

    Each (atom_a, atom_b, bond_order) pattern contributes a Gaussian peak at
    a fixed pattern-specific frequency with amplitude proportional to its
    count, plus element-count baseline peaks — so the conditional model can
    actually recover structure from the spectrum (real QM9S spectra are DFT
    functions of the structure; random spectra would make conditioning
    uninformative).

    ``fidelity=2`` adds peaks keyed on per-atom WL-1/WL-2 local-environment
    labels. The bond-pattern-count fingerprint of fidelity=1 identifies only
    ~17% of molecules uniquely (Top-1 identifiability ceiling measured by
    tools/ceiling_analysis.py) — isomers with equal bond multisets share a
    spectrum. WL-2 environment multisets are near-injective over QM9-sized
    isomorphism classes, lifting the ceiling to ~1.0, which is the regime
    real DFT spectra live in (distinct isomers have distinct IR spectra)."""
    x = np.arange(length, dtype=np.float64)
    y = np.zeros(length)

    def peak(center_frac, width_frac, amp):
        c = center_frac * (length - 1)
        w = max(width_frac * length, 2.0)
        return amp * np.exp(-0.5 * ((x - c) / w) ** 2)

    # bond-pattern peaks: fixed frequency per (min(a,b), max(a,b), order, ch)
    iu, ju = np.nonzero(np.triu(edge_type[:n_atoms, :n_atoms], 1))
    from collections import Counter

    counts = Counter()
    for i, j in zip(iu, ju):
        a, b = sorted((int(atom_types[i]), int(atom_types[j])))
        counts[(a, b, int(edge_type[i, j]))] += 1
    for (a, b, o), cnt in counts.items():
        h = (a * 131 + b * 31 + o * 7 + channel * 61) % 97
        y += peak(0.05 + 0.9 * h / 97.0, 0.01, 8.0 * cnt)
    # element-count baseline peaks
    for elem in range(5):
        n_e = int(np.sum(atom_types[:n_atoms] == elem))
        if n_e:
            h = (elem * 17 + channel * 29) % 23
            y += peak(0.1 + 0.8 * h / 23.0, 0.03, 3.0 * n_e)
    if fidelity >= 2:
        # local-environment peaks: one narrow Gaussian per distinct WL
        # label, amplitude ~ its atom count. Two levels at two different
        # hash moduli; P chosen prime and large enough that the ~25-atom
        # label sets rarely collide within one spectrum.
        from collections import Counter

        # wl_envs: channel-independent, so generate() computes them once
        # per molecule rather than once per spectral channel
        wl1, wl2 = wl_envs or _wl_environments(atom_types, edge_type, n_atoms)
        for level, labels, amp in ((1, wl1, 6.0), (2, wl2, 4.0)):
            P = 1009 if level == 1 else 2003
            for lab, cnt in Counter(labels).items():
                frac = ((lab + channel * 7919) % P) / P
                y += peak(0.03 + 0.94 * frac, 0.004, amp * cnt)
    # small stochastic background so spectra aren't exactly degenerate
    y += np.abs(rng.normal(0, 0.1, size=length))
    return y.astype(np.float32)


def generate(
    seed: int,
    size: int,
    max_n: int,
    info_name: str = "qm9_second_half",
    fidelity: int = 1,
    cache_dir: str = "",
) -> Dict[str, np.ndarray]:
    """Generate a raw synthetic dataset with the QM9S schema:
    atom_type [M, N], pos [M, N, 3], edge_type [M, N, N] (bond orders),
    num_atom [M], fc [M, N], uv/ir/raman [M, L].

    ``cache_dir`` (optional): persist the generated arrays to
    ``synth_<seed>_<size>_<max_n>_<info>_f<fidelity>.npz`` there and reuse on
    the next call — generation is host Python at ~5ms/molecule, and training
    relaunches (watchdog restarts) must not pay it repeatedly."""
    cache_path = None
    if cache_dir:
        import os

        cache_path = os.path.join(
            cache_dir,
            f"synth_{seed}_{size}_{max_n}_{info_name}_f{fidelity}.npz",
        )
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                return {k: z[k] for k in z.files}
    rng = np.random.default_rng(seed)
    info = get_dataset_info(info_name)
    n_atoms = np.minimum(_sample_n_atoms(rng, info, size), max_n)

    atom_type = np.zeros((size, max_n), dtype=np.int64)
    pos = np.zeros((size, max_n, 3), dtype=np.float32)
    edge_type = np.zeros((size, max_n, max_n), dtype=np.int64)
    fc = np.zeros((size, max_n), dtype=np.int64)
    for m in range(size):
        t, p, e, n_total = _random_tree_molecule(rng, int(n_atoms[m]), max_n)
        atom_type[m, : len(t)] = t
        pos[m, : len(p)] = p
        edge_type[m] = e
        n_atoms[m] = n_total
        # formal charges stay zero: the generator builds neutral
        # valence-saturated molecules (charged species would need different
        # bond counts per allowed_fc_bonds)

    wl_cache = (
        [
            _wl_environments(atom_type[m], edge_type[m], int(n_atoms[m]))
            for m in range(size)
        ]
        if fidelity >= 2
        else [None] * size
    )
    spectra = {
        k: np.stack(
            [
                _structure_spectrum(
                    rng, L, atom_type[m], edge_type[m], int(n_atoms[m]), ch,
                    fidelity=fidelity, wl_envs=wl_cache[m],
                )
                for m in range(size)
            ]
        )
        for ch, (k, L) in enumerate(SPEC_LENS.items())
    }
    out = dict(
        atom_type=atom_type,
        pos=pos,
        edge_type=edge_type,
        fc=fc,
        num_atom=n_atoms.astype(np.int64),
        **spectra,
    )
    if cache_path:
        import os

        os.makedirs(cache_dir, exist_ok=True)
        # per-writer tmp name: concurrent generators (training child +
        # periodic warm export on first launch) must not interleave writes
        # into one tmp file; each os.replace promotes a complete archive
        tmp = f"{cache_path}.tmp{os.getpid()}.npz"
        np.savez(tmp, **out)
        os.replace(tmp, cache_path)
    return out
