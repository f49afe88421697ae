"""Continuity diagnostic for the fidelity-4 spectra (VERDICT r3 next-1).

The information-ceiling claim rested on fidelity-2's peaks being HASH
functions of local environments: a one-atom edit anywhere inside an atom's
WL-2 neighborhood teleports its peaks to unrelated positions, so unseen
environments carry no generalizable signal. Fidelity-4 keys peaks on
continuous descriptors instead. This tool MEASURES the difference: for
random single-atom element substitutions, the IR peak-position shift of
every other atom as a function of its graph distance from the edit, under
both keyings.

Expected: f2 shifts are ~uniform over the spectrum (hash teleport) at
distance <= 2 and zero beyond; f4 shifts are small (a few peak widths),
decay with distance, and are zero beyond 2 hops — the Lipschitz property
real DFT spectra have and the model needs for unseen-environment
generalization.

Usage: python tools/f4_continuity.py [n_molecules=300]
"""

import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffspectra_tpu.data.info import get_dataset_info
from diffspectra_tpu.data.synthetic import (
    _f4_peak_fracs,
    _random_tree_molecule,
    _sample_n_atoms,
    _structure_spectrum,
    _wl_environments,
)

IR_LEN = 3501
PEAK_W_BINS = 0.004 * IR_LEN  # fidelity-4 peak width in IR bins


def _graph_distances(edge, n):
    """All-pairs hop distance via BFS (small n)."""
    import collections

    adj = [np.nonzero(edge[i, :n])[0] for i in range(n)]
    dist = np.full((n, n), 99, dtype=np.int64)
    for s in range(n):
        dist[s, s] = 0
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if dist[s, v] > dist[s, u] + 1:
                    dist[s, v] = dist[s, u] + 1
                    dq.append(v)
    return dist


def _wl_peak_bins(types, edge, n, atom):
    """Fidelity-2 IR peak positions (WL-1, WL-2) of one atom, in bins."""
    wl1, wl2 = _wl_environments(types, edge, n)
    out = []
    for level, labels in ((1, wl1), (2, wl2)):
        P = 1009 if level == 1 else 2003
        frac = 0.03 + 0.94 * (((labels[atom] + 1 * 7919) % P) / P)
        out.append(frac * (IR_LEN - 1))
    return np.asarray(out)


def main():
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    rng = np.random.default_rng(5)
    info = get_dataset_info("qm9_second_half")
    n_atoms = np.minimum(_sample_n_atoms(rng, info, n_mols), 29)

    shifts_f4 = defaultdict(list)  # hop distance -> peak shifts (bins)
    shifts_f2 = defaultdict(list)
    for m in range(n_mols):
        t, p, e, n = _random_tree_molecule(rng, int(n_atoms[m]), 29)
        heavy = [i for i in range(n) if t[i] != 0]
        # substitute one heavy atom with a valence-compatible element:
        # C(4)->N(3) style swaps need spare valence; swap only where the
        # atom's used valence fits the new element
        used = e[:n, :n].sum(1)
        cands = []
        for i in heavy:
            for new in (1, 2, 3, 4):
                if new != t[i] and used[i] <= [1, 4, 3, 2, 1][new]:
                    cands.append((i, new))
        if not cands:
            continue
        i, new = cands[int(rng.integers(len(cands)))]
        t2 = t.copy()
        t2[i] = new

        dist = _graph_distances(e, n)
        a1, b1, _ = _f4_peak_fracs(t, e, n, channel=1)
        a2, b2, _ = _f4_peak_fracs(t2, e, n, channel=1)
        for j in range(n):
            d = int(dist[i, j])
            if d > 4:
                continue
            shift = np.abs(a1[j] - a2[j]).max() * (IR_LEN - 1)
            shifts_f4[d].append(shift)
            w1 = _wl_peak_bins(t, e, n, j)
            w2 = _wl_peak_bins(t2, e, n, j)
            shifts_f2[d].append(np.abs(w1 - w2).max())

    print(f"IR peak width ~{PEAK_W_BINS:.0f} bins; shifts in bins "
          f"(median / p90) by hop distance from a single-atom edit:")
    print(f"{'hops':>4} {'f4 med':>8} {'f4 p90':>8} {'f2 med':>8} "
          f"{'f2 p90':>8} {'n':>6}")
    for d in sorted(shifts_f4):
        s4 = np.asarray(shifts_f4[d])
        s2 = np.asarray(shifts_f2[d])
        print(
            f"{d:>4} {np.median(s4):>8.1f} {np.percentile(s4, 90):>8.1f} "
            f"{np.median(s2):>8.1f} {np.percentile(s2, 90):>8.1f} "
            f"{len(s4):>6}"
        )


if __name__ == "__main__":
    main()
