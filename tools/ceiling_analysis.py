"""Identifiability ceiling of the synthetic spectra (analysis tool).

The synthetic spectrum (data/synthetic.py::_structure_spectrum) is a
deterministic function of ONLY (a) the multiset of (atom_a, atom_b, order)
bond patterns and (b) per-element atom counts — so all molecules sharing
that fingerprint produce the same spectrum (modulo a small non-informative
noise floor). A conditional model therefore cannot do better at exact
structure recovery than guessing the most likely member of the target's
fingerprint class:

    Top-1 ceiling  = E_target[ p(modal isomer | class(target)) ]
    Top-K ceiling  = E_target[ sum of top-K isomer probs | class ]

This script Monte-Carlo estimates those ceilings from the generator itself
(structure only, spectra skipped), at increasing sample sizes so the
singleton-class upward bias is visible, and reports the class-size
distribution. Results belong in RESULTS.md next to the budget-scaling
table: they say whether more training steps can still move Top-1 on this
dataset, or the dataset itself is the binding constraint.

Usage: python tools/ceiling_analysis.py [n_samples ...]
"""

import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffspectra_tpu.data.synthetic import (
    _random_tree_molecule,
    _sample_n_atoms,
    _wl_environments,
)
from diffspectra_tpu.data.info import get_dataset_info
from diffspectra_tpu.evaluation.molgraph import MolGraph

MAX_N = 29


def fingerprint_and_hash(types, pos, edge, n_total, fidelity=1, f4_bin=1):
    """(spectrum-equivalence class key, isomorphism-class key).

    ``fidelity>=4``: the key is what the IR channel alone resolves (the
    campaigns condition on IR): per-BAND multisets of quantized continuous
    peak positions — NOT per-atom (band0, band1) pairs, because the
    spectrum is a sum and the pairing is unobservable — plus the bond-peak
    (position, amplitude) multiset and element counts. ``f4_bin`` is the
    quantization in IR bins: 1 = optimistic (any sub-bin shift resolvable),
    8 ≈ half a peak width = conservative."""
    elem = tuple(int((types[:n_total] == e).sum()) for e in range(5))
    if fidelity >= 4:
        from diffspectra_tpu.data.synthetic import _f4_peak_fracs

        atom_fracs, bond_fracs, bond_amps = _f4_peak_fracs(
            types, edge, n_total, channel=1
        )
        L = 3501  # IR
        q = lambda fr: tuple(sorted(
            int(round(f * (L - 1))) // f4_bin for f in fr
        ))
        class_key = (
            q(atom_fracs[:, 0]),
            q(atom_fracs[:, 1]),
            tuple(sorted(zip(
                (int(round(f * (L - 1))) // f4_bin for f in bond_fracs),
                (float(a) for a in bond_amps),
            ))),
            elem,
        )
        syms = ["H", "C", "N", "O", "F"]
        g = MolGraph(
            [syms[int(t)] for t in types[:n_total]],
            np.zeros(n_total, dtype=np.int64),
            np.asarray(edge[:n_total, :n_total]),
        )
        return class_key, g.wl_hash()
    pats = Counter()
    iu, ju = np.nonzero(np.triu(edge[:n_total, :n_total], 1))
    for i, j in zip(iu, ju):
        a, b = sorted((int(types[i]), int(types[j])))
        pats[(a, b, int(edge[i, j]))] += 1
    class_key = (tuple(sorted(pats.items())), elem)
    if fidelity >= 2:
        wl1, wl2 = _wl_environments(types, edge, n_total)
        class_key = class_key + (
            tuple(sorted(Counter(wl1).items())),
            tuple(sorted(Counter(wl2).items())),
        )
    syms = ["H", "C", "N", "O", "F"]
    g = MolGraph(
        [syms[int(t)] for t in types[:n_total]],
        np.zeros(n_total, dtype=np.int64),
        np.asarray(edge[:n_total, :n_total]),
    )
    return class_key, g.wl_hash()


def estimate(n_samples, seed=123, fidelity=1, f4_bin=1):
    rng = np.random.default_rng(seed)
    info = get_dataset_info("qm9_second_half")
    n_atoms = np.minimum(_sample_n_atoms(rng, info, n_samples), MAX_N)
    classes = defaultdict(Counter)  # class_key -> Counter(wl_hash)
    for m in range(n_samples):
        t, p, e, n_total = _random_tree_molecule(rng, int(n_atoms[m]), MAX_N)
        ck, h = fingerprint_and_hash(
            t, p, e, n_total, fidelity=fidelity, f4_bin=f4_bin
        )
        classes[ck][h] += 1

    total = n_samples
    top1 = top10 = 0.0
    sizes = []
    singleton_structs = 0
    for ck, ctr in classes.items():
        freqs = sorted(ctr.values(), reverse=True)
        size = sum(freqs)
        sizes.append(size)
        # every member of the class is a potential target; the optimal
        # decoder answers the modal isomer -> correct with p=f_modal/size,
        # weighted by the class's target probability size/total
        top1 += freqs[0] / total
        top10 += sum(freqs[:10]) / total
        singleton_structs += sum(1 for f in freqs if f == 1)

    sizes = np.asarray(sizes)
    return dict(
        n=n_samples,
        n_classes=len(classes),
        top1_ceiling=top1,
        top10_ceiling=top10,
        singleton_class_frac=float((sizes == 1).mean()),
        mean_class_size=float(sizes.mean()),
        singleton_struct_frac=singleton_structs / total,
    )


if __name__ == "__main__":
    fidelity = int(os.environ.get("CEILING_FIDELITY", "1"))
    f4_bin = int(os.environ.get("CEILING_F4_BIN", "1"))
    ns = [int(a) for a in sys.argv[1:]] or [32768, 131072, 524288]
    print(f"fidelity={fidelity} f4_bin={f4_bin}")
    print(
        f"{'N':>8} {'classes':>8} {'Top-1 ceil':>10} {'Top-10 ceil':>11} "
        f"{'1-mol classes':>13} {'mean size':>9}"
    )
    for n in ns:
        r = estimate(n, fidelity=fidelity, f4_bin=f4_bin)
        print(
            f"{r['n']:>8} {r['n_classes']:>8} {r['top1_ceiling']:>10.4f} "
            f"{r['top10_ceiling']:>11.4f} {r['singleton_class_frac']:>13.3f} "
            f"{r['mean_class_size']:>9.2f}"
        )
