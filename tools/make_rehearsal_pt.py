"""Build an AT-SCALE fake QM9S processed .pt for the real-data rehearsal
(VERDICT r2 next-5): ~2k ring-bearing fidelity-3 molecules in the exact
PyG-collate layout of the reference's processed file (+ the conditional
split dict), so `scripts/real_data.sh` runs its pack -> train -> eval
pipeline end-to-end with zero manual steps and full-size spectra.

Usage: python tools/make_rehearsal_pt.py [size=2048] [root=data/QM9S_rehearsal]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    root = sys.argv[2] if len(sys.argv) > 2 else "data/QM9S_rehearsal"

    from diffspectra_tpu.data.qm9s import SPLIT_KEYS, write_processed_pt
    from diffspectra_tpu.data.synthetic import generate

    raw = generate(seed=11, size=size, max_n=29, fidelity=3)
    mols = []
    for m in range(size):
        n = int(raw["num_atom"][m])
        iu, ju = np.nonzero(np.triu(raw["edge_type"][m, :n, :n], 1))
        bonds = [
            (int(i), int(j), int(raw["edge_type"][m, i, j]))
            for i, j in zip(iu, ju)
        ]
        mols.append(
            dict(
                atom_type=raw["atom_type"][m, :n],
                pos=raw["pos"][m, :n],
                fc=raw["fc"][m, :n],
                bonds=bonds,
            )
        )
    spectra = {k: raw[k] for k in ("uv", "ir", "raman")}
    write_processed_pt(root, mols, spectra=spectra)

    # conditional split dict in the reference's file format
    # (ref qm9s_dataset.py:306-312): exercises the split-file branch of
    # pack_from_pyg instead of the seeded fallback
    import torch

    rng = np.random.default_rng(17)
    perm = rng.permutation(size)
    n_test = max(64, size // 8)
    n_val = max(64, size // 16)
    n_train = size - n_test - n_val
    sd = {
        "first_train": torch.tensor(perm[: n_train // 2]),
        "second_train": torch.tensor(perm[n_train // 2 : n_train]),
        "valid": torch.tensor(perm[n_train : n_train + n_val]),
        "test": torch.tensor(perm[n_train + n_val :]),
    }
    assert set(sd) == set(SPLIT_KEYS)
    torch.save(sd, os.path.join(root, "split_dict_diffspectra_qm9.pt"))
    print(
        f"wrote {size} fidelity-3 molecules to {root}/processed/"
        f"data_qm9_allspectra.pt + split_dict ({n_train}/{n_val}/{n_test})"
    )


if __name__ == "__main__":
    main()
