"""C++ packer vs numpy fallback parity."""

import numpy as np
import pytest

from diffspectra_tpu.data import native


def _raw_batch(seed=0, B=4, N=7):
    rng = np.random.default_rng(seed)
    num_atom = rng.integers(3, N + 1, size=B).astype(np.int64)
    atom_type = rng.integers(0, 5, size=(B, N)).astype(np.int64)
    pos = rng.normal(size=(B, N, 3)).astype(np.float32)
    edge_type = np.zeros((B, N, N), np.int64)
    for b in range(B):
        n = num_atom[b]
        for i in range(1, n):
            j = rng.integers(0, i)
            o = rng.choice([1, 2, 3, 4])
            edge_type[b, i, j] = edge_type[b, j, i] = o
    fc = rng.integers(-1, 2, size=(B, N)).astype(np.int64)
    spectra = np.abs(rng.normal(size=(B, 101))).astype(np.float32)
    return atom_type, pos, edge_type, fc, num_atom, spectra


@pytest.mark.parametrize("include_aromatic", [False, True])
def test_native_matches_numpy(include_aromatic):
    args = _raw_batch()
    kwargs = dict(include_aromatic=include_aromatic, use_normalize=True)
    out_np = native.pack_batch_numpy(*args, **kwargs)
    lib = native._load_library()
    if lib is None:
        pytest.skip("native library unavailable")
    out_cc = native.pack_batch(*args, **kwargs)
    assert set(out_np) == set(out_cc)
    for k in out_np:
        np.testing.assert_allclose(out_cc[k], out_np[k], atol=1e-6, err_msg=k)


def test_numpy_packer_semantics():
    atom_type, pos, edge_type, fc, num_atom, spectra = _raw_batch(1)
    out = native.pack_batch_numpy(atom_type, pos, edge_type, fc, num_atom, spectra)
    B, N = atom_type.shape
    # masks
    assert out["atom_mask"].shape == (B, N)
    assert np.all(out["edge_mask"].diagonal(axis1=1, axis2=2) == 0)
    # one-hot correctness on real atoms
    b, i = 0, 0
    assert out["atom_one_hot"][b, i, atom_type[b, i]] == 1.0
    # aromatic bond (4) maps to exist=0 bond=0 when include_aromatic=False
    arom = np.argwhere(edge_type == 4)
    if len(arom):
        b, i, j = arom[0]
        if out["edge_mask"][b, i, j] > 0:
            assert out["edge_one_hot"][b, i, j, 0] == 0.0
            assert out["edge_one_hot"][b, i, j, 1] == 0.0
    # spectra normalised
    np.testing.assert_allclose(
        out["spectra"], np.log10(spectra + 1.0), rtol=1e-6
    )
