"""Data pipeline tests: synthetic generation, transform, splits, collate,
on-device augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from diffspectra_tpu.configs import smoke
from diffspectra_tpu.data import get_dataset, get_batch_iterator, inf_iterator
from diffspectra_tpu.data.pipeline import augment_positions, random_rotation_matrices
from diffspectra_tpu.data.synthetic import generate
from diffspectra_tpu.data.transform import edge_com_spectra_transform


def test_synthetic_schema():
    raw = generate(seed=0, size=32, max_n=16)
    assert raw["atom_type"].shape == (32, 16)
    assert raw["pos"].shape == (32, 16, 3)
    assert raw["edge_type"].shape == (32, 16, 16)
    assert raw["ir"].shape == (32, 3501)
    assert raw["uv"].shape == (32, 701)
    # symmetric bonds, valid counts
    np.testing.assert_array_equal(raw["edge_type"], raw["edge_type"].transpose(0, 2, 1))
    assert np.all(raw["num_atom"] >= 3)
    assert np.all(raw["num_atom"] <= 16)
    # padded atoms have type 0 and zero bonds
    for m in range(5):
        n = raw["num_atom"][m]
        assert np.all(raw["edge_type"][m, n:, :] == 0)
    # spectra positive
    assert np.all(raw["ir"] >= 0)


def test_transform_channels():
    raw = generate(seed=1, size=8, max_n=10)
    out = edge_com_spectra_transform(raw, atom_types=5)
    assert out["atom_one_hot"].shape == (8, 10, 5)
    assert out["edge_one_hot"].shape == (8, 10, 10, 2)
    # exist channel consistent with bond channel (no aromatics in synthetic
    # non-aromatic config? synthetic can emit 4s only via rng - check rule)
    exist = out["edge_one_hot"][..., 0]
    bond = out["edge_one_hot"][..., 1]
    assert np.all((bond > 0) <= (exist > 0))
    # bond order scaled by 3
    orders = raw["edge_type"]
    m, i, j = np.argwhere(orders == 1)[0]
    np.testing.assert_allclose(out["edge_one_hot"][m, i, j, 1], 1 / 3, rtol=1e-6)
    # spectra log-normalised
    np.testing.assert_allclose(out["ir"], np.log10(raw["ir"] + 1), rtol=1e-5)


def test_dataset_splits_disjoint():
    cfg = smoke.get_config()
    first, second, val, test, info = get_dataset(cfg)
    idx = [set(ds.indices.tolist()) for ds in (first, second, val, test)]
    total = sum(len(s) for s in idx)
    assert total == cfg.data.synthetic_size
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (idx[a] & idx[b])
    assert info["max_n_nodes"] == 29


def test_batch_iterator_shapes_and_masks():
    cfg = smoke.get_config()
    _, second, _, _, _ = get_dataset(cfg)
    it = get_batch_iterator(second, 8, "ir", shuffle=True, seed=0)
    batch = next(it)
    n = cfg.data.max_node
    assert batch["atom_one_hot"].shape == (8, n, 5)
    assert batch["edge_one_hot"].shape == (8, n, n, 2)
    assert batch["context"].shape == (8, 3501)
    # mask diag zero
    assert np.all(batch["edge_mask"].diagonal(axis1=1, axis2=2) == 0)
    # infinite iterator wraps epochs
    inf = inf_iterator(lambda e: get_batch_iterator(second, 64, "ir", seed=e))
    for _ in range(5):
        next(inf)


def test_allspectra_context_tuple():
    cfg = smoke.get_config()
    cfg.data.spectra_version = "allspectra"
    _, second, _, _, _ = get_dataset(cfg)
    batch = next(get_batch_iterator(second, 4, "allspectra"))
    assert isinstance(batch["context"], tuple)
    assert batch["context"][0].shape == (4, 701)
    assert batch["context"][1].shape == (4, 3501)


def test_rotation_matrices_are_rotations():
    rots = random_rotation_matrices(jax.random.PRNGKey(0), 16)
    eye = jnp.einsum("bij,bkj->bik", rots, rots)
    np.testing.assert_allclose(
        np.asarray(eye), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(rots)), 1.0, atol=1e-5)


def test_augmentation_preserves_geometry():
    key = jax.random.PRNGKey(1)
    from diffspectra_tpu.utils import masks as M

    node_mask, _ = M.build_masks(jnp.asarray([4, 6]), 8)
    pos = jax.random.normal(key, (2, 8, 3)) * node_mask
    out = augment_positions(key, pos, node_mask[..., 0], True, True, 0.1)
    # padded rows zero
    np.testing.assert_allclose(np.asarray(out * (1 - node_mask)), 0.0, atol=1e-6)
    # pairwise distances preserved (rigid motion)
    def pdist(x, n):
        d = x[:n, None, :] - x[None, :n, :]
        return np.linalg.norm(np.asarray(d), axis=-1)

    np.testing.assert_allclose(
        pdist(out[0], 4), pdist(pos[0], 4), atol=1e-4
    )


def test_bucketed_batching():
    cfg = smoke.get_config()
    _, second, _, _, _ = get_dataset(cfg)
    buckets = (10, 13, 16)
    seen_sizes = set()
    total = 0
    for batch in get_batch_iterator(
        second, 4, "ir", seed=0, drop_last=False, bucket_sizes=buckets
    ):
        n_pad = batch["atom_one_hot"].shape[1]
        seen_sizes.add(n_pad)
        assert n_pad in buckets
        # every molecule fits its bucket (leftovers carry UP into larger
        # buckets, so a batch may contain smaller molecules — but never a
        # molecule that the bucket's n_pad would truncate)
        assert np.all(batch["num_atom"] <= n_pad)
        assert batch["edge_one_hot"].shape[1:3] == (n_pad, n_pad)
        total += len(batch["num_atom"])
    assert len(seen_sizes) > 1
    # drop_last=False + carry-up: the epoch covers the whole dataset
    assert total == len(second)


def test_prefetch_preserves_stream():
    from diffspectra_tpu.data.pipeline import prefetch

    out = list(prefetch(iter(range(17)), size=3))
    assert out == list(range(17))


def test_visualize_writes_xyz(tmp_path):
    from diffspectra_tpu.evaluation.molgraph import MolGraph
    from diffspectra_tpu.visualize import visualize_mols

    g = MolGraph(
        ["C", "H"], np.zeros(2, np.int64),
        np.array([[0, 1], [1, 0]], np.int64),
        np.array([[0.0, 0, 0], [1.09, 0, 0]]),
    )
    visualize_mols([g, g], str(tmp_path))
    content = open(tmp_path / "mol_0.xyz").read()
    assert content.startswith("2\n")
    assert "C 0.000000" in content


def test_original_qm9_split():
    """exp_type != 'diffspectra' selects the original-QM9 split: full train
    (first is second), ~10% test (ref qm9s_dataset.py:279-304)."""
    from diffspectra_tpu.configs import smoke
    from diffspectra_tpu.data import get_dataset

    cfg = smoke.get_config()
    cfg.exp_type = "vpsde_edge_cond"
    first, second, val, test = get_dataset(cfg)[:4]
    size = len(first) + len(val) + len(test)
    assert len(first) == len(second)
    assert (first.indices == second.indices).all()
    # train fraction ~ 100000/130831, test ~ 10%
    assert abs(len(first) / size - 100000 / 130831) < 0.02
    assert abs(len(test) / size - 0.1) < 0.02

    cfg2 = smoke.get_config()
    cond_first, cond_second = get_dataset(cfg2)[:2]
    assert len(cond_first.indices) != len(first.indices) or (
        cond_first.indices != first.indices
    ).any()


def test_synthetic_fidelity2_distinguishes_isomers():
    """fidelity=2 spectra must separate molecules that share a bond-pattern
    multiset (the fidelity-1 equivalence class, tools/ceiling_analysis.py)
    whenever their WL-environment multisets differ. Hand-built heavy-atom
    skeletons of propan-1-ol vs propan-2-ol: both have 2x C-C + 1x C-O
    bonds and equal element counts (same fidelity-1 class), but different
    WL-1 environments (O on a terminal vs the central carbon)."""
    from diffspectra_tpu.data.synthetic import _structure_spectrum

    def build(edges, types, max_n=12):
        n = len(types)
        e = np.zeros((max_n, max_n), dtype=np.int64)
        for a, b in edges:
            e[a, b] = e[b, a] = 1
        t = np.zeros(max_n, dtype=np.int64)
        t[:n] = types
        return t, e, n

    # heavy skeletons only (H omitted; element counts equal, bond-pattern
    # counts equal: 2x C-C, 1x C-O)
    # propan-1-ol: C0-C1, C1-C2, C2-O3
    t1, e1, n1 = build([(0, 1), (1, 2), (2, 3)], [1, 1, 1, 3])
    # propan-2-ol: C0-C1, C1-C2, C1-O3
    t2, e2, n2 = build([(0, 1), (1, 2), (1, 3)], [1, 1, 1, 3])

    rng1, rng2 = np.random.default_rng(0), np.random.default_rng(0)
    f1_a = _structure_spectrum(rng1, 701, t1, e1, n1, 0, fidelity=1)
    f1_b = _structure_spectrum(rng2, 701, t2, e2, n2, 0, fidelity=1)
    # fidelity 1: identical bond-pattern counts -> identical spectra
    np.testing.assert_allclose(f1_a, f1_b, atol=1e-6)

    rng1, rng2 = np.random.default_rng(0), np.random.default_rng(0)
    f2_a = _structure_spectrum(rng1, 701, t1, e1, n1, 0, fidelity=2)
    f2_b = _structure_spectrum(rng2, 701, t2, e2, n2, 0, fidelity=2)
    assert np.abs(f2_a - f2_b).max() > 1.0


def test_synthetic_fidelity4_continuous_and_injective():
    """Fidelity-4 (VERDICT r3 next-1): spectra keyed on CONTINUOUS local
    descriptors. Three properties: (a) isomer separation like fidelity-2;
    (b) CONTINUITY — a remote single-atom edit shifts an atom's peaks by at
    most a few peak widths (fidelity-2's hash keying teleports them);
    (c) locality — no shift beyond the 2-hop descriptor radius."""
    from diffspectra_tpu.data.synthetic import (
        _f4_peak_fracs, _structure_spectrum,
    )

    def build(edges, types, max_n=12):
        n = len(types)
        e = np.zeros((max_n, max_n), dtype=np.int64)
        for a, b in edges:
            e[a, b] = e[b, a] = 1
        t = np.zeros(max_n, dtype=np.int64)
        t[:n] = types
        return t, e, n

    # (a) propan-1-ol vs propan-2-ol heavy skeletons (same fidelity-1 class)
    t1, e1, n1 = build([(0, 1), (1, 2), (2, 3)], [1, 1, 1, 3])
    t2, e2, n2 = build([(0, 1), (1, 2), (1, 3)], [1, 1, 1, 3])
    rng1, rng2 = np.random.default_rng(0), np.random.default_rng(0)
    f4_a = _structure_spectrum(rng1, 3501, t1, e1, n1, 1, fidelity=4)
    f4_b = _structure_spectrum(rng2, 3501, t2, e2, n2, 1, fidelity=4)
    assert np.abs(f4_a - f4_b).max() > 1.0

    # (b)+(c) a 5-chain C0-C1-C2-C3-C4; substitute C4 -> N and look at C0
    # (4 hops away: zero shift) and C2 (2 hops: small shift)
    t5, e5, n5 = build([(0, 1), (1, 2), (2, 3), (3, 4)], [1, 1, 1, 1, 1])
    t5b = t5.copy()
    t5b[4] = 2  # N
    a1, _, _ = _f4_peak_fracs(t5, e5, n5, channel=1)
    a2, _, _ = _f4_peak_fracs(t5b, e5, n5, channel=1)
    width_frac = 0.004
    # atom 0 is 4 hops from the edit: descriptors unchanged, zero shift
    np.testing.assert_allclose(a1[0], a2[0], atol=1e-12)
    # atom 2 is 2 hops away: nonzero but SMALL (< 10 peak widths; a
    # fidelity-2 hash rekeying would move it ~0.3 of the spectrum)
    shift = np.abs(a1[2] - a2[2]).max()
    assert 0 < shift < 10 * width_frac


def test_fidelity4_structure_mode_is_trees():
    """fidelity=4 keeps the fidelity-2 TREE structure distribution (the
    clean intervention: only the spectrum keying changes); fidelity=5 is
    the ring-bearing counterpart of fidelity-3."""
    a4 = generate(seed=9, size=24, max_n=29, fidelity=4)
    a2 = generate(seed=9, size=24, max_n=29, fidelity=2)
    np.testing.assert_array_equal(a4["atom_type"], a2["atom_type"])
    np.testing.assert_array_equal(a4["edge_type"], a2["edge_type"])
    assert np.abs(a4["ir"] - a2["ir"]).max() > 1.0  # spectra differ

    def has_ring(edge, n):
        # edges >= nodes in any connected component with a cycle; molecules
        # are connected, so bonds >= n means at least one ring
        return np.triu(edge[:n, :n], 1).astype(bool).sum() >= n

    a5 = generate(seed=9, size=24, max_n=29, fidelity=5)
    rings5 = sum(
        has_ring(a5["edge_type"][m], int(a5["num_atom"][m]))
        for m in range(24)
    )
    rings4 = sum(
        has_ring(a4["edge_type"][m], int(a4["num_atom"][m]))
        for m in range(24)
    )
    assert rings4 == 0
    assert rings5 >= 8  # ring_prob 0.75 (gated on n>=8 atoms)


def test_synthetic_cache_roundtrip(tmp_path):
    a = generate(seed=5, size=16, max_n=12, fidelity=2, cache_dir=str(tmp_path))
    files = list(tmp_path.glob("synth_*.npz"))
    assert len(files) == 1
    b = generate(seed=5, size=16, max_n=12, fidelity=2, cache_dir=str(tmp_path))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # different fidelity -> different cache entry, different spectra
    c = generate(seed=5, size=16, max_n=12, fidelity=1, cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("synth_*.npz"))) == 2
    np.testing.assert_array_equal(a["atom_type"], c["atom_type"])
    assert np.abs(a["ir"] - c["ir"]).max() > 1.0


def test_fidelity3_ring_molecules():
    """Fidelity-3 structural mode (VERDICT r2 weak-3): majority ring-bearing,
    valence-correct, kekulized (orders 1/2/3 only, like the reference's
    include_aromatic=False processed data), clash-free geometry whose
    distances agree with the declared bond orders."""
    from diffspectra_tpu.data.info import get_dataset_info
    from diffspectra_tpu.data.synthetic import _VALENCE, _random_ring_molecule
    from diffspectra_tpu.evaluation import stability as ST

    info = get_dataset_info("qm9_second_half")
    rng = np.random.default_rng(7)
    n_ring = n_double = 0
    stable3 = stable2 = 0
    trials = 40
    for _ in range(trials):
        n = int(rng.integers(12, 29))
        t, p, e, nt = _random_ring_molecule(rng, n, 29)
        adj = e[:nt, :nt] > 0
        # exact valence saturation (neutral molecules)
        deg = e[:nt, :nt].sum(1)
        np.testing.assert_array_equal(deg, _VALENCE[t[:nt]])
        # kekulized: no aromatic order-4 entries
        assert e.max() <= 3
        # connected
        seen, stack = set(), [0]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(int(j) for j in np.nonzero(adj[x])[0])
        assert len(seen) == nt
        # cyclomatic number >= 1 (it IS ring-bearing; may fall back to a
        # tree only for tiny n, excluded by n >= 12 above)
        n_edges = int(np.triu(adj, 1).sum())
        if n_edges - nt + 1 >= 1:
            n_ring += 1
        if (e == 2).any():
            n_double += 1
        stable3 += int(ST.check_stability(p[:nt], t[:nt], info)[0])
        stable2 += int(
            ST.check_2D_stability(
                p[:nt], t[:nt], np.zeros(nt, dtype=np.int64), e[:nt, :nt], info
            )[0]
        )
    assert n_ring >= trials * 0.9  # occasional tree fallback allowed
    assert n_double >= trials * 0.25  # kekulized aromatics / upgraded bonds
    assert stable2 == trials
    assert stable3 >= trials - 2  # rare clash-margin miss tolerated


def test_fidelity3_generate_dispatch():
    """generate(fidelity=3) routes most molecules through the ring
    generator and keeps the full schema contract."""
    raw = generate(seed=3, size=48, max_n=29, fidelity=3)
    assert raw["atom_type"].shape == (48, 29)
    rings = 0
    for m in range(48):
        n = int(raw["num_atom"][m])
        adj = raw["edge_type"][m, :n, :n] > 0
        n_edges = int(np.triu(adj, 1).sum())
        if n_edges - n + 1 >= 1:
            rings += 1
    assert rings >= 20  # 0.75 ring prob over molecules with n>=8
    # spectra still fidelity-2-style WL-informative (positive, nonzero)
    assert np.all(raw["ir"] >= 0) and raw["ir"].max() > 1.0
