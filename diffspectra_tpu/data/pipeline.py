"""Dataset assembly, splits, batching and on-device augmentation.

Replaces ref datasets/build_dataset.py:13-452 + qm9s_dataset.py splits. The
reference pads each batch to the per-batch max atom count (dynamic shapes);
TPU wants static shapes, so batches are padded to the fixed ``data.max_node``
(deliberate, documented deviation — numerics are mask-invariant, SURVEY §7).

SO(3) rotation + translation augmentation (ref build_dataset.py:313-339,
scipy on host) runs on-device as a jitted function over the whole batch.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .info import get_dataset_info
from .synthetic import generate as generate_synthetic
from .transform import edge_com_spectra_transform

SPECTRA_KEYS = {"uv": ("uv",), "ir": ("ir",), "raman": ("raman",),
                "allspectra": ("uv", "ir", "raman")}


class ArrayDataset:
    """A dict of aligned numpy arrays + an index; cheap row views."""

    def __init__(self, arrays: Dict[str, np.ndarray], indices: np.ndarray):
        self.arrays = arrays
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def take(self, rows: np.ndarray) -> Dict[str, np.ndarray]:
        idx = self.indices[rows]
        return {k: v[idx] for k, v in self.arrays.items()}

    def select(self, rows: np.ndarray) -> "ArrayDataset":
        return ArrayDataset(self.arrays, self.indices[rows])


def _conditional_splits(rng: np.ndarray, size: int):
    """4-way conditional split like the reference's
    split_dict_diffspectra_qm9.pt (ref qm9s_dataset.py:306-312): first/second
    train halves, val, test."""
    perm = rng.permutation(size)
    n_test = max(1, int(size * 0.1))
    n_val = max(1, int(size * 0.05))
    n_train = size - n_test - n_val
    first = perm[: n_train // 2]
    second = perm[n_train // 2 : n_train]
    val = perm[n_train : n_train + n_val]
    test = perm[n_train + n_val :]
    return first, second, val, test


def _original_splits(rng: np.ndarray, size: int):
    """Original-QM9 split (ref qm9s_dataset.py:279-304): 100k/130831 train,
    10% test, remainder val — scaled proportionally to `size`.  Used by the
    ``vpsde_edge_cond`` exp_type (the --config_original_qm9 auxiliary
    dataset whose train/test mols seed the metric reference sets, ref
    run_lib.py:340-342)."""
    perm = rng.permutation(size)
    n_train = max(1, int(size * 100000 / 130831))
    n_test = max(1, int(size * 0.1))
    train = perm[:n_train]
    test = perm[n_train : n_train + n_test]
    val = perm[n_train + n_test :]
    return train, train, val, test


def get_dataset(config, transform: bool = True):
    """Build (first_train, second_train, val, test, dataset_info)
    (ref build_dataset.py:13-49). ``exp_type='diffspectra'`` -> 4-way
    conditional split; anything else -> the original-QM9 split (first and
    second both alias the full train set)."""
    dataset_info = get_dataset_info(config.data.info_name)
    max_n = config.data.max_node
    conditional = config.get("exp_type", "diffspectra") == "diffspectra"

    if config.data.get("synthetic", False):
        raw = generate_synthetic(
            seed=config.seed, size=config.data.synthetic_size, max_n=max_n,
            info_name=config.data.info_name,
            fidelity=config.data.get("synthetic_fidelity", 1),
            cache_dir=config.data.get("synthetic_cache", ""),
        )
        split_rng = np.random.default_rng(config.seed)
        split_fn = _conditional_splits if conditional else _original_splits
        first, second, val, test = split_fn(split_rng, len(raw["num_atom"]))
    else:
        from .qm9s import load_qm9s  # lazy: touches the filesystem

        raw, splits = load_qm9s(config.data.root, max_n=max_n)
        if conditional:
            first, second, val, test = splits
        else:
            # the original-QM9 split is a dataset artifact (fixed seeded
            # permutation, ref qm9s_dataset.py:279-304), independent of the
            # conditional split file and of config.seed
            first, second, val, test = _original_splits(
                np.random.default_rng(42), len(raw["num_atom"])
            )

    if transform:
        arrays = edge_com_spectra_transform(
            raw,
            atom_types=config.data.atom_types,
            include_aromatic=config.data.include_aromatic,
            use_normalize=config.data.use_normalize,
        )
    else:
        arrays = raw

    ds = ArrayDataset(arrays, np.arange(len(arrays["num_atom"])))
    return (
        ds.select(first),
        ds.select(second),
        ds.select(val),
        ds.select(test),
        dataset_info,
    )


def build_masks_np(num_atom: np.ndarray, max_n: int):
    ar = np.arange(max_n)
    node_mask = (ar[None, :] < num_atom[:, None]).astype(np.float32)
    edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
    edge_mask *= 1.0 - np.eye(max_n, dtype=np.float32)[None]
    return node_mask, edge_mask


def collate(rows: Dict[str, np.ndarray], spectra_version: str) -> Dict:
    """Pack rows into the model batch dict (ref CollateSpectra,
    build_dataset.py:306-395, minus augmentation which runs on device)."""
    num_atom = rows["num_atom"]
    max_n = rows["atom_one_hot"].shape[1]
    node_mask, edge_mask = build_masks_np(num_atom, max_n)
    keys = SPECTRA_KEYS[spectra_version]
    spectra = tuple(rows[k] for k in keys)
    return dict(
        atom_one_hot=rows["atom_one_hot"],
        edge_one_hot=rows["edge_one_hot"],
        positions=rows["positions"],
        formal_charges=rows["formal_charges"],
        atom_mask=node_mask,
        edge_mask=edge_mask,
        context=spectra if len(spectra) > 1 else spectra[0],
        num_atom=num_atom,
    )


def random_rotation_matrices(key, bs: int) -> jnp.ndarray:
    """Uniform SO(3) rotations via normalised quaternions ([B, 3, 3])."""
    q = jax.random.normal(key, (bs, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x**2 + z**2), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x**2 + y**2)], -1),
        ],
        axis=1,
    )


def augment_positions(
    key,
    positions: jnp.ndarray,
    node_mask: jnp.ndarray,
    aug_rotation: bool,
    aug_translation: bool,
    aug_translation_scale: float,
) -> jnp.ndarray:
    """On-device SO(3) + translation augmentation
    (ref build_dataset.py:313-339; scipy Rotation -> jax.random)."""
    bs = positions.shape[0]
    mask = node_mask[..., None] if node_mask.ndim == 2 else node_mask
    k_rot, k_trans = jax.random.split(key)
    if aug_rotation:
        rot = random_rotation_matrices(k_rot, bs)
        positions = jnp.einsum("bij,bnj->bni", rot, positions) * mask
    if aug_translation:
        trans = aug_translation_scale * jax.random.normal(k_trans, (bs, 1, 3))
        positions = (positions + trans) * mask
    return positions


def _truncate_batch(rows_dict: Dict[str, np.ndarray], n_pad: int) -> Dict[str, np.ndarray]:
    """Trim node/edge axes of a gathered batch to ``n_pad`` (bucketing)."""
    out = {}
    for k, v in rows_dict.items():
        if k in ("atom_one_hot", "positions", "atom_type") or k == "formal_charges":
            out[k] = v[:, :n_pad]
        elif k in ("edge_one_hot", "edge_type"):
            out[k] = v[:, :n_pad, :n_pad]
        else:
            out[k] = v
    return out


def validate_bucket_sizes(bucket_sizes, num_atom) -> list:
    """Sort and validate bucket boundaries against the actual atom counts.

    ``np.searchsorted`` assigns rows with ``num_atom > bucket_sizes[-1]``
    to a bucket index past the end, and every bucketed iterator selects
    rows with ``bucket_of == bi`` — out-of-range rows would silently match
    no bucket and be excluded from EVERY epoch (the exact pathology the
    carry-up logic eliminates for sparse tail buckets; r2 review). Fail
    loudly instead.
    """
    bucket_sizes = sorted(int(b) for b in bucket_sizes)
    top = int(np.max(num_atom)) if len(num_atom) else 0
    if bucket_sizes and top > bucket_sizes[-1]:
        raise ValueError(
            f"bucket_sizes[-1]={bucket_sizes[-1]} < max atom count {top}: "
            f"rows above the last bucket would never be trained on; add a "
            f"bucket >= {top}"
        )
    return bucket_sizes


def get_batch_iterator(
    ds: ArrayDataset,
    batch_size: int,
    spectra_version: str,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    bucket_sizes=(),
) -> Iterator[Dict]:
    """Epoch iterator of collated numpy batches.

    ``bucket_sizes``: optional ascending atom-count bucket boundaries (e.g.
    (18, 23, 29)). When set, batches are bucket-homogeneous and padded to
    the bucket size instead of the global max N — at QM9's size histogram
    this removes roughly half the padded pair compute (the deliberate
    middle ground between the reference's per-batch-max dynamic shapes and
    a single static shape; each bucket costs one XLA compilation).
    """
    rng = np.random.default_rng(seed)
    n = len(ds)
    order = rng.permutation(n) if shuffle else np.arange(n)

    if not bucket_sizes:
        stop = n - (n % batch_size) if drop_last else n
        for start in range(0, stop, batch_size):
            rows = order[start : start + batch_size]
            if len(rows) < batch_size and drop_last:
                break
            yield collate(ds.take(rows), spectra_version)
        return

    num_atom = ds.arrays["num_atom"][ds.indices[order]]
    bucket_sizes = validate_bucket_sizes(bucket_sizes, num_atom)
    bucket_of = np.searchsorted(bucket_sizes, num_atom)  # first b >= n
    batches = []
    # leftovers carry UP into the next-larger bucket (valid: n_pad only
    # grows) so sparse tail buckets are trained on instead of being
    # dropped every epoch — see device_store.index_iterator
    carry = order[:0]
    for bi, bsize in enumerate(bucket_sizes):
        rows = np.concatenate([carry, order[bucket_of == bi]])
        stop = len(rows) - (len(rows) % batch_size)
        for start in range(0, stop, batch_size):
            batches.append((bsize, rows[start : start + batch_size]))
        carry = rows[stop:]
    if carry.size and not drop_last:
        batches.append((bucket_sizes[-1], carry))
    rng.shuffle(batches)
    for bsize, rows in batches:
        yield collate(_truncate_batch(ds.take(rows), bsize), spectra_version)


def inf_iterator(make_iter):
    """Infinite restartable iterator (ref build_dataset.py:52-58)."""
    epoch = 0
    while True:
        for batch in make_iter(epoch):
            yield batch
        epoch += 1


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch: overlaps host batch assembly (gather,
    collate, C++ packing) with device compute — the TPU-side replacement for
    the reference's 16 DataLoader workers (ref configs/diffspectra_qm9s.py:21;
    one thread suffices because collation is vectorised numpy/C++)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
