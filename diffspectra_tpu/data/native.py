"""ctypes bindings for the C++ batch packer (native/packer.cc) with a
semantics-identical numpy fallback.

The shared library is built on demand with the repo's Makefile; when the
toolchain or build is unavailable the numpy path is used transparently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdiffspectra_native.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        # always invoke make: it is timestamp-idempotent, and a stale .so
        # (built before a source file was added) would otherwise be loaded
        # forever; a failed make with a usable existing .so is tolerated
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                raise
        lib = ctypes.CDLL(_LIB_PATH)
        assert lib.packer_abi_version() == 1
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.pack_batch.argtypes = [
            i64p, f32p, i64p, i64p, i64p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            f32p, f32p, f32p, f32p, f32p, f32p, f32p,
        ]
        lib.pack_batch.restype = None
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-less environments
        logging.info("native packer unavailable (%s); using numpy fallback", e)
        _lib = None
    return _lib


def pack_batch_numpy(
    atom_type, pos, edge_type, fc, num_atom, spectra=None,
    atom_types: int = 5, include_aromatic: bool = False, use_normalize: bool = True,
) -> Dict[str, np.ndarray]:
    """Reference-semantics numpy packer (mirrors native/packer.cc)."""
    B, N = atom_type.shape
    ar = np.arange(N)
    node_mask = (ar[None, :] < num_atom[:, None]).astype(np.float32)
    edge_mask = node_mask[:, :, None] * node_mask[:, None, :]
    edge_mask *= 1.0 - np.eye(N, dtype=np.float32)[None]

    atom_one_hot = (
        atom_type[..., None] == np.arange(atom_types)[None, None, :]
    ).astype(np.float32) * node_mask[..., None]

    bond = edge_type.astype(np.float32).copy()
    bond[edge_type == 4] = 0.0
    bond = bond / 3.0
    feats = [bond]
    if include_aromatic:
        feats.append((edge_type == 4).astype(np.float32))
    edge_feat = np.stack(feats, axis=-1) * edge_mask[..., None]
    exist = (edge_feat.sum(-1, keepdims=True) != 0).astype(np.float32)
    edge_one_hot = np.concatenate([exist, edge_feat], axis=-1)

    out = dict(
        atom_one_hot=atom_one_hot,
        edge_one_hot=edge_one_hot,
        positions=pos.astype(np.float32) * node_mask[..., None],
        formal_charges=(fc.astype(np.float32) * node_mask)[..., None],
        atom_mask=node_mask,
        edge_mask=edge_mask,
    )
    if spectra is not None:
        spec = spectra.astype(np.float32)
        out["spectra"] = np.log10(spec + 1.0) if use_normalize else spec
    return out


def pack_batch(
    atom_type, pos, edge_type, fc, num_atom, spectra=None,
    atom_types: int = 5, include_aromatic: bool = False, use_normalize: bool = True,
) -> Dict[str, np.ndarray]:
    """Pack a gathered raw batch into dense model tensors, preferring the
    C++ implementation."""
    lib = _load_library()
    if lib is None:
        return pack_batch_numpy(
            atom_type, pos, edge_type, fc, num_atom, spectra,
            atom_types, include_aromatic, use_normalize,
        )

    B, N = atom_type.shape
    A = atom_types
    C = 3 if include_aromatic else 2
    L = spectra.shape[1] if spectra is not None else 0

    atom_type = np.ascontiguousarray(atom_type, np.int64)
    pos = np.ascontiguousarray(pos, np.float32)
    edge_type = np.ascontiguousarray(edge_type, np.int64)
    fc = np.ascontiguousarray(fc, np.int64)
    num_atom = np.ascontiguousarray(num_atom, np.int64)
    spec_in = (
        np.ascontiguousarray(spectra, np.float32)
        if spectra is not None
        else np.zeros((B, 0), np.float32)
    )

    atom_one_hot = np.empty((B, N, A), np.float32)
    edge_one_hot = np.empty((B, N, N, C), np.float32)
    node_mask = np.empty((B, N), np.float32)
    edge_mask = np.empty((B, N, N), np.float32)
    pos_out = np.empty((B, N, 3), np.float32)
    fc_out = np.empty((B, N, 1), np.float32)
    spec_out = np.empty_like(spec_in)

    lib.pack_batch(
        atom_type, pos, edge_type, fc, num_atom, spec_in,
        B, N, A, int(include_aromatic), int(use_normalize), L,
        atom_one_hot, edge_one_hot, node_mask, edge_mask, pos_out, fc_out,
        spec_out,
    )
    out = dict(
        atom_one_hot=atom_one_hot,
        edge_one_hot=edge_one_hot,
        positions=pos_out,
        formal_charges=fc_out,
        atom_mask=node_mask,
        edge_mask=edge_mask,
    )
    if spectra is not None:
        out["spectra"] = spec_out
    return out
