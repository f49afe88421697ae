"""Kabsch alignment: cross-checked against an independent torch
implementation and rotation-recovery properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffspectra_tpu.ops.kabsch import get_align_position, kabsch_batch


def _random_rotations(rng, b):
    out = []
    for _ in range(b):
        a = rng.normal(size=(3, 3))
        q, r = np.linalg.qr(a)
        q = q * np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        out.append(q)
    return np.stack(out)


def test_kabsch_recovers_exact_rotation():
    rng = np.random.default_rng(0)
    b, n = 4, 7
    pos0 = rng.normal(size=(b, n, 3))
    pos0 -= pos0.mean(1, keepdims=True)
    rots = _random_rotations(rng, b)
    pos_t = np.einsum("bij,bnj->bni", rots, pos0)

    aligned = np.asarray(
        get_align_position(jnp.asarray(pos_t), jnp.asarray(pos0))
    )
    # aligning pos0 onto the rotated frame must reproduce pos_t exactly
    np.testing.assert_allclose(aligned, pos_t, atol=1e-4)


def test_kabsch_rotation_is_proper():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 5, 3)).astype(np.float32)
    b = rng.normal(size=(8, 5, 3)).astype(np.float32)
    rot = np.asarray(kabsch_batch(jnp.asarray(a), jnp.asarray(b)))
    dets = np.linalg.det(rot)
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    # orthonormal
    eye = np.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-4)


def test_kabsch_matches_torch_reference_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(6, 9, 3))
    b = rng.normal(size=(6, 9, 3))

    # independent torch implementation of the same objective
    A = torch.einsum("bki,bkj->bij", torch.tensor(a), torch.tensor(b))
    U, S, Vt = torch.linalg.svd(A)
    sign = torch.sign(torch.det(A))
    corr = torch.ones(6, 3, dtype=torch.float64)
    corr[:, -1] = sign
    R_torch = torch.einsum("bij,bj,bjk->bik", U, corr, Vt).numpy()

    R_jax = np.asarray(kabsch_batch(jnp.asarray(a), jnp.asarray(b)))
    # rotations may differ in sign conventions only when the SVD is
    # degenerate; for random matrices they must match
    np.testing.assert_allclose(R_jax, R_torch, atol=1e-4)


def test_kabsch_minimises_alignment_error():
    rng = np.random.default_rng(3)
    pos0 = rng.normal(size=(1, 8, 3))
    pos0 -= pos0.mean(1, keepdims=True)
    rot = _random_rotations(rng, 1)
    pos_t = np.einsum("bij,bnj->bni", rot, pos0) + 0.01 * rng.normal(size=(1, 8, 3))

    aligned = np.asarray(get_align_position(jnp.asarray(pos_t), jnp.asarray(pos0)))
    err_aligned = np.mean((aligned - pos_t) ** 2)
    err_raw = np.mean((pos0 - pos_t) ** 2)
    assert err_aligned < err_raw
    assert err_aligned < 1e-3
