"""Fused Pallas TPU kernel for the DMT equivariant coordinate update chain.

PALLAS.md names this the highest-leverage remaining fusion: per DMT block the
equi-update (ref models/dmt.py:17-60; dense form models/dmt.py::
MultiCondEquiUpdate) materialises THREE ``[B,N,N,256]`` pair tensors
back-to-back in HBM —

    pair = node_i + node_j + edge@We + dist@Wd + bias   # [B,N,N,Dh]
    pair = modulate(LN(pair), shift, scale)             # [B,N,N,Dh]
    inv  = silu(pair @ W0 + b0)                         # [B,N,N,Dh]
    g    = tanh(inv @ W1)                               # [B,N,N,1+A]
    gate = mean(g * [1, adj_extra], -1)                 # [B,N,N,1]
    out  = sum_j normed_diff * gate * edge_mask         # [B,N,3]

— ~330MB of pair-tensor round trips per block at batch 128 (x8 blocks).
This kernel runs the whole chain per batch tile in VMEM: ``edge``/``dist``
are read from HBM once and only the ``[B,N,3]`` aggregate comes back.

Division of labour with the caller (MultiCondEquiUpdate):
- node projections ``node_i = h@W_hi``, ``node_j = h@W_hj`` (node-level,
  cheap, XLA-batched) and the time modulation vectors ``shift``/``scale``
  stay outside;
- the CoorsNorm'd coordinate differences ``normed_diff [B,N,N,3]`` are
  computed outside too — 3 channels is ~1% of the pair traffic and keeps
  the double-where NaN-safety in one place (models/layers.py::CoorsNorm).

All matmuls are plain 2-D dots (rows = bb*N*N) with f32 accumulation —
the Mosaic-lowering shape that the mix-attention kernel already validated
in interpret mode (Mosaic rejects multi-batch-dim contractions).

STATUS: experimental / opt-in (``config.model.use_pallas``), same fallback
decision tree as ops/pallas_attention.py — this container's remote TPU
compile helper rejects Mosaic payloads, so the kernel is interpret-verified
only (tests/test_pallas_equi_update.py) and the jnp twin is the production
path. VMEM budget: see the table in PALLAS.md (bb=2 ~= 9.3MB < 16MB v5e).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _chain_math(node_i, node_j, e_proj, d_proj, bias, shift, scale,
                w0, b0, w1, adj_extra, *, eps_ln):
    """The shared pair-grid chain AFTER the two gate projections: sum +
    LayerNorm(no scale/bias) + adaLN modulate + MLP + tanh + adjacency-mean.
    Everything f32. Used verbatim by both the kernel body and the jnp twin
    so the two cannot drift."""
    pair = node_i[:, :, None, :] + node_j[:, None, :, :] + e_proj + d_proj
    pair = pair + bias
    mu = jnp.mean(pair, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(pair - mu), axis=-1, keepdims=True)
    pair = (pair - mu) * jax.lax.rsqrt(var + eps_ln)
    pair = pair * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]

    bb, n, _, dh = pair.shape
    inv = jnp.dot(
        pair.reshape(bb * n * n, dh), w0, preferred_element_type=jnp.float32
    ) + b0
    inv = jax.nn.silu(inv)
    g = jnp.tanh(
        jnp.dot(inv, w1, preferred_element_type=jnp.float32)
    ).reshape(bb, n, n, -1)

    ones = jnp.ones_like(adj_extra[..., :1])
    adjs = jnp.concatenate([ones, adj_extra], axis=-1)
    return jnp.mean(g * adjs, axis=-1, keepdims=True)  # [bb,N,N,1]


def _kernel(node_i_ref, node_j_ref, edge_ref, dist_ref, normed_ref,
            adj_ref, mask_ref, we_ref, wd_ref, bias_ref, shift_ref,
            scale_ref, w0_ref, b0_ref, w1_ref, out_ref, *, eps_ln):
    bb, n = edge_ref.shape[0], edge_ref.shape[1]
    de, dd = edge_ref.shape[-1], dist_ref.shape[-1]
    dh = we_ref.shape[-1]

    # gate projections: 2-D dots with f32 accumulation. Cast BEFORE the
    # collapse reshape: Mosaic's remote compiler rejects reshapes of bf16
    # values whose collapsed sublane extent (odd multiples of N=29) isn't a
    # multiple of the bf16 tile — the f32 path compiles (bisect 2026-08-20,
    # tools/diag_mosaic_bisect.py).
    e_proj = jnp.dot(
        edge_ref[:].astype(jnp.float32).reshape(bb * n * n, de),
        we_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(bb, n, n, dh)
    d_proj = jnp.dot(
        dist_ref[:].astype(jnp.float32).reshape(bb * n * n, dd),
        wd_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(bb, n, n, dh)

    # shift/scale arrive as [bb, 1, Dh] (the extra middle axis keeps their
    # BlockSpec's last two dims (1, Dh) inside Mosaic's (8, 128)
    # divisible-or-full rule, which (bb, Dh) tiles with bb<8 violate)
    gate = _chain_math(
        node_i_ref[:].astype(jnp.float32), node_j_ref[:].astype(jnp.float32),
        e_proj, d_proj, bias_ref[:].astype(jnp.float32),
        jnp.squeeze(shift_ref[:], axis=1).astype(jnp.float32),
        jnp.squeeze(scale_ref[:], axis=1).astype(jnp.float32),
        w0_ref[:].astype(jnp.float32), b0_ref[:].astype(jnp.float32),
        w1_ref[:].astype(jnp.float32),
        adj_ref[:].astype(jnp.float32), eps_ln=eps_ln,
    )

    trans = normed_ref[:] * gate * mask_ref[:][..., None]
    out_ref[:] = jnp.sum(trans, axis=2).astype(out_ref.dtype)


def equi_update_reference(node_i, node_j, edge_attr, dist, normed_diff,
                          adj_extra, edge_mask, w_e, w_d, bias, shift, scale,
                          w0, b0, w1, *, eps_ln: float = 1e-6):
    """jnp twin with identical math (production fallback and test oracle)."""
    B, N = edge_attr.shape[0], edge_attr.shape[1]
    e_proj = jnp.dot(
        edge_attr.reshape(B * N * N, edge_attr.shape[-1]), w_e,
        preferred_element_type=jnp.float32,
    ).reshape(B, N, N, -1)
    d_proj = jnp.dot(
        dist.reshape(B * N * N, dist.shape[-1]), w_d,
        preferred_element_type=jnp.float32,
    ).reshape(B, N, N, -1)
    gate = _chain_math(
        node_i.astype(jnp.float32), node_j.astype(jnp.float32),
        e_proj, d_proj, bias.astype(jnp.float32),
        shift.astype(jnp.float32), scale.astype(jnp.float32),
        w0.astype(jnp.float32), b0.astype(jnp.float32), w1.astype(jnp.float32),
        adj_extra.astype(jnp.float32), eps_ln=eps_ln,
    )
    trans = normed_diff * gate * edge_mask[..., None]
    return jnp.sum(trans, axis=2)


def equi_update_fused(node_i, node_j, edge_attr, dist, normed_diff,
                      adj_extra, edge_mask, w_e, w_d, bias, shift, scale,
                      w0, b0, w1, *, eps_ln: float = 1e-6,
                      batch_tile: int = 2, interpret=None):
    """Fused equi-update chain. Shapes:
    node_i/node_j [B,N,Dh] / edge_attr [B,N,N,De] / dist [B,N,N,Dd] /
    normed_diff [B,N,N,3] (f32, CoorsNorm'd coordinate differences) /
    adj_extra [B,N,N,A] / edge_mask [B,N,N] / w_e [De,Dh] / w_d [Dd,Dh] /
    bias [Dh] / shift,scale [B,Dh] (zeros when unconditioned) / w0 [Dh,Dh] /
    b0 [Dh] / w1 [Dh,1+A]  ->  [B,N,3] f32 position delta (caller adds pos).

    batch_tile=2 keeps the per-tile live set ~9.3MB under the 16MB v5e VMEM
    budget at flagship dims (PALLAS.md).
    """
    if interpret is None:
        # lets CPU environments (tests, dev boxes) exercise the REAL
        # use_pallas dispatch path end-to-end in interpret mode
        interpret = os.environ.get("DIFFSPECTRA_PALLAS_INTERPRET", "") == "1"

    B, N = edge_attr.shape[0], edge_attr.shape[1]
    de, dd, dh = edge_attr.shape[-1], dist.shape[-1], w_e.shape[-1]
    a = adj_extra.shape[-1]

    bb = min(batch_tile, B)
    while B % bb:
        bb -= 1
    grid = (B // bb,)

    kernel = functools.partial(_kernel, eps_ln=eps_ln)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, N, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, N, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, N, N, de), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, N, N, dd), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, N, N, 3), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, N, N, a), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, N, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((de, dh), lambda i: (0, 0)),
            pl.BlockSpec((dd, dh), lambda i: (0, 0)),
            pl.BlockSpec((dh,), lambda i: (0,)),
            pl.BlockSpec((bb, 1, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, 1, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((dh, dh), lambda i: (0, 0)),
            pl.BlockSpec((dh,), lambda i: (0,)),
            pl.BlockSpec((dh, 1 + a), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, N, 3), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(node_i, node_j, edge_attr, dist, normed_diff, adj_extra, edge_mask,
      w_e, w_d, bias, shift[:, None, :], scale[:, None, :], w0, b0, w1)
