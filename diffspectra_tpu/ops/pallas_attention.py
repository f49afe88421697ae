"""Fused Pallas TPU kernel for the DMT mixed edge-gated attention.

The hot inner op of every DMT block (ref models/layers.py:92-191, dense form
in models/layers.py::DenseTransMixLayer) is:

    e0 = tanh(edge_attr @ W0)           # [B,N,N,E*sc]
    e1 = tanh(edge_attr @ W1)           # [B,N,N,H*C]
    logit[b,i,j,h] = sum_c q[b,i,h,c] k[b,j,h,c] e0[b,i,j,h,c] / sqrt(C)
    alpha = masked_softmax([extra_logits, logit], axis=j)
    out[b,i,h,c] = sum_j alpha[b,i,j,h] v[b,j,h,c] e1[b,i,j,h,c]

Under XLA, the two projection matmuls materialise ``[B,N,N,252]`` and
``[B,N,N,256]`` gate tensors in HBM (~110MB round trips per block at batch
128). This kernel fuses projection + tanh + logits + masked softmax +
weighted sum per batch tile entirely in VMEM, so edge_attr is read from HBM
once and only the ``[B,N,H*C]`` output is written back.

The q/k/v node projections stay outside (they are cheap ``[B,N,·]``
matmuls that XLA batches well).

``mix_attention(..., use_pallas=False)`` runs the identical jnp fallback;
the kernel is validated against it in tests (interpret mode on CPU).

STATUS: hardware-validated, opt-in (config.model.use_pallas=False by
default). Round 3 bisected the Mosaic helper's constraints
(tools/diag_mosaic_bisect.py), rewrote the kernel body to respect them
(2-D MXU dots, f32-before-collapse casts, 0/1 segment matmuls instead of
reshape/repeat), and the kernel now COMPILES, RUNS and passes parity
checks on the v5e. XLA remains the production default because it is
faster end-to-end: the pallas_call boundary forces its HBM operands
(edge_attr and the pair mask) to materialise, while the fused XLA graph
streams them — full measurements and the fusion-boundary analysis in
PALLAS.md. The whole-pair-grid block kernel (ops/pallas_block.py) is the
follow-up that moves the boundary to tensors the graph materialises
anyway.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MASK_INF = -1e30
NEG_ADJ = -1e10  # reference's zero-adjacency logit (ref layers.py:173)


def _kernel(q_ref, k_ref, v_ref, edge_ref, w0_ref, w1_ref, extra_ref,
            mask_ref, seg0_ref, seg1_ref, out_ref,
            *, n_heads, n_extra, out_ch, sub_c, set_inf):
    """One batch tile: q [Bb,N,E*sc], k [Bb,N,E*sc], v [Bb,N,H*C],
    edge [Bb,N,N,De], w0 [De,E*sc], w1 [De,H*C], extra [Bb,N,N,n_extra],
    mask [Bb,N,N], seg0 [E*sc,E] 0/1 head-segment reducer,
    seg1 [H,H*C] 0/1 head-segment expander -> out [Bb,N,H*C].

    Mosaic-helper constraints (bisect 2026-08-20, tools/diag_mosaic_bisect):
    reshapes that SPLIT the trailing (lane) dim ([.,252] -> [.,14,18]),
    ``jnp.repeat`` on the lane dim, and ANY reshape of a bf16 ref whose
    collapsed sublane extent isn't a multiple of the bf16 tile (16) crash
    the remote compiler (HTTP 500); leading-dim reshapes of f32 values and
    plain 2-D dots compile. Hence: (a) the ``edge`` ref stays rank-4 and is
    cast to f32 BEFORE the in-kernel collapse to [Bb*N*N, De] — the f32
    cast (not pre-flattening) is what satisfies the Mosaic bf16-tile
    reshape rule, (b) only f32 dot OUTPUTS are reshaped, (c) the
    per-head reduction/expansion of the folded (h, c) axis is done with
    tiny 0/1 segment MATMULS instead of reshape+sum / repeat — exact same
    math.
    """
    bb, n = q_ref.shape[0], q_ref.shape[1]
    n_sub = n_heads - n_extra
    de = edge_ref.shape[-1]

    # cast BEFORE the collapse: a bf16 reshape whose collapsed sublane
    # extent (bb*N*N, odd multiples of 29) isn't a multiple of the bf16
    # tile is rejected; the f32 path compiles. The projections then run as
    # f32 dots — fine, the kernel is HBM/VPU-bound, not MXU-bound.
    edge = edge_ref[:].astype(jnp.float32).reshape(bb * n * n, de)
    e0 = jnp.tanh(
        jnp.dot(edge, w0_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    ).reshape(bb, n, n, n_sub * sub_c)
    e1 = jnp.tanh(
        jnp.dot(edge, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    ).reshape(bb, n, n, n_heads * out_ch)

    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)

    # learned logits: sum_c q_i k_j e0_ij over each head's sub_c chunk of
    # the folded (h, c) axis — segment-sum as a [E*sc, E] 0/1 matmul
    qk = q[:, :, None, :] * k[:, None, :, :]  # [bb, n, n, E*sc]
    gated = (qk * e0).reshape(bb * n * n, n_sub * sub_c)
    logits = jnp.dot(
        gated, seg0_ref[:], preferred_element_type=jnp.float32
    ).reshape(bb, n, n, n_sub) / math.sqrt(out_ch)

    extra = extra_ref[:].astype(jnp.float32)
    if set_inf:
        extra = jnp.where(extra == 0.0, NEG_ADJ, extra)
    alpha = jnp.concatenate([extra, logits], axis=-1)  # [Bb,N,N,H]

    mask = mask_ref[:]
    alpha = jnp.where(mask[..., None] > 0, alpha, MASK_INF)
    alpha = jax.nn.softmax(alpha, axis=2)

    # out_i = sum_j alpha_ij * v_j * e1_ij ; broadcast alpha [H] over the
    # folded (h, c) axis with a [H, H*C] 0/1 matmul (repeat is rejected)
    alpha_hc = jnp.dot(
        alpha.reshape(bb * n * n, n_heads), seg1_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(bb, n, n, n_heads * out_ch)
    msg = alpha_hc * v[:, None, :, :] * e1
    out = jnp.sum(msg, axis=2)  # [bb, n, H*C]
    out_ref[:] = out.astype(out_ref.dtype)


def mix_attention_reference(q, k, v, edge_attr, w0, w1, extra, edge_mask,
                            *, set_inf=True):
    """jnp fallback with identical semantics (used on CPU and for tests)."""
    B, N, n_sub, sub_c = q.shape
    n_heads, out_ch = v.shape[2], v.shape[3]
    e0 = jnp.tanh(
        (edge_attr @ w0).astype(jnp.float32)
    ).reshape(B, N, N, n_sub, sub_c)
    e1 = jnp.tanh(
        (edge_attr @ w1).astype(jnp.float32)
    ).reshape(B, N, N, n_heads, out_ch)
    logits = jnp.einsum(
        "bihc,bjhc,bijhc->bijh", q.astype(jnp.float32), k.astype(jnp.float32), e0
    ) / math.sqrt(out_ch)
    extra = extra.astype(jnp.float32)
    if set_inf:
        extra = jnp.where(extra == 0.0, NEG_ADJ, extra)
    alpha = jnp.concatenate([extra, logits], axis=-1)
    alpha = jnp.where(edge_mask[..., None] > 0, alpha, MASK_INF)
    alpha = jax.nn.softmax(alpha, axis=2)
    out = jnp.einsum("bijh,bjhc,bijhc->bihc", alpha, v.astype(jnp.float32), e1)
    return out.reshape(B, N, n_heads * out_ch)


def mix_attention(q, k, v, edge_attr, w0, w1, extra, edge_mask, *,
                  set_inf=True, batch_tile: int = 2, interpret=None):
    """Fused mixed attention. Shapes:
    q,k [B,N,E,sc] / v [B,N,H,C] / edge_attr [B,N,N,De] / w0 [De,E*sc] /
    w1 [De,H*C] / extra [B,N,N,n_extra] / edge_mask [B,N,N]
    -> [B, N, H*C] (f32).

    batch_tile=2 keeps the per-tile live set ~10.6MB under the 16MB v5e
    VMEM budget (PALLAS.md VMEM table); r1's tile of 8 was
    interpret-mode-tuned and over budget on hardware.
    """
    if interpret is None:
        # lets CPU environments (tests, dev boxes) exercise the REAL
        # use_pallas dispatch path end-to-end in interpret mode
        interpret = os.environ.get("DIFFSPECTRA_PALLAS_INTERPRET", "") == "1"

    B, N, n_sub, sub_c = q.shape
    n_heads, out_ch = v.shape[2], v.shape[3]
    n_extra = extra.shape[-1]
    de = edge_attr.shape[-1]

    bb = min(batch_tile, B)
    while B % bb:
        bb -= 1
    grid = (B // bb,)

    # fold the (head, channel) axes and flatten edge_attr to 2-D OUTSIDE
    # the kernel (in-kernel bf16 reshapes with 29-row sublanes are rejected
    # by the Mosaic helper; see _kernel docstring)
    q2 = q.reshape(B, N, n_sub * sub_c)
    k2 = k.reshape(B, N, n_sub * sub_c)
    v2 = v.reshape(B, N, n_heads * out_ch)
    # 0/1 segment matrices: seg0 reduces the folded (h, c) axis per head,
    # seg1 broadcasts per-head weights back over it
    seg0 = (
        jnp.arange(n_sub * sub_c)[:, None] // sub_c
        == jnp.arange(n_sub)[None, :]
    ).astype(jnp.float32)
    seg1 = (
        jnp.arange(n_heads)[:, None]
        == jnp.arange(n_heads * out_ch)[None, :] // out_ch
    ).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, n_heads=n_heads, n_extra=n_extra, out_ch=out_ch,
        sub_c=sub_c, set_inf=set_inf,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, n_heads * out_ch), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, N, n_sub * sub_c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, N, n_sub * sub_c), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, N, n_heads * out_ch), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, N, N, de), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((de, n_sub * sub_c), lambda i: (0, 0)),
            pl.BlockSpec((de, n_heads * out_ch), lambda i: (0, 0)),
            pl.BlockSpec((bb, N, N, n_extra), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, N, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_sub * sub_c, n_sub), lambda i: (0, 0)),
            pl.BlockSpec((n_heads, n_heads * out_ch), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, N, n_heads * out_ch), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q2, k2, v2, edge_attr, w0, w1, extra, edge_mask, seg0, seg1)
