"""Whole-pair-grid-block fused Pallas TPU kernel for the DMT block.

PALLAS.md's end-to-end verdict on the per-op kernels (attention,
equi-update) was that each LOSES in production despite winning in
isolation: the ``pallas_call`` boundary forces its operands — GBF distance
features, modulated edge tensors, adjacency gates — to materialise in HBM,
tensors the fused XLA graph streams between ops. The fix it names (and
VERDICT r3 next-4 asks for) is a kernel whose HBM operands are ONLY the
tensors the graph materialises anyway: the scan-carried block residuals.

This kernel fuses the ENTIRE pair-grid portion of one
``EquivariantMixBlock`` (models/dmt.py:148-305; ref models/dmt.py:63-174):

    dist_gbf = [x, gauss(x)]  with x = d2*(s+1)+t         (CondGaussianLayer)
    e_attr   = dist_gbf @ Kd + edge_in @ Ke + b            (edge_emb)
    e_mod    = modulate(LN(e_attr), e_shift_msa, e_scale_msa)
    e0,e1    = tanh(e_mod @ W0), tanh(e_mod @ W1)          (attention gates)
    alpha    = masked_softmax([adj_logits, (q_i k_j e0)/sqrt(C)])
    attn     = sum_j alpha * v_j * e1                      -> [bb,N,H*C]
    h_edge   = p_i + p_j + b,  p = attn @ Kn2e             (node->edge)
    h_out    = node residual + adaLN + gated FFN           (node-level)
    edge_out = edge residual + adaLN + gated FFN           (pair FFN)
    agg      = equi-update pair chain on (h_out, edge_out, dist_gbf)

HBM traffic per block: reads h/q/k/v (node-level), ``edge_in`` once,
d2/normed_diff/adj/mask (~6% of pair bytes), and writes h_out/edge_out/agg
— every ``[B,N,N,252..256]`` intermediate (gates, qk, alpha_hc, msg,
e_proj/d_proj/pair/inv, FFN mids) lives only in VMEM. Under XLA those
intermediates are partially fused but still cost multiple [B,N,N,·] HBM
round trips per block (RESULTS.md roofline: the forward runs at 92.8% of
HBM peak — bytes, not scheduling, bound throughput).

Division of labour with the caller (EquivariantMixBlock):
- node-level preprocessing stays in XLA: LN+modulate of h, the q/k/v
  projections, the six node/edge adaLN modulation vectors, the equi and
  GBF time MLPs ([B,·] tensors, ~1/N^2 of pair traffic);
- squared distances ``d2 [B,N,N,1]`` and the CoorsNorm'd coordinate
  differences ``normed_diff [B,N,N,3]`` are computed outside (~1.5% of
  pair bytes; keeps CoorsNorm's double-where NaN story in one place);
- everything pair-grid with >=64 channels runs in here.

Mosaic-helper rules respected (bisect 2026-08-20, tools/diag_mosaic_bisect):
2-D dots only (rows = bb*N*N), f32 casts BEFORE collapse reshapes, no
lane-splitting reshapes, no lane-dim ``jnp.repeat`` (0/1 segment matmuls
instead), per-batch vectors shipped as ``[B, k, D]`` so block last-two dims
stay (k, D) with k full.

VMEM at flagship dims (N=29, Dh=256, De=64, bb=1, f32): pair intermediates
~9.9MB upper bound with zero aliasing + ~2.9MB weights — inside the 16MB
v5e budget only at ``batch_tile=1`` (the stage-local live set is far
smaller: e0/qk die at the logits, alpha_hc at the message sum).

Inference-only (no custom VJP), same dispatch gating as the other kernels:
``model.use_pallas`` + ``'block' in model.pallas_ops``; training always
uses the XLA path (run_lib._init_model_and_state clears use_pallas).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MASK_INF = -1e30
NEG_ADJ = -1e10


def _gauss(x, mean, std):
    # parity with models/layers.py::_gaussian (ref models/layers.py:291-295)
    pi = 3.14159
    a = (2 * pi) ** 0.5
    return jnp.exp(-0.5 * (((x - mean) / std) ** 2)) / (a * std)


def _ln(x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _dot2(x2d, w, b=None):
    out = jnp.dot(
        x2d, w.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return out if b is None else out + b.astype(jnp.float32)


def _kernel(
    # data refs
    h_ref, q_ref, k_ref, v_ref, edge_ref, d2_ref, nd_ref, adj_ref,
    emask_ref, nmask_ref, nmods_ref, emods_ref, eqss_ref, gbfss_ref,
    # weight refs
    means_ref, stds_ref, embd_ref, embe_ref, embb_ref,
    w0a_ref, w1a_ref, seg0_ref, seg1_ref,
    n2ek_ref, n2eb_ref,
    fn1k_ref, fn1b_ref, fn2k_ref, fn2b_ref,
    fe1k_ref, fe1b_ref, fe2k_ref, fe2b_ref,
    whi_ref, whj_ref, we_ref, wd_ref, eqb_ref, eqk0_ref, eqb0_ref,
    eqk1_ref,
    # outputs
    hout_ref, eout_ref, agg_ref,
    *, n_heads, n_extra, out_ch, sub_c, set_inf,
):
    bb, n = h_ref.shape[0], h_ref.shape[1]
    n_sub = n_heads - n_extra
    de = edge_ref.shape[-1]
    dh = h_ref.shape[-1]
    rows = bb * n * n

    f32 = jnp.float32
    emask = emask_ref[:].astype(f32)  # [bb,N,N]
    nmask = nmask_ref[:].astype(f32)  # [bb,N,1]

    # ---- CondGaussianLayer on squared distances (time scale/shift) ------
    gbf_ss = gbfss_ref[:].astype(f32)  # [bb,1,2]
    scale_t = gbf_ss[:, :, 0][:, :, None, None]  # [bb,1,1,1]
    shift_t = gbf_ss[:, :, 1][:, :, None, None]
    x = d2_ref[:].astype(f32) * (scale_t + 1.0) + shift_t  # [bb,N,N,1]
    std = jnp.abs(stds_ref[:].astype(f32)) + 1e-5
    dist_gbf = jnp.concatenate(
        [x, _gauss(x, means_ref[:].astype(f32), std)], axis=-1
    )  # [bb,N,N,De]

    # ---- edge_emb (linearity-split concat matmul) -----------------------
    edge_in = edge_ref[:].astype(f32)
    e_attr = (
        _dot2(dist_gbf.reshape(rows, de), embd_ref[:])
        + _dot2(edge_in.reshape(rows, de), embe_ref[:])
        + embb_ref[:].astype(f32)
    ).reshape(bb, n, n, de)

    # ---- adaLN on the edge stream --------------------------------------
    emods = emods_ref[:].astype(f32)  # [bb,6,De]
    e_mod = (
        _ln(e_attr) * (1.0 + emods[:, 1][:, None, None, :])
        + emods[:, 0][:, None, None, :]
    )

    # ---- mixed attention (gates + logits + softmax + message) ----------
    e_mod2 = e_mod.reshape(rows, de)
    e0 = jnp.tanh(_dot2(e_mod2, w0a_ref[:])).reshape(bb, n, n, n_sub * sub_c)
    e1 = jnp.tanh(_dot2(e_mod2, w1a_ref[:])).reshape(
        bb, n, n, n_heads * out_ch
    )
    q = q_ref[:].astype(f32)
    k = k_ref[:].astype(f32)
    v = v_ref[:].astype(f32)
    qk = q[:, :, None, :] * k[:, None, :, :]  # [bb,N,N,E*sc]
    logits = _dot2(
        (qk * e0).reshape(rows, n_sub * sub_c), seg0_ref[:]
    ).reshape(bb, n, n, n_sub) / math.sqrt(out_ch)
    extra = adj_ref[:].astype(f32)
    if set_inf:
        extra = jnp.where(extra == 0.0, NEG_ADJ, extra)
    alpha = jnp.concatenate([extra, logits], axis=-1)  # [bb,N,N,H]
    alpha = jnp.where(emask[..., None] > 0, alpha, MASK_INF)
    alpha = jax.nn.softmax(alpha, axis=2)
    alpha_hc = _dot2(
        alpha.reshape(rows, n_heads), seg1_ref[:]
    ).reshape(bb, n, n, n_heads * out_ch)
    attn = jnp.sum(alpha_hc * v[:, None, :, :] * e1, axis=2)  # [bb,N,H*C]

    # ---- node -> edge broadcast ----------------------------------------
    p = _dot2(attn.reshape(bb * n, dh), n2ek_ref[:]).reshape(bb, n, de)
    h_edge = (
        p[:, :, None, :] + p[:, None, :, :] + n2eb_ref[:].astype(f32)
    )

    # ---- node residual + adaLN + gated FFN -----------------------------
    nmods = nmods_ref[:].astype(f32)  # [bb,4,Dh]: gate_msa, shift_mlp,
    # scale_mlp, gate_mlp (shift/scale_msa were consumed outside)
    h1 = h_ref[:].astype(f32) + nmods[:, 0][:, None, :] * attn
    h1 = (
        _ln(h1) * (1.0 + nmods[:, 2][:, None, :]) + nmods[:, 1][:, None, :]
    ) * nmask
    ffn = _dot2(
        jax.nn.silu(_dot2(h1.reshape(bb * n, dh), fn1k_ref[:], fn1b_ref[:])),
        fn2k_ref[:], fn2b_ref[:],
    ).reshape(bb, n, dh)
    h_out = (h1 + nmods[:, 3][:, None, :] * ffn) * nmask
    hout_ref[:] = h_out.astype(hout_ref.dtype)

    # ---- edge residual + adaLN + gated FFN -----------------------------
    e_res = edge_in + emods[:, 2][:, None, None, :] * h_edge
    e_res = (
        _ln(e_res) * (1.0 + emods[:, 4][:, None, None, :])
        + emods[:, 3][:, None, None, :]
    )
    ffe = _dot2(
        jax.nn.silu(
            _dot2(e_res.reshape(rows, de), fe1k_ref[:], fe1b_ref[:])
        ),
        fe2k_ref[:], fe2b_ref[:],
    ).reshape(bb, n, n, de)
    edge_out = e_res + emods[:, 5][:, None, None, :] * ffe
    eout_ref[:] = edge_out.astype(eout_ref.dtype)

    # ---- equivariant update pair chain ---------------------------------
    node_i = _dot2(h_out.reshape(bb * n, dh), whi_ref[:]).reshape(bb, n, dh)
    node_j = _dot2(h_out.reshape(bb * n, dh), whj_ref[:]).reshape(bb, n, dh)
    pair = (
        node_i[:, :, None, :]
        + node_j[:, None, :, :]
        + _dot2(edge_out.reshape(rows, de), we_ref[:]).reshape(bb, n, n, dh)
        + _dot2(dist_gbf.reshape(rows, de), wd_ref[:]).reshape(bb, n, n, dh)
        + eqb_ref[:].astype(f32)
    )
    eqss = eqss_ref[:].astype(f32)  # [bb,2,Dh]: shift, scale
    pair = (
        _ln(pair) * (1.0 + eqss[:, 1][:, None, None, :])
        + eqss[:, 0][:, None, None, :]
    )
    inv = jax.nn.silu(
        _dot2(pair.reshape(rows, dh), eqk0_ref[:], eqb0_ref[:])
    )
    g = jnp.tanh(_dot2(inv, eqk1_ref[:])).reshape(bb, n, n, 1 + n_extra)
    ones = jnp.ones_like(extra[..., :1])
    gate = jnp.mean(
        g * jnp.concatenate([ones, adj_ref[:].astype(f32)], axis=-1),
        axis=-1, keepdims=True,
    )
    trans = nd_ref[:].astype(f32) * gate * emask[..., None]
    agg_ref[:] = jnp.sum(trans, axis=2).astype(agg_ref.dtype)


def block_fused(
    h, q, k, v, edge_in, d2, normed_diff, adj, edge_mask, node_mask,
    node_mods4, edge_mods6, eq_ss, gbf_ss,
    gbf_means, gbf_stds, emb_kd, emb_ke, emb_b,
    w0a, w1a, n2e_k, n2e_b,
    fn1_k, fn1_b, fn2_k, fn2_b, fe1_k, fe1_b, fe2_k, fe2_b,
    w_hi, w_hj, w_e, w_d, eq_bias, eq_k0, eq_b0, eq_k1,
    *, set_inf=True, n_heads, n_extra, out_ch, batch_tile: int = 1,
    interpret=None,
):
    """Fused whole-block pair-grid chain. Shapes (flagship values):
    h [B,N,Dh=256] / q,k [B,N,E*sc=252] / v [B,N,H*C=256] /
    edge_in [B,N,N,De=64] / d2 [B,N,N,1] / normed_diff [B,N,N,3] /
    adj [B,N,N,A=n_extra] / edge_mask [B,N,N] / node_mask [B,N,1] /
    node_mods4 [B,4,Dh] (gate_msa, shift_mlp, scale_mlp, gate_mlp) /
    edge_mods6 [B,6,De] (shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp) / eq_ss [B,2,Dh] (shift, scale) / gbf_ss [B,1,2]
    (scale, shift) / gbf_means,gbf_stds [De-1] / emb_kd,emb_ke [De,De] /
    emb_b [De] / w0a [De,E*sc] / w1a [De,H*C] / n2e [Dh,De] /
    ffn [Dh,r*Dh]+[r*Dh,Dh] / ffe [De,r*De]+[r*De,De] / w_hi,w_hj [Dh,Dh] /
    w_e,w_d [De,Dh] / eq_k0 [Dh,Dh] / eq_k1 [Dh,1+A]
    -> (h_out [B,N,Dh] f32, edge_out [B,N,N,De] f32, agg [B,N,3] f32).

    ``batch_tile=1``: the zero-aliasing VMEM upper bound is ~12.8MB at
    flagship dims (docstring table); bb=2 only fits with aggressive
    aliasing and is not default.
    """
    if interpret is None:
        interpret = os.environ.get("DIFFSPECTRA_PALLAS_INTERPRET", "") == "1"

    B, N, dh = h.shape
    de = edge_in.shape[-1]
    n_sub = n_heads - n_extra
    sub_c = (n_heads * out_ch) // n_sub
    a = adj.shape[-1]
    assert a == n_extra, (a, n_extra)

    bb = min(batch_tile, B)
    while B % bb:
        bb -= 1
    grid = (B // bb,)

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

    def bspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (i,) + (0,) * (_nd - 1))

    def wspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd)

    hc = n_heads * out_ch
    esc = n_sub * sub_c
    r_n = fn1_k.shape[-1]
    r_e = fe1_k.shape[-1]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, N, dh), jnp.float32),
            jax.ShapeDtypeStruct((B, N, N, de), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 3), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            bspec(bb, N, dh),            # h
            bspec(bb, N, esc),           # q
            bspec(bb, N, esc),           # k
            bspec(bb, N, hc),            # v
            bspec(bb, N, N, de),         # edge_in
            bspec(bb, N, N, 1),          # d2
            bspec(bb, N, N, 3),          # normed_diff
            bspec(bb, N, N, a),          # adj
            bspec(bb, N, N),             # edge_mask
            bspec(bb, N, 1),             # node_mask
            bspec(bb, 4, dh),            # node mods
            bspec(bb, 6, de),            # edge mods
            bspec(bb, 2, dh),            # equi shift/scale
            bspec(bb, 1, 2),             # gbf scale/shift
            wspec(de - 1),               # gbf means
            wspec(de - 1),               # gbf stds
            wspec(de, de),               # emb_kd
            wspec(de, de),               # emb_ke
            wspec(de),                   # emb_b
            wspec(de, esc),              # w0a
            wspec(de, hc),               # w1a
            wspec(esc, n_sub),           # seg0
            wspec(n_heads, hc),          # seg1
            wspec(dh, de),               # n2e_k
            wspec(de),                   # n2e_b
            wspec(dh, r_n),              # fn1_k
            wspec(r_n),                  # fn1_b
            wspec(r_n, dh),              # fn2_k
            wspec(dh),                   # fn2_b
            wspec(de, r_e),              # fe1_k
            wspec(r_e),                  # fe1_b
            wspec(r_e, de),              # fe2_k
            wspec(de),                   # fe2_b
            wspec(dh, dh),               # w_hi
            wspec(dh, dh),               # w_hj
            wspec(de, dh),               # w_e
            wspec(de, dh),               # w_d
            wspec(dh),                   # eq_bias
            wspec(dh, dh),               # eq_k0
            wspec(dh),                   # eq_b0
            wspec(dh, 1 + a),            # eq_k1
        ],
        out_specs=(
            pl.BlockSpec((bb, N, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, N, N, de), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((bb, N, 3), lambda i: (i, 0, 0)),
        ),
        interpret=interpret,
    )(
        h, q, k, v, edge_in, d2, normed_diff, adj, edge_mask, node_mask,
        node_mods4, edge_mods6, eq_ss, gbf_ss,
        gbf_means, gbf_stds, emb_kd, emb_ke, emb_b,
        w0a, w1a, seg0, seg1, n2e_k, n2e_b,
        fn1_k, fn1_b, fn2_k, fn2_b, fe1_k, fe1_b, fe2_k, fe2_b,
        w_hi, w_hj, w_e, w_d, eq_bias, eq_k0, eq_b0, eq_k1,
    )
