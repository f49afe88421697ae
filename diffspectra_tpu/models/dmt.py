"""DMT: SE(3)-equivariant Diffusion Molecule Transformer (data prediction,
self-conditioning, spectra conditioning).

Dense TPU rewrite of ref models/dmt.py:17-413. The reference runs per-edge
sparse message passing (PyG scatter) over ``[2, E]`` edge lists; here every
tensor is padded dense (``[B, N, ·]`` nodes, ``[B, N, N, ·]`` pairs) with
masks, so every op is a batched matmul or masked reduction — MXU-shaped, no
scatter, no dynamic shapes, fully jit/scan/shard_map compatible.

Equivariance: coordinates only enter through pairwise differences/distances
and are updated by mask-weighted sums of normalised difference vectors, with
per-layer CoM projection — identical math to the reference, so rotation
equivariance holds exactly (tested in tests/test_dmt.py).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import masks as M
from ..utils.registry import register_model
from .layers import (
    CondGaussianLayer,
    CoorsNorm,
    DenseParams,
    DenseTransMixLayer,
    GaussianLayer,
    LearnedSinusoidalPosEmb,
    edge_skip_head_first,
    skip_head_mlp_tail,
    modulate,
)
from .specformer import SpecFormer

_GBF_LAYERS = {"GaussianLayer": GaussianLayer, "CondGaussianLayer": CondGaussianLayer}


class MultiCondEquiUpdate(nn.Module):
    """Equivariant coordinate update with time conditioning
    (dense rewrite of ref models/dmt.py:17-60)."""

    hidden_dim: int
    edge_dim: int
    dist_dim: int
    time_dim: int
    extra_heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, pos, edge_attr, dist, time_emb, adj_extra,
                 edge_mask, export_for_block=False):
        if export_for_block:
            # whole-block Pallas path (ops/pallas_block.py): ``h``/
            # ``edge_attr``/``dist`` are produced INSIDE the fused kernel,
            # so this branch only declares the parameters (same names →
            # same checkpoints), runs the node-level time MLP, and computes
            # the CoorsNorm'd coordinate differences (~1% of pair bytes;
            # keeps the double-where NaN story in CoorsNorm).
            B = pos.shape[0]
            D = self.hidden_dim
            coord_diff = pos[:, :, None, :] - pos[:, None, :, :]
            normed_diff = CoorsNorm(scale_init=1e-2, name="coord_norm")(
                coord_diff
            )
            in_ch = 2 * D + self.edge_dim + self.dist_dim
            kernel = self.param(
                "input_lin_kernel", nn.initializers.lecun_normal(),
                (in_ch, self.hidden_dim), jnp.float32,
            )
            bias = self.param(
                "input_lin_bias", nn.initializers.zeros,
                (self.hidden_dim,), jnp.float32,
            )
            ss = nn.Dense(
                self.hidden_dim * 2, dtype=self.dtype, name="time_mlp"
            )(nn.silu(time_emb.astype(self.dtype)))
            shift, scale = jnp.split(ss.astype(jnp.float32), 2, axis=-1)
            k0, b0 = DenseParams(
                self.hidden_dim, self.hidden_dim, name="coord_mlp_0"
            )()
            k1, _ = DenseParams(
                self.hidden_dim, 1 + self.extra_heads, use_bias=False,
                name="coord_mlp_1",
            )()
            return {
                "normed_diff": normed_diff,
                "w_hi": kernel[:D],
                "w_hj": kernel[D : 2 * D],
                "w_e": kernel[2 * D : 2 * D + self.edge_dim],
                "w_d": kernel[2 * D + self.edge_dim :],
                "bias": bias,
                "shift": shift,
                "scale": scale,
                "k0": k0, "b0": b0, "k1": k1,
            }
        B, N, _ = h.shape
        D = h.shape[-1]
        h = h.astype(self.dtype)

        # position math stays f32 (bf16 squared distances lose precision)
        coord_diff = pos[:, :, None, :] - pos[:, None, :, :]  # [B,N,N,3]
        coord_diff = CoorsNorm(scale_init=1e-2, name="coord_norm")(coord_diff)

        # input_lin over the pair input [h_i, h_j, e_ij, dist_ij] decomposed
        # by linearity: concat([a,b,c,d]) @ W == a@W1 + b@W2 + c@W3 + d@W4.
        # The h_i/h_j parts become per-NODE matmuls broadcast-added over the
        # pair grid — the reference's dominant [B*N^2, 2D+De+Dd] matmul
        # (ref dmt.py:39,45) loses its node-feature FLOPs and the concat
        # never materialises in HBM. Identical math and parameter count.
        in_ch = 2 * D + edge_attr.shape[-1] + dist.shape[-1]
        kernel = self.param(
            "input_lin_kernel",
            nn.initializers.lecun_normal(),
            (in_ch, self.hidden_dim),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "input_lin_bias", nn.initializers.zeros, (self.hidden_dim,), jnp.float32
        ).astype(self.dtype)
        w_hi = kernel[:D]
        w_hj = kernel[D : 2 * D]
        w_e = kernel[2 * D : 2 * D + edge_attr.shape[-1]]
        w_d = kernel[2 * D + edge_attr.shape[-1] :]
        node_i = h @ w_hi  # [B, N, hidden]
        node_j = h @ w_hj

        if time_emb is not None:
            # NB chunk order here is (shift, scale) — ref models/dmt.py:44
            ss = nn.Dense(self.hidden_dim * 2, dtype=self.dtype, name="time_mlp")(
                nn.silu(time_emb.astype(self.dtype))
            )
            shift, scale = jnp.split(ss, 2, axis=-1)
        else:
            shift = scale = None

        # coord_mlp params are declared raw (same names/inits as nn.Dense)
        # so the XLA path and the fused Pallas kernel share one param set
        k0, b0 = DenseParams(
            self.hidden_dim, self.hidden_dim, name="coord_mlp_0"
        )()
        k1, _ = DenseParams(
            self.hidden_dim, 1 + self.extra_heads, use_bias=False,
            name="coord_mlp_1",
        )()

        if self.use_pallas:
            # fused pair-grid chain: edge/dist read from HBM once, the three
            # [B,N,N,Dh] intermediates live only in VMEM (PALLAS.md)
            from ..ops.pallas_equi_update import equi_update_fused

            zeros = jnp.zeros((B, self.hidden_dim), jnp.float32)
            agg = equi_update_fused(
                node_i, node_j,
                edge_attr.astype(self.dtype), dist.astype(self.dtype),
                coord_diff, adj_extra.astype(jnp.float32), edge_mask,
                w_e, w_d, bias,
                zeros if shift is None else shift.astype(jnp.float32),
                zeros if scale is None else scale.astype(jnp.float32),
                k0, b0, k1,
            )
            return pos + agg

        inv = (
            node_i[:, :, None, :]
            + node_j[:, None, :, :]
            + edge_attr.astype(self.dtype) @ w_e
            + dist.astype(self.dtype) @ w_d
            + bias
        )
        inv = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="ln")(inv)
        if time_emb is not None:
            inv = modulate(inv, shift[:, None, None, :], scale[:, None, None, :])
        inv = inv @ k0.astype(self.dtype) + b0.astype(self.dtype)
        inv = nn.silu(inv)
        inv = inv @ k1.astype(self.dtype)
        inv = jnp.tanh(inv).astype(jnp.float32)

        # multi-channel adjacency gating: [1, adj_extra...] mean over channels
        ones = jnp.ones_like(adj_extra[..., :1])
        adjs = jnp.concatenate([ones, adj_extra], axis=-1)
        inv = jnp.mean(inv * adjs, axis=-1, keepdims=True)

        # aggregate over real edges only (ref scatter_add over edge_index[0])
        trans = coord_diff * inv * edge_mask[..., None]
        agg = jnp.sum(trans, axis=2)
        return pos + agg


class EquivariantMixBlock(nn.Module):
    """Equivariant transformer block (dense rewrite of ref models/dmt.py:63-174)."""

    node_dim: int
    edge_dim: int
    time_dim: int
    num_extra_heads: int
    num_heads: int
    cond_time: bool = True
    dist_gbf: bool = True
    softmax_inf: bool = True
    mlp_ratio: int = 2
    dropout: float = 0.0
    gbf_name: str = "CondGaussianLayer"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # which ops dispatch to their fused Pallas kernel when use_pallas is on.
    # Hardware status (2026-08-20 v5e chain timing, RESULTS.md): 'equi' is
    # 2.4x faster than the XLA chain; 'attn' compiles+matches but is ~1.4x
    # slower than XLA, so the measured default enables only 'equi'.
    pallas_ops: tuple = ("equi",)

    @nn.compact
    def __call__(
        self,
        pos,
        h,
        edge_attr,
        node_mask,
        edge_mask,
        extra_heads,
        node_time_emb=None,
        edge_time_emb=None,
        deterministic=True,
    ):
        dist_dim = self.edge_dim if self.dist_gbf else 1
        h_in_node = h
        h_in_edge = edge_attr

        if (
            self.use_pallas
            and "block" in self.pallas_ops
            and self.cond_time
            and self.dist_gbf
            and (deterministic or self.dropout == 0.0)
            and extra_heads.shape[-1] == self.num_extra_heads
        ):
            return self._fused_block(
                pos, h, edge_attr, node_mask, edge_mask, extra_heads,
                node_time_emb, edge_time_emb, dist_dim,
            )

        # re-encode current distances each block (ref :136-139)
        distance = M.coord2dist_dense(pos)  # [B,N,N,1]
        if self.dist_gbf:
            distance = _GBF_LAYERS[self.gbf_name](
                dist_dim, self.time_dim, name="dist_layer"
            )(distance, edge_time_emb)
        # concat([dist, e]) @ W == dist @ W_top + e @ W_bot — the
        # [B,N,N,dist_dim+edge_dim] concat never materialises in HBM (same
        # linearity trick as MultiCondEquiUpdate's input_lin; identical math,
        # identical param tree via DenseParams under nn.Dense's names)
        k_emb, b_emb = DenseParams(
            dist_dim + self.edge_dim, self.edge_dim, name="edge_emb"
        )()
        k_emb = k_emb.astype(self.dtype)
        edge_attr = (
            distance.astype(self.dtype) @ k_emb[:dist_dim]
            + edge_attr.astype(self.dtype) @ k_emb[dist_dim:]
            + b_emb.astype(self.dtype)
        )

        ln = lambda name: nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, name=name
        )

        if self.cond_time:
            node_mods = jnp.split(
                nn.Dense(self.node_dim * 6, dtype=self.dtype, name="node_time_mlp")(
                    nn.silu(node_time_emb.astype(self.dtype))
                ),
                6,
                axis=-1,
            )
            edge_mods = jnp.split(
                nn.Dense(self.edge_dim * 6, dtype=self.dtype, name="edge_time_mlp")(
                    nn.silu(edge_time_emb.astype(self.dtype))
                ),
                6,
                axis=-1,
            )
            (n_shift_msa, n_scale_msa, n_gate_msa, n_shift_mlp, n_scale_mlp,
             n_gate_mlp) = [m[:, None, :] for m in node_mods]
            (e_shift_msa, e_scale_msa, e_gate_msa, e_shift_mlp, e_scale_mlp,
             e_gate_mlp) = [m[:, None, None, :] for m in edge_mods]
            h = modulate(ln("norm1_node")(h), n_shift_msa, n_scale_msa)
            edge_attr = modulate(ln("norm1_edge")(edge_attr), e_shift_msa, e_scale_msa)
        else:
            h = ln("norm1_node")(h)
            edge_attr = ln("norm1_edge")(edge_attr)

        # dense mixed attention (ref TransMixLayer)
        h_node = DenseTransMixLayer(
            self.node_dim,
            self.node_dim // self.num_heads,
            extra_heads=self.num_extra_heads,
            heads=self.num_heads,
            dropout=self.dropout,
            set_inf=self.softmax_inf,
            dtype=self.dtype,
            use_pallas=self.use_pallas and "attn" in self.pallas_ops,
            name="attn_mpnn",
        )(h, edge_attr, extra_heads, edge_mask, deterministic=deterministic)

        # node -> edge update (ref :156-157). Dense(h_i + h_j) is linear, so
        # project per NODE first and broadcast-add (bias added once) — N x
        # fewer matmul FLOPs and no [B,N,N,D] pre-projection tensor.
        n2e_kernel = self.param(
            "node2edge_kernel",
            nn.initializers.lecun_normal(),
            (self.node_dim, self.edge_dim),
            jnp.float32,
        ).astype(self.dtype)
        n2e_bias = self.param(
            "node2edge_bias", nn.initializers.zeros, (self.edge_dim,), jnp.float32
        )
        h_node_proj = h_node.astype(self.dtype) @ n2e_kernel
        h_edge = (
            h_node_proj[:, :, None, :].astype(jnp.float32)
            + h_node_proj[:, None, :, :].astype(jnp.float32)
            + n2e_bias
        )

        dropout = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        def ff_node(x):
            x = dropout(nn.silu(nn.Dense(self.node_dim * self.mlp_ratio, dtype=self.dtype, name="ff_linear1")(x)))
            return dropout(nn.Dense(self.node_dim, dtype=self.dtype, name="ff_linear2")(x).astype(jnp.float32))

        def ff_edge(x):
            x = dropout(nn.silu(nn.Dense(self.edge_dim * self.mlp_ratio, dtype=self.dtype, name="ff_linear3")(x)))
            return dropout(nn.Dense(self.edge_dim, dtype=self.dtype, name="ff_linear4")(x).astype(jnp.float32))

        if self.cond_time:
            h_node = h_in_node + n_gate_msa * h_node
            h_node = modulate(ln("norm2_node")(h_node), n_shift_mlp, n_scale_mlp) * node_mask
            h_out = (h_node + n_gate_mlp * ff_node(h_node)) * node_mask
            h_edge = h_in_edge + e_gate_msa * h_edge
            h_edge = modulate(ln("norm2_edge")(h_edge), e_shift_mlp, e_scale_mlp)
            h_edge_out = h_edge + e_gate_mlp * ff_edge(h_edge)
        else:
            h_node = h_in_node + h_node
            h_node = ln("norm2_node")(h_node) * node_mask
            h_out = (h_node + ff_node(h_node)) * node_mask
            h_edge = h_in_edge + h_edge
            h_edge = ln("norm2_edge")(h_edge)
            h_edge_out = h_edge + ff_edge(h_edge)

        # equivariant coordinate update (ref :172)
        pos = MultiCondEquiUpdate(
            self.node_dim,
            self.edge_dim,
            dist_dim,
            self.time_dim,
            self.num_extra_heads,
            dtype=self.dtype,
            use_pallas=self.use_pallas and "equi" in self.pallas_ops,
            name="equi_update",
        )(h_out, pos, h_edge_out, distance, edge_time_emb, extra_heads, edge_mask)

        return h_out, h_edge_out, pos

    def _fused_block(self, pos, h, edge_attr, node_mask, edge_mask,
                     extra_heads, node_time_emb, edge_time_emb, dist_dim):
        """Whole-pair-grid-block Pallas dispatch (ops/pallas_block.py).

        Declares the EXACT parameter tree of the XLA branch (every Dense /
        DenseParams under the same names), runs the node-level
        preprocessing in XLA (adaLN vectors, q/k/v projections, time MLPs,
        d2/CoorsNorm — ~1/N^2 of the traffic), and hands the whole
        pair-grid chain to one fused kernel whose HBM operands are only
        the scan-carried residuals. Inference-only (no VJP)."""
        from ..ops.pallas_block import block_fused

        d2 = M.coord2dist_dense(pos)  # [B,N,N,1] f32
        gbf_means, gbf_stds, g_scale, g_shift = _GBF_LAYERS[self.gbf_name](
            dist_dim, self.time_dim, name="dist_layer"
        )(d2, edge_time_emb, export_params=True)
        k_emb, b_emb = DenseParams(
            dist_dim + self.edge_dim, self.edge_dim, name="edge_emb"
        )()

        ln = lambda name: nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, name=name
        )
        node_mods = jnp.split(
            nn.Dense(self.node_dim * 6, dtype=self.dtype,
                     name="node_time_mlp")(
                nn.silu(node_time_emb.astype(self.dtype))
            ).astype(jnp.float32),
            6, axis=-1,
        )
        edge_mods = jnp.split(
            nn.Dense(self.edge_dim * 6, dtype=self.dtype,
                     name="edge_time_mlp")(
                nn.silu(edge_time_emb.astype(self.dtype))
            ).astype(jnp.float32),
            6, axis=-1,
        )
        (n_shift_msa, n_scale_msa, n_gate_msa, n_shift_mlp, n_scale_mlp,
         n_gate_mlp) = node_mods

        hm = modulate(
            ln("norm1_node")(h), n_shift_msa[:, None, :],
            n_scale_msa[:, None, :],
        )
        q2, k2, v2, w0a, w1a = DenseTransMixLayer(
            self.node_dim,
            self.node_dim // self.num_heads,
            extra_heads=self.num_extra_heads,
            heads=self.num_heads,
            dropout=self.dropout,
            set_inf=self.softmax_inf,
            dtype=self.dtype,
            name="attn_mpnn",
        )(hm, edge_attr, extra_heads, edge_mask, export_for_block=True)

        n2e_kernel = self.param(
            "node2edge_kernel",
            nn.initializers.lecun_normal(),
            (self.node_dim, self.edge_dim),
            jnp.float32,
        )
        n2e_bias = self.param(
            "node2edge_bias", nn.initializers.zeros, (self.edge_dim,),
            jnp.float32,
        )
        fn1_k, fn1_b = DenseParams(
            self.node_dim, self.node_dim * self.mlp_ratio, name="ff_linear1"
        )()
        fn2_k, fn2_b = DenseParams(
            self.node_dim * self.mlp_ratio, self.node_dim, name="ff_linear2"
        )()
        fe1_k, fe1_b = DenseParams(
            self.edge_dim, self.edge_dim * self.mlp_ratio, name="ff_linear3"
        )()
        fe2_k, fe2_b = DenseParams(
            self.edge_dim * self.mlp_ratio, self.edge_dim, name="ff_linear4"
        )()

        eq = MultiCondEquiUpdate(
            self.node_dim,
            self.edge_dim,
            dist_dim,
            self.time_dim,
            self.num_extra_heads,
            dtype=self.dtype,
            name="equi_update",
        )(None, pos, None, None, edge_time_emb, None, None,
          export_for_block=True)

        B = h.shape[0]
        node_mods4 = jnp.stack(
            [n_gate_msa, n_shift_mlp, n_scale_mlp, n_gate_mlp], axis=1
        )  # [B,4,Dh]
        edge_mods6 = jnp.stack(edge_mods, axis=1)  # [B,6,De]
        eq_ss = jnp.stack([eq["shift"], eq["scale"]], axis=1)  # [B,2,Dh]
        gbf_ss = jnp.stack(
            [g_scale.astype(jnp.float32), g_shift.astype(jnp.float32)],
            axis=-1,
        )[:, None, :]  # [B,1,2]

        h_out, edge_out, agg = block_fused(
            h.astype(jnp.float32), q2, k2, v2, edge_attr, d2,
            eq["normed_diff"], extra_heads.astype(jnp.float32),
            edge_mask, node_mask,
            node_mods4, edge_mods6, eq_ss, gbf_ss,
            gbf_means, gbf_stds,
            k_emb[:dist_dim], k_emb[dist_dim:], b_emb,
            w0a, w1a, n2e_kernel, n2e_bias,
            fn1_k, fn1_b, fn2_k, fn2_b, fe1_k, fe1_b, fe2_k, fe2_b,
            eq["w_hi"], eq["w_hj"], eq["w_e"], eq["w_d"], eq["bias"],
            eq["k0"], eq["b0"], eq["k1"],
            set_inf=self.softmax_inf,
            n_heads=self.num_heads,
            n_extra=self.num_extra_heads,
            out_ch=self.node_dim // self.num_heads,
        )
        return h_out, edge_out, pos + agg


class _BlockWithCollect(nn.Module):
    """scan body: one EquivariantMixBlock + CoM projection + skip-concat
    projections (ref models/dmt.py:382-388). Loop invariants ride the carry."""

    node_dim: int
    edge_dim: int
    time_dim: int
    num_extra_heads: int
    num_heads: int
    cond_time: bool
    dist_gbf: bool
    softmax_inf: bool
    mlp_ratio: int
    dropout: float
    gbf_name: str
    dtype: jnp.dtype
    use_pallas: bool
    pallas_ops: tuple
    CoM: bool
    cat_node_dim: int
    cat_edge_dim: int
    deterministic: bool

    @nn.compact
    def __call__(self, carry, _):
        (pos, h, edge_attr, node_mask, edge_mask, extra_adj,
         node_time_emb, edge_time_emb) = carry
        h, edge_attr, pos = EquivariantMixBlock(
            self.node_dim,
            self.edge_dim,
            self.time_dim,
            self.num_extra_heads,
            self.num_heads,
            cond_time=self.cond_time,
            dist_gbf=self.dist_gbf,
            softmax_inf=self.softmax_inf,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            gbf_name=self.gbf_name,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_ops=self.pallas_ops,
            name="e_block",
        )(
            pos, h, edge_attr, node_mask, edge_mask, extra_adj,
            node_time_emb, edge_time_emb, deterministic=self.deterministic,
        )
        if self.CoM:
            pos = M.remove_mean_with_mask(pos, node_mask)
        cat_h = nn.Dense(self.cat_node_dim, name="node_proj")(h)
        cat_e = nn.Dense(self.cat_edge_dim, name="edge_proj")(edge_attr)
        new_carry = (pos, h, edge_attr, node_mask, edge_mask, extra_adj,
                     node_time_emb, edge_time_emb)
        return new_carry, (cat_h, cat_e)


@register_model(name="DMT")
class DMT(nn.Module):
    """Conditional Diffusion Molecule Transformer with self-conditioning
    (dense rewrite of ref models/dmt.py:178-413).

    ``__call__(t, xh, node_mask, edge_mask, context, edge_x, cond_x,
    cond_edge_x, noise_level, has_cond, deterministic)``:

    - ``xh [B, N, 3 + in_node_dim]`` positions + node features (normalised)
    - ``edge_x [B, N, N, edge_ch]`` dense edge features
    - ``context`` spectra tuple for SpecFormer (or ``None``)
    - ``cond_x/cond_edge_x`` self-conditioning previous prediction (pass
      zeros with ``has_cond=False`` for the reference's ``cond_x=None`` path)
    - ``has_cond`` scalar bool (traced ok): selects the reference's
      ``cond_x is None`` branch behaviour (all-ones conditional adjacency and
      zeroed distance features, ref :332-340, :363-368).

    Returns ``(pred [B, N, 3 + in_node_dim], edge_pred [B, N, N, edge_ch])``.
    """

    in_node_dim: int = 6  # atom types + formal charge bit
    hidden_dim: int = 256
    edge_hidden_dim: int = 64
    edge_ch: int = 2
    n_heads: int = 16
    n_extra_heads: int = 2
    n_layers: int = 8
    dropout: float = 0.1
    cond_time: bool = True
    dist_gbf: bool = True
    gbf_name: str = "CondGaussianLayer"
    edge_quan_th: float = 0.0
    CoM: bool = True
    mlp_ratio: int = 2
    spatial_cut_off: float = 2.0
    softmax_inf: bool = True
    pred_data: bool = True
    spectra_version: str = "ir"
    patch_len: tuple = (20, 50, 50)
    stride: tuple = (10, 25, 25)
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # which fused kernels use_pallas enables; 'equi' measured 2.4x the XLA
    # chain on v5e, 'attn' compiles+matches but measured slower than XLA
    # (RESULTS.md round-3 Pallas table) — so only 'equi' by default
    pallas_ops: tuple = ("equi",)
    # lax.scan unroll factor for the block loop; 1 = rolled (fast compile,
    # training default), n_layers = fully unrolled (fast inference — no
    # per-iteration weight slicing/layout copies). Checkpoint-compatible.
    scan_unroll: int = 1
    # backward rematerialisation policy for the block scan:
    # 'full' recomputes everything (minimum memory), 'dots' saves matmul/MXU
    # outputs and recomputes only VPU elementwise work (faster backward,
    # ~n_layers x the pair-grid dot activations resident), 'none' skips
    # remat entirely — the scan stacks every layer's residuals (maximum
    # memory, no recompute; viable only when L x the pair-grid activations
    # fit HBM, probe before enabling at scale). No param change.
    remat_policy: str = "full"
    # run SpecFormer in the model dtype (bf16 compute) inside this graph;
    # off by default — see the gate comment at the SpecFormer call site
    specformer_bf16: bool = False

    @staticmethod
    def from_config(config):
        import jax.numpy as _jnp

        dtype = (
            _jnp.bfloat16
            if config.training.get("matmul_precision", "") == "bfloat16"
            else _jnp.float32
        )
        # Pallas dispatch: hardware-validated 2026-08-20 (both kernels now
        # compile through the remote Mosaic helper after the reshape-rule
        # rewrites — see ops/pallas_attention.py docstring). The kernels
        # have no custom VJP, so this stays off for training; the inference
        # model (run_lib._inference_model) flips it on for sampling.
        use_pallas = bool(config.model.get("use_pallas", False))
        return DMT(
            dtype=dtype,
            use_pallas=bool(use_pallas),
            pallas_ops=tuple(config.model.get("pallas_ops", ("equi",))),
            scan_unroll=int(config.model.get("scan_unroll", 1)),
            remat_policy=str(config.model.get("remat_policy", "full")),
            specformer_bf16=bool(config.model.get("specformer_bf16", False)),
            in_node_dim=config.data.atom_types + int(config.model.include_fc_charge),
            hidden_dim=config.model.nf,
            edge_hidden_dim=config.model.nf // 4,
            edge_ch=config.model.edge_ch,
            n_heads=config.model.n_heads,
            n_extra_heads=config.model.n_extra_heads,
            n_layers=config.model.n_layers,
            dropout=config.model.dropout,
            cond_time=config.model.cond_time,
            dist_gbf=config.model.dist_gbf,
            gbf_name=config.model.gbf_name,
            edge_quan_th=config.model.edge_quan_th,
            CoM=config.model.CoM,
            mlp_ratio=config.model.mlp_ratio,
            spatial_cut_off=config.model.spatial_cut_off,
            softmax_inf=config.model.softmax_inf,
            pred_data=config.model.pred_data,
            spectra_version=config.data.spectra_version,
            patch_len=tuple(config.model.patch_len),
            stride=tuple(config.model.stride),
        )

    @nn.compact
    def __call__(
        self,
        t,
        xh,
        node_mask,
        edge_mask,
        context=None,
        *,
        edge_x,
        noise_level=None,
        cond_x=None,
        cond_edge_x=None,
        has_cond=False,
        context_emb=None,
        deterministic: bool = True,
        **kwargs,
    ):
        B, N, dims = xh.shape
        time_dim = self.hidden_dim * 4
        dist_dim = self.edge_hidden_dim if self.dist_gbf else 1

        pos = xh[:, :, 0:3]
        h = xh[:, :, 3:]

        # self-conditioning features (ref :332-345)
        if cond_x is None:
            cond_x = jnp.zeros_like(xh)
            cond_edge_x = jnp.zeros_like(edge_x)
            has_cond = jnp.asarray(False)
        has_cond = jnp.asarray(has_cond)
        cond_pos = cond_x[:, :, 0:3]
        cond_h = cond_x[:, :, 3:]
        # binarised conditional adjacency; all-ones when no cond (ref :335-340)
        thresholded = (cond_edge_x[..., 0:1] >= self.edge_quan_th).astype(xh.dtype)
        cond_adj_2d = jnp.where(has_cond, thresholded, jnp.ones_like(thresholded))
        cond_adj_2d = jax.lax.stop_gradient(cond_adj_2d)

        h = jnp.concatenate([h, cond_h], axis=-1)

        # spectra conditioning added to the time embedding (ref :347-354).
        # ``context_emb`` is the precomputed [B, time_dim] embedding — the
        # sampler encodes the (t-independent) spectra ONCE instead of at
        # every reverse step like the reference (ref sampling.py:588-593).
        if context_emb is not None:
            ctx = context_emb
        elif context is not None:
            ctx = SpecFormer(
                patch_len=self.patch_len,
                stride=self.stride,
                output_dim=self.hidden_dim,
                spectra_version=self.spectra_version,
                # bf16 SpecFormer compute inside the train graph is gated:
                # threading dtype here SEGV'd this environment's remote TPU
                # compiler when first tried (ROADMAP item 5); the knob lets
                # us re-test as the toolchain moves without a code change.
                dtype=self.dtype if self.specformer_bf16 else jnp.float32,
                name="cond_encoder",
            )(context, deterministic=deterministic)
            ctx = nn.Dense(time_dim, name="cond_lin")(ctx)
        else:
            ctx = 0.0

        if self.cond_time:
            temb = LearnedSinusoidalPosEmb(16, name="time_emb")(noise_level)
            temb = nn.Dense(time_dim, name="time_mlp_1")(temb)
            temb = nn.gelu(temb)
            temb = nn.Dense(time_dim, name="time_mlp_2")(temb)
            time_emb = temb + ctx  # [B, time_dim]
            node_time_emb = time_emb
            edge_time_emb = time_emb
        else:
            node_time_emb = edge_time_emb = None
            time_emb = None

        # distances + spatial adjacency from the self-cond positions
        # (ref :363-368); when there is no cond, positions are zero and the
        # reference swaps the GBF features for zeros (ref :364-365)
        distances_raw, cond_adj_spatial = M.coord2diff_adj_dense(
            cond_pos, edge_mask, self.spatial_cut_off
        )
        if self.dist_gbf:
            gbf_feat = _GBF_LAYERS[self.gbf_name](
                dist_dim, time_dim, name="dist_layer"
            )(distances_raw, edge_time_emb)
        else:
            gbf_feat = distances_raw
        zeros_feat = jnp.zeros(distances_raw.shape[:-1] + (dist_dim,), xh.dtype)
        distances = jnp.where(has_cond, gbf_feat, zeros_feat)

        extra_adj = jnp.concatenate([cond_adj_2d, cond_adj_spatial], axis=-1)
        edge_attr = jnp.concatenate([edge_x, cond_edge_x, distances], axis=-1)

        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="node_emb")(h)
        h = h.astype(jnp.float32)
        edge_attr = nn.Dense(self.edge_hidden_dim, dtype=self.dtype, name="edge_emb")(
            edge_attr.astype(self.dtype)
        ).astype(jnp.float32)

        cat_node_dim = (self.hidden_dim * 2) // self.n_layers
        cat_edge_dim = (self.edge_hidden_dim * 2) // self.n_layers

        # nn.scan over the (structurally identical) blocks: compiles ONE
        # block body instead of n_layers copies — compile time drops ~8x at
        # reference depth; parameters are stacked along a leading layer axis.
        # nn.remat inside the scan rematerialises block activations in the
        # backward pass — without it the scan stacks every layer's pair-grid
        # residuals ([L,B,N,N,H,C] temps) and training OOMs at batch 128.
        # scan_unroll: inference profiling shows the rolled while-loop spends
        # ~40% of step time dynamic-slicing stacked per-layer weights out of
        # HBM and layout-converting carries every iteration; unrolling turns
        # those into static slices XLA folds away. Param tree is unchanged
        # (still stacked), so checkpoints are interchangeable across settings.
        if self.remat_policy not in ("full", "dots", "none"):
            raise ValueError(f"unknown remat_policy: {self.remat_policy!r}")
        if self.remat_policy == "none":
            block_cls = _BlockWithCollect
        else:
            remat_policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if self.remat_policy == "dots"
                else None  # 'full': recompute everything
            )
            block_cls = nn.remat(
                _BlockWithCollect, static_argnums=(), policy=remat_policy
            )
        ScannedBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layers,
            unroll=self.scan_unroll,
        )
        carry = (pos, h, edge_attr, node_mask, edge_mask, extra_adj,
                 node_time_emb, edge_time_emb)
        carry, (cat_h, cat_e) = ScannedBlocks(
            node_dim=self.hidden_dim,
            edge_dim=self.edge_hidden_dim,
            time_dim=time_dim,
            num_extra_heads=self.n_extra_heads,
            num_heads=self.n_heads,
            cond_time=self.cond_time,
            dist_gbf=self.dist_gbf,
            softmax_inf=self.softmax_inf,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            gbf_name=self.gbf_name,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_ops=self.pallas_ops,
            CoM=self.CoM,
            cat_node_dim=cat_node_dim,
            cat_edge_dim=cat_edge_dim,
            deterministic=deterministic,
            name="blocks",
        )(carry, None)
        pos = carry[0]

        # ys [L, B, ...] -> concat in layer order after the embedding features
        L = self.n_layers
        cat_h = jnp.moveaxis(cat_h, 0, 2).reshape(B, N, L * cat_node_dim)
        atom_hids = jnp.concatenate([h, cat_h], axis=-1)

        def mlp_head(x, width, out, prefix):
            x = nn.Dense(width, name=f"{prefix}_0")(x)
            x = nn.silu(x)
            x = nn.Dense(width // 2, name=f"{prefix}_1")(x)
            x = nn.silu(x)
            return nn.Dense(out, name=f"{prefix}_2")(x)

        atom_pred = mlp_head(
            atom_hids, self.hidden_dim, self.in_node_dim, "node_pred_mlp"
        ) * node_mask

        # Edge skip-concat heads without the HBM round trips (shared helper;
        # see layers.edge_skip_head_first for the exact-math argument)
        De = self.edge_hidden_dim
        first = edge_skip_head_first(edge_attr, cat_e, L, cat_edge_dim, De)
        edge_exist = skip_head_mlp_tail(first[..., :De], De, 1, "edge_exist_mlp")
        edge_type = skip_head_mlp_tail(
            first[..., De:], De, self.edge_ch - 1, "edge_type_mlp"
        )
        edge_pred = jnp.concatenate([edge_exist, edge_type], axis=-1)
        # dense scatter-back == masking to real edges, then symmetrise
        # (ref :396-399)
        edge_final = edge_pred * edge_mask[..., None]
        edge_final = M.symmetrize_edges(edge_final)

        if self.pred_data:
            pos = pos * node_mask
        else:
            pos = (pos - xh[:, :, 0:3]) * node_mask

        # NaN guard: reference zeroes positions if any NaN (ref :407-409)
        pos = jnp.where(jnp.any(jnp.isnan(pos)), jnp.zeros_like(pos), pos)
        pos = M.remove_mean_with_mask(pos, node_mask)

        return jnp.concatenate([pos, atom_pred], axis=2), edge_final


def _cond_encoder_module(model) -> SpecFormer:
    """The SpecFormer submodule EXACTLY as DMT's in-graph call site
    constructs it (incl. the ``specformer_bf16`` dtype gate) — single source
    of truth for the hoisted encoding paths below, so the in-graph and
    out-of-graph encodings can't drift."""
    hidden = getattr(model, "hidden_dim", None) or getattr(model, "nf")
    return SpecFormer(
        patch_len=model.patch_len,
        stride=model.stride,
        output_dim=hidden,
        spectra_version=model.spectra_version,
        dtype=(
            model.dtype
            if getattr(model, "specformer_bf16", False)
            else jnp.float32
        ),
    )


def encode_context_train(model, params, batch_stats, context, rng):
    """Train-mode spectra encoding for the self-conditioning double call.

    Applies ``cond_encoder`` (SpecFormer) + ``cond_lin`` ONCE, in train mode
    (dropout active, BatchNorm statistics updated), on their parameter
    subtrees, so the loss can share one embedding between the no-grad
    self-conditioning forward and the main forward instead of running
    SpecFormer inside both (the reference's two train-mode forwards each
    re-encode the identical spectra, ref losses.py:341-354 — the only
    semantic difference here is one BatchNorm running-stats update per step
    instead of two identical ones, and decorrelated dropout draws).

    Gradients flow: this is a pure function of ``params``, called inside the
    loss, so the encoder trains end-to-end exactly as before.

    Returns ``(ctx_emb [B, time_dim], new_batch_stats)`` where
    ``new_batch_stats`` is ``batch_stats`` with the ``cond_encoder`` subtree
    replaced by the mutated statistics.
    """
    spec = _cond_encoder_module(model)
    sub = {"params": params["cond_encoder"]}
    if batch_stats and "cond_encoder" in batch_stats:
        sub["batch_stats"] = batch_stats["cond_encoder"]
    ctx, mut = spec.apply(
        sub, context, deterministic=False,
        rngs={"dropout": rng}, mutable=["batch_stats"],
    )
    lin = params["cond_lin"]
    ctx_emb = ctx @ lin["kernel"] + lin["bias"]
    new_stats = dict(batch_stats) if batch_stats else {}
    if "batch_stats" in mut:
        new_stats["cond_encoder"] = mut["batch_stats"]
    return ctx_emb, new_stats


def merge_encoder_stats(model_stats, encoder_stats):
    """Recombine batch statistics after a ``context_emb`` model call.

    When the model is called with a precomputed ``context_emb`` its
    SpecFormer submodule never executes, so (depending on the flax version's
    mutable-collection semantics) the returned ``batch_stats`` may carry a
    stale or missing ``cond_encoder`` subtree; overwrite it with the stats
    the out-of-graph encoder produced.
    """
    merged = dict(model_stats) if model_stats else {}
    if encoder_stats and "cond_encoder" in encoder_stats:
        merged["cond_encoder"] = encoder_stats["cond_encoder"]
    return merged


def encode_context(model: DMT, variables, context, deterministic: bool = True):
    """Precompute the spectra conditioning embedding ``[B, time_dim]``.

    Applies the DMT's ``cond_encoder`` (SpecFormer) + ``cond_lin`` submodules
    directly on their parameter subtrees so samplers can hoist the (time
    independent) spectra encoding out of the 1000-step reverse loop.
    """
    spec = _cond_encoder_module(model)
    sub = {"params": variables["params"]["cond_encoder"]}
    bstats = variables.get("batch_stats", {})
    if bstats and "cond_encoder" in bstats:
        sub["batch_stats"] = bstats["cond_encoder"]
    ctx = spec.apply(sub, context, deterministic=deterministic)
    lin = variables["params"]["cond_lin"]
    return ctx @ lin["kernel"] + lin["bias"]
