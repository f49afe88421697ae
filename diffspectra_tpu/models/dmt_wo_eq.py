"""DMT_WO_EQ: non-equivariant Diffusion Molecule Transformer ablation.

Dense TPU rewrite of ref models/dmt_wo_eq.py:67-950. Positions enter as
plain inputs through ``NodeEmbed`` (ref :629-643) and are predicted directly
by a ``pos_pred_mlp`` head (ref :709-717); rotation/translation robustness
comes from data augmentation instead of equivariance. Blocks drop the
coordinate update and the adjacency extra heads; attention has three
variants selectable by ``trans_ver``:

- 'v1'   per-head q/k/v with tanh edge key/value gating + out proj
         (ref TransLayer :67-169)
- 'v2'   fused qkv with ADDITIVE (untanh'd) edge key/value terms
         (ref TransLayerOptimV2 :172-266, the default)
- 'optim' fused qkv with tanh edge gating (ref TransLayerOptim :269-359)

Note: the reference computes ``extra_adj`` at the top level but its blocks
never consume it (ref :846 vs block signature :489); the dead computation is
dropped here.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import masks as M
from ..utils.registry import register_model
from .layers import (
    MASK_INF,
    CondGaussianLayer,
    GaussianLayer,
    LearnedSinusoidalPosEmb,
    edge_skip_head_first,
    skip_head_mlp_tail,
    modulate,
)
from .specformer import SpecFormer

_GBF_LAYERS = {"GaussianLayer": GaussianLayer, "CondGaussianLayer": CondGaussianLayer}


class DenseTransLayer(nn.Module):
    """Dense attention variants of ref dmt_wo_eq.py TransLayer*
    ('v1'/'v2'/'optim'); all include the output projection (ref :135,224,330)."""

    node_dim: int
    heads: int
    dropout: float = 0.0
    trans_ver: str = "v2"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_mask, deterministic=True):
        H = self.heads
        C = self.node_dim // H
        B, N, _ = x.shape
        x = x.astype(self.dtype)
        edge_attr = edge_attr.astype(self.dtype)

        if self.trans_ver == "v1":
            q = nn.Dense(H * C, dtype=self.dtype, name="lin_query")(x).reshape(B, N, H, C)
            k = nn.Dense(H * C, dtype=self.dtype, name="lin_key")(x).reshape(B, N, H, C)
            v = nn.Dense(H * C, dtype=self.dtype, name="lin_value")(x).reshape(B, N, H, C)
            e0 = jnp.tanh(
                nn.Dense(H * C, use_bias=False, dtype=self.dtype, name="lin_edge0")(edge_attr)
                .reshape(B, N, N, H, C)
            )
            e1 = jnp.tanh(
                nn.Dense(H * C, use_bias=False, dtype=self.dtype, name="lin_edge1")(edge_attr)
                .reshape(B, N, N, H, C)
            )
            alpha = jnp.einsum("bihc,bjhc,bijhc->bijh", q, k, e0).astype(jnp.float32) / math.sqrt(C)
            alpha = jnp.where(edge_mask[..., None] > 0, alpha, MASK_INF)
            alpha = jax.nn.softmax(alpha, axis=2).astype(self.dtype)
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
            out = jnp.einsum("bjhc,bijhc,bijh->bihc", v, e1, alpha)
        elif self.trans_ver == "v2":
            qkv = nn.Dense(H * C * 3, dtype=self.dtype, name="lin_qkv")(x).reshape(B, N, H, 3, C)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
            ekv = nn.Dense(H * C * 2, use_bias=False, dtype=self.dtype, name="lin_kv_e")(edge_attr)
            ekv = ekv.reshape(B, N, N, H, 2, C)
            ek, ev = ekv[..., 0, :], ekv[..., 1, :]
            # alpha_ij = q_i . (k_j + ek_ij) / sqrt(C) (ref :240-250)
            alpha = (
                jnp.einsum("bihc,bjhc->bijh", q, k)
                + jnp.einsum("bihc,bijhc->bijh", q, ek)
            ).astype(jnp.float32) / math.sqrt(C)
            alpha = jnp.where(edge_mask[..., None] > 0, alpha, MASK_INF)
            alpha = jax.nn.softmax(alpha, axis=2).astype(self.dtype)
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
            out = jnp.einsum("bijh,bjhc->bihc", alpha, v) + jnp.einsum(
                "bijh,bijhc->bihc", alpha, ev
            )
        elif self.trans_ver == "optim":
            qkv = nn.Dense(H * C * 3, dtype=self.dtype, name="lin_qkv")(x).reshape(B, N, H, 3, C)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
            ekv = jnp.tanh(
                nn.Dense(H * C * 2, use_bias=False, dtype=self.dtype, name="lin_edge")(edge_attr)
            ).reshape(B, N, N, H, 2, C)
            ek, ev = ekv[..., 0, :], ekv[..., 1, :]
            alpha = jnp.einsum("bihc,bjhc,bijhc->bijh", q, k, ek).astype(jnp.float32) / math.sqrt(C)
            alpha = jnp.where(edge_mask[..., None] > 0, alpha, MASK_INF)
            alpha = jax.nn.softmax(alpha, axis=2).astype(self.dtype)
            alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
            out = jnp.einsum("bjhc,bijhc,bijh->bihc", v, ev, alpha)
        else:
            raise ValueError(f"unknown trans_ver {self.trans_ver!r}")

        out = out.reshape(B, N, H * C).astype(self.dtype)
        return nn.Dense(H * C, dtype=self.dtype, name="proj")(out).astype(jnp.float32)


class DMTWoEqBlock(nn.Module):
    """Transformer block without coordinate update
    (ref DMT_WO_EQ_Block :386-626)."""

    node_dim: int
    edge_dim: int
    time_dim: int
    num_heads: int
    cond_time: bool = True
    mlp_ratio: int = 2
    dropout: float = 0.0
    pair_update: bool = True
    trans_ver: str = "v2"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, h, edge_attr, node_mask, edge_mask,
        node_time_emb=None, edge_time_emb=None, deterministic=True,
    ):
        h_in_node = h
        h_in_edge = edge_attr

        affine = not self.cond_time  # ref :449-473
        ln = lambda name: nn.LayerNorm(
            use_bias=affine, use_scale=affine, epsilon=1e-6, name=name
        )
        dropout = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)

        def ff_node(x):
            x = dropout(nn.gelu(nn.Dense(self.node_dim * self.mlp_ratio, dtype=self.dtype, name="ff_linear1")(x)))
            return dropout(nn.Dense(self.node_dim, dtype=self.dtype, name="ff_linear2")(x).astype(jnp.float32))

        def ff_edge(x):
            x = dropout(nn.gelu(nn.Dense(self.edge_dim * self.mlp_ratio, dtype=self.dtype, name="ff_linear3")(x)))
            return dropout(nn.Dense(self.edge_dim, dtype=self.dtype, name="ff_linear4")(x).astype(jnp.float32))

        if self.cond_time:
            node_mods = jnp.split(
                nn.Dense(self.node_dim * 6, name="node_time_mlp")(
                    nn.silu(node_time_emb)
                ), 6, axis=-1,
            )
            (n_shift_msa, n_scale_msa, n_gate_msa, n_shift_mlp, n_scale_mlp,
             n_gate_mlp) = [m[:, None, :] for m in node_mods]
            h = modulate(ln("norm1_node")(h), n_shift_msa, n_scale_msa)
            if self.pair_update:
                edge_mods = jnp.split(
                    nn.Dense(self.edge_dim * 6, name="edge_time_mlp")(
                        nn.silu(edge_time_emb)
                    ), 6, axis=-1,
                )
                (e_shift_msa, e_scale_msa, e_gate_msa, e_shift_mlp, e_scale_mlp,
                 e_gate_mlp) = [m[:, None, None, :] for m in edge_mods]
                edge_attr = modulate(
                    ln("norm1_edge")(edge_attr), e_shift_msa, e_scale_msa
                )
        else:
            h = ln("norm1_node")(h)
            if self.pair_update:
                edge_attr = ln("norm1_edge")(edge_attr)

        h_node = DenseTransLayer(
            self.node_dim, self.num_heads, dropout=self.dropout,
            trans_ver=self.trans_ver, dtype=self.dtype, name="attn_mpnn",
        )(h, edge_attr, edge_mask, deterministic=deterministic)
        h_node = h_node * node_mask  # padded rows carry no attention output

        # node update (ref node_update :580-601)
        if self.cond_time:
            h_node_res = h_in_node + n_gate_msa * h_node
            _h = modulate(ln("norm2_node")(h_node_res), n_shift_mlp, n_scale_mlp)
            h_out = h_node_res + n_gate_mlp * ff_node(_h)
        else:
            h_node_res = h_in_node + h_node
            h_out = h_node_res + ff_node(ln("norm2_node")(h_node_res))

        # edge update with CONCAT pair features (ref :537-540,604-626).
        # concat([h_i,h_j]) @ W == h_i @ W_top + h_j @ W_bot: per-node matmuls
        # broadcast-added, no [B,N,N,2D] materialisation (linearity identity).
        if self.pair_update:
            B, N, D = h_node.shape
            n2e_kernel = self.param(
                "node2edge_kernel", nn.initializers.lecun_normal(),
                (2 * D, self.edge_dim), jnp.float32,
            )
            n2e_bias = self.param(
                "node2edge_bias", nn.initializers.zeros, (self.edge_dim,),
                jnp.float32,
            )
            hk = h_node.astype(self.dtype)
            k_dt = n2e_kernel.astype(self.dtype)
            proj_i = (hk @ k_dt[:D]).astype(jnp.float32)
            proj_j = (hk @ k_dt[D:]).astype(jnp.float32)
            h_edge = proj_i[:, :, None, :] + proj_j[:, None, :, :] + n2e_bias
            if self.cond_time:
                h_edge_res = h_in_edge + e_gate_msa * h_edge
                _e = modulate(ln("norm2_edge")(h_edge_res), e_shift_mlp, e_scale_mlp)
                h_edge_out = h_edge_res + e_gate_mlp * ff_edge(_e)
            else:
                h_edge_res = h_in_edge + h_edge
                h_edge_out = h_edge_res + ff_edge(ln("norm2_edge")(h_edge_res))
        else:
            h_edge_out = h_in_edge

        return h_out, h_edge_out


class NodeEmbed(nn.Module):
    """Joint feature+position embedding (ref :629-643)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, pos):
        xe = nn.Dense(self.hidden_size * 2, name="x_linear")(x)
        pe = nn.Dense(self.hidden_size * 2, name="pos_linear")(pos)
        return nn.Dense(self.hidden_size, name="mlp_out")(nn.gelu(xe + pe))


class _WoEqBlockWithCollect(nn.Module):
    """scan body: one DMTWoEqBlock + skip-concat projections."""

    node_dim: int
    edge_dim: int
    time_dim: int
    num_heads: int
    cond_time: bool
    mlp_ratio: int
    dropout: float
    trans_ver: str
    dtype: jnp.dtype
    cat_node_dim: int
    cat_edge_dim: int
    deterministic: bool

    @nn.compact
    def __call__(self, carry, _):
        h, edge_attr, node_mask, edge_mask, node_time_emb, edge_time_emb = carry
        h, edge_attr = DMTWoEqBlock(
            self.node_dim, self.edge_dim, self.time_dim, self.num_heads,
            cond_time=self.cond_time, mlp_ratio=self.mlp_ratio,
            dropout=self.dropout, pair_update=True, trans_ver=self.trans_ver,
            dtype=self.dtype, name="dmt_block",
        )(
            h, edge_attr, node_mask, edge_mask, node_time_emb, edge_time_emb,
            deterministic=self.deterministic,
        )
        cat_h = nn.Dense(self.cat_node_dim, name="node_proj")(h)
        cat_e = nn.Dense(self.cat_edge_dim, name="edge_proj")(edge_attr)
        return (h, edge_attr, node_mask, edge_mask, node_time_emb, edge_time_emb), (cat_h, cat_e)


@register_model(name="DMT_WO_EQ")
class DMT_WO_EQ(nn.Module):
    """Non-equivariant DMT (ref models/dmt_wo_eq.py:646-950). Same call
    signature as DMT."""

    in_node_dim: int = 6
    hidden_dim: int = 256
    edge_hidden_dim: int = 64
    edge_ch: int = 2
    n_heads: int = 16
    n_layers: int = 8
    dropout: float = 0.1
    cond_time: bool = True
    dist_gbf: bool = True
    gbf_name: str = "CondGaussianLayer"
    edge_quan_th: float = 0.0
    mlp_ratio: int = 2
    spatial_cut_off: float = 2.0
    pred_data: bool = True
    trans_ver: str = "v2"
    spectra_version: str = "ir"
    patch_len: tuple = (20, 50, 50)
    stride: tuple = (10, 25, 25)
    dtype: jnp.dtype = jnp.float32
    # see models/dmt.py: 1 = rolled (training default), n_layers = fully
    # unrolled (fast inference). Checkpoint-compatible across settings.
    scan_unroll: int = 1
    # block-scan backward remat policy ('full' | 'dots'), see models/dmt.py
    remat_policy: str = "full"

    @staticmethod
    def from_config(config):
        dtype = (
            jnp.bfloat16
            if config.training.get("matmul_precision", "") == "bfloat16"
            else jnp.float32
        )
        return DMT_WO_EQ(
            dtype=dtype,
            scan_unroll=int(config.model.get("scan_unroll", 1)),
            remat_policy=str(config.model.get("remat_policy", "full")),
            in_node_dim=config.data.atom_types + int(config.model.include_fc_charge),
            hidden_dim=config.model.nf,
            edge_hidden_dim=config.model.nf // 4,
            edge_ch=config.model.edge_ch,
            n_heads=config.model.n_heads,
            n_layers=config.model.n_layers,
            dropout=config.model.dropout,
            cond_time=config.model.cond_time,
            dist_gbf=config.model.dist_gbf,
            gbf_name=config.model.gbf_name,
            edge_quan_th=config.model.edge_quan_th,
            mlp_ratio=config.model.mlp_ratio,
            spatial_cut_off=config.model.spatial_cut_off,
            pred_data=config.model.pred_data,
            trans_ver=config.model.get("trans_ver", "v2"),
            spectra_version=config.data.spectra_version,
            patch_len=tuple(config.model.patch_len),
            stride=tuple(config.model.stride),
        )

    @nn.compact
    def __call__(
        self, t, xh, node_mask, edge_mask, context=None, *,
        edge_x, noise_level=None, cond_x=None, cond_edge_x=None,
        has_cond=False, context_emb=None, deterministic: bool = True, **kwargs,
    ):
        B, N, _ = xh.shape
        time_dim = self.hidden_dim * 4
        dist_dim = self.edge_hidden_dim if self.dist_gbf else 1

        pos_init = xh[:, :, 0:3]
        h_feat = xh[:, :, 3:]

        if cond_x is None:
            cond_x = jnp.zeros_like(xh)
            cond_edge_x = jnp.zeros_like(edge_x)
            has_cond = jnp.asarray(False)
        has_cond = jnp.asarray(has_cond)
        cond_pos = cond_x[:, :, 0:3]
        cond_h = cond_x[:, :, 3:]

        node_inputs = jnp.concatenate([h_feat, cond_h], axis=-1)
        h = NodeEmbed(self.hidden_dim, name="node_emb")(node_inputs, pos_init)

        if context_emb is not None:
            ctx = context_emb
        elif context is not None:
            ctx = SpecFormer(
                patch_len=self.patch_len,
                stride=self.stride,
                output_dim=self.hidden_dim,
                spectra_version=self.spectra_version,
                name="cond_encoder",
            )(context, deterministic=deterministic)
            ctx = nn.Dense(time_dim, name="cond_lin")(ctx)
        else:
            ctx = None

        if self.cond_time:
            temb = LearnedSinusoidalPosEmb(16, name="time_emb")(noise_level)
            temb = nn.Dense(time_dim, name="time_mlp_1")(temb)
            temb = nn.gelu(temb)
            temb = nn.Dense(time_dim, name="time_mlp_2")(temb)
            time_emb = temb + ctx if ctx is not None else temb
            node_time_emb = time_emb
            edge_time_emb = time_emb
        else:
            node_time_emb = edge_time_emb = None

        distances_raw, _cond_adj_spatial = M.coord2diff_adj_dense(
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

        edge_attr = jnp.concatenate([edge_x, cond_edge_x, distances], axis=-1)
        edge_attr = nn.Dense(self.edge_hidden_dim, name="edge_emb")(edge_attr)

        cat_node_dim = (self.hidden_dim * 2) // self.n_layers
        cat_edge_dim = (self.edge_hidden_dim * 2) // self.n_layers

        # nn.scan + nn.remat over the identical blocks (see models/dmt.py):
        # one compiled block, stacked params, rematerialised backward
        if self.remat_policy not in ("full", "dots", "none"):
            raise ValueError(f"unknown remat_policy: {self.remat_policy!r}")
        if self.remat_policy == "none":
            block_cls = _WoEqBlockWithCollect
        else:
            remat_policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if self.remat_policy == "dots"
                else None
            )
            block_cls = nn.remat(_WoEqBlockWithCollect, policy=remat_policy)
        ScannedBlocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layers,
            unroll=self.scan_unroll,
        )
        carry = (h, edge_attr, node_mask, edge_mask, node_time_emb, edge_time_emb)
        carry, (cat_h, cat_e) = ScannedBlocks(
            node_dim=self.hidden_dim,
            edge_dim=self.edge_hidden_dim,
            time_dim=time_dim,
            num_heads=self.n_heads,
            cond_time=self.cond_time,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            trans_ver=self.trans_ver,
            dtype=self.dtype,
            cat_node_dim=cat_node_dim,
            cat_edge_dim=cat_edge_dim,
            deterministic=deterministic,
            name="blocks",
        )(carry, None)

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
        # direct position head (ref pos_pred_mlp :709-717)
        pos_pred = nn.Dense(self.hidden_dim, use_bias=False, name="pos_pred_mlp_0")(
            atom_hids
        )
        pos_pred = jnp.tanh(pos_pred)
        pos_pred = nn.Dense(3, use_bias=False, name="pos_pred_mlp_1")(pos_pred)
        pos_pred = pos_pred * node_mask

        # Edge skip-concat heads without the HBM round trips (shared helper;
        # see layers.edge_skip_head_first for the exact-math argument)
        De = self.edge_hidden_dim
        first = edge_skip_head_first(edge_attr, cat_e, L, cat_edge_dim, De)
        edge_exist = skip_head_mlp_tail(first[..., :De], De, 1, "edge_exist_mlp")
        edge_type = skip_head_mlp_tail(
            first[..., De:], De, self.edge_ch - 1, "edge_type_mlp"
        )
        edge_pred = jnp.concatenate([edge_exist, edge_type], axis=-1)
        edge_final = M.symmetrize_edges(edge_pred * edge_mask[..., None])

        pos_pred = jnp.where(
            jnp.any(jnp.isnan(pos_pred)), jnp.zeros_like(pos_pred), pos_pred
        )
        pos_pred = M.remove_mean_with_mask(pos_pred, node_mask)

        return jnp.concatenate([pos_pred, atom_pred], axis=2), edge_final
