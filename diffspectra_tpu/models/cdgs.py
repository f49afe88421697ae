"""CDGS: 2D graph noise-prediction model with hybrid local/global message
passing and random-walk structural encodings.

Dense TPU rewrite of ref models/cdgs.py:14-460. The reference's
``HybridMPBlock`` combines a PyG GINEConv local MPNN over discretised-
adjacency edges with a full-graph ``EdgeGateTransLayer``; here both paths
are masked dense ops: GINE becomes a masked adjacency-weighted message sum
(GINEConv: ``(1+eps) x_i + sum_j relu(x_j + e_ij)`` through an MLP) and the
global attention is ``DenseEdgeGateTransLayer``. RWSE and shortest-path
features are the dense matmuls from utils.masks.get_rw_feat_dense.

All conv1x1 layers over ``[B, C, N, N]`` become Dense layers over the
trailing feature axis of ``[B, N, N, C]`` (identical math, TPU layout).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import masks as M
from ..utils.registry import register_model
from .layers import DenseEdgeGateTransLayer, sinusoidal_timestep_embedding
from .specformer import SpecFormer


class DenseGINE(nn.Module):
    """Masked dense GINEConv: out_i = mlp((1+eps) x_i + sum_j adj_ij
    relu(x_j + e_ij)) (PyG GINEConv semantics, ref cdgs.py:40-42)."""

    dim_h: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, adj):
        eps = self.param("eps", nn.initializers.zeros, ())
        x = x.astype(self.dtype)
        msgs = jax.nn.relu(x[:, None, :, :] + edge_attr.astype(self.dtype))
        agg = jnp.einsum("bij,bijd->bid", adj.astype(self.dtype), msgs)
        out = (1 + eps) * x + agg
        out = nn.Dense(self.dim_h, dtype=self.dtype, name="gin_nn_0")(out)
        out = jax.nn.relu(out)
        return nn.Dense(self.dim_h, dtype=self.dtype, name="gin_nn_1")(out).astype(
            jnp.float32
        )


class GroupNormChannels(nn.Module):
    """GroupNorm over the trailing channel axis (torch GroupNorm semantics,
    ref cdgs.py:63-76: num_groups=min(C//4, 32))."""

    channels: int

    @nn.compact
    def __call__(self, x):
        groups = min(self.channels // 4, 32)
        return nn.GroupNorm(num_groups=groups, epsilon=1e-6)(x)


class HybridMPBlock(nn.Module):
    """Local GINE + full-graph edge-gated attention (ref cdgs.py:14-151)."""

    dim_h: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, dense_edge, adj, node_mask, edge_mask, temb=None, deterministic=True
    ):
        """x [B,N,D], dense_edge [B,N,N,D], adj (discretised) [B,N,N],
        node_mask [B,N,1], edge_mask [B,N,N]."""
        B, N, D = x.shape
        h_in1 = x
        h_in2 = dense_edge
        adj_mask = edge_mask[..., None]

        if temb is not None:
            temb_act = nn.silu(temb.astype(self.dtype))
            h_edge = (
                dense_edge
                + nn.Dense(self.dim_h, dtype=self.dtype, name="t_edge")(temb_act)[
                    :, None, None, :
                ].astype(dense_edge.dtype)
            ) * adj_mask
            h = (
                x
                + nn.Dense(self.dim_h, dtype=self.dtype, name="t_node")(temb_act)[
                    :, None, :
                ].astype(x.dtype)
            ) * node_mask
        else:
            h_edge = dense_edge
            h = x

        drop = lambda v: nn.Dropout(self.dropout)(v, deterministic=deterministic)

        # local GINE over the discretised adjacency (ref :117-122)
        h_local = DenseGINE(self.dim_h, dtype=self.dtype, name="local_model")(
            h, h_edge, adj
        )
        h_local = h_local * node_mask
        h_local = h_in1 + drop(h_local)
        h_local = GroupNormChannels(self.dim_h, name="norm1_local")(h_local)

        # global attention over all real pairs (ref :125-136)
        h_attn = DenseEdgeGateTransLayer(
            self.dim_h, self.dim_h // self.num_heads, heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype, name="self_attn",
        )(h, h_edge, edge_mask, deterministic=deterministic)
        h_attn = h_attn * node_mask
        h_attn = h_in1 + drop(h_attn)
        h_attn = GroupNormChannels(self.dim_h, name="norm1_attn")(h_attn)

        h = (h_local + h_attn) * node_mask
        h_edge = h[:, :, None, :] + h[:, None, :, :]

        def ff_node(v):
            v = v.astype(self.dtype)
            v = drop(nn.silu(nn.Dense(self.dim_h * 2, dtype=self.dtype, name="ff_linear1")(v)))
            return drop(nn.Dense(self.dim_h, dtype=self.dtype, name="ff_linear2")(v).astype(jnp.float32))

        def ff_edge(v):
            v = v.astype(self.dtype)
            v = drop(nn.silu(nn.Dense(self.dim_h * 2, dtype=self.dtype, name="ff_linear3")(v)))
            return drop(nn.Dense(self.dim_h, dtype=self.dtype, name="ff_linear4")(v).astype(jnp.float32))

        h = h + ff_node(h)
        h = GroupNormChannels(self.dim_h, name="norm2_node")(h) * node_mask

        h_edge = h_in2 + ff_edge(h_edge)
        h_edge = GroupNormChannels(self.dim_h, name="norm2_edge")(h_edge) * adj_mask
        return h, h_edge


@register_model(name="CDGS")
class CDGS(nn.Module):
    """2D graph noise-prediction model (ref models/cdgs.py:202-460).

    Same call surface as DMT, but ``xh`` has no positions (atom features
    only) and the model predicts noise scores for atoms and bonds.
    """

    atom_ch: int = 5
    nf: int = 256
    n_layers: int = 8
    n_heads: int = 8
    dropout: float = 0.0
    cond_time: bool = True
    rw_depth: int = 8
    edge_ch: int = 2
    centered: bool = True
    spectra_version: str = "ir"
    patch_len: tuple = (20, 50, 50)
    stride: tuple = (10, 25, 25)
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_config(config):
        dtype = (
            jnp.bfloat16
            if config.training.get("matmul_precision", "") == "bfloat16"
            else jnp.float32
        )
        return CDGS(
            dtype=dtype,
            atom_ch=config.data.atom_types,
            nf=config.model.nf,
            n_layers=config.model.n_layers,
            n_heads=config.model.n_heads,
            dropout=config.model.dropout,
            cond_time=config.model.cond_time,
            rw_depth=config.model.get("rw_depth", 8),
            edge_ch=config.model.edge_ch,
            centered=config.data.centered,
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
        atom_feat = xh
        bond_feat = edge_x  # [B, N, N, C]
        time_cond = t * 999.0  # ref :334

        edge_exist = bond_feat[..., 0:1]
        edge_cate = bond_feat[..., 1:]

        temb = sinusoidal_timestep_embedding(time_cond, self.nf)

        if context_emb is not None:
            ctx = context_emb
        elif context is not None:
            ctx = SpecFormer(
                patch_len=self.patch_len, stride=self.stride, output_dim=self.nf,
                spectra_version=self.spectra_version,
                name="cond_encoder",
            )(context, deterministic=deterministic)
            ctx = nn.Dense(self.nf, name="cond_lin")(ctx)
        else:
            ctx = 0.0

        if self.cond_time:
            temb = nn.Dense(self.nf * 2, name="temb_0")(temb)
            temb = nn.Dense(self.nf, name="temb_1")(nn.silu(temb)) + ctx
        else:
            temb = None

        if not self.centered:
            atom_feat = atom_feat * 2.0 - 1.0
            bond_feat = bond_feat * 2.0 - 1.0

        # discretised adjacency (ref :374-378: exist channel >= 0 -> 1)
        adj = jax.lax.stop_gradient(
            (edge_exist[..., 0] >= 0.0).astype(xh.dtype) * edge_mask
        )

        # RWSE + shortest-path distance one-hot (ref get_rw_feat :160-184)
        deg = jnp.sum(adj, axis=-1, keepdims=True)
        ad = adj / (deg + 1e-8)
        rws = [ad]
        for _ in range(self.rw_depth):
            rws.append(jnp.einsum("bij,bjk->bik", rws[-1], ad))
        rw_map = jnp.stack(rws[1:], axis=1)  # [B, k, N, N]
        rw_landing = jnp.diagonal(rw_map, axis1=2, axis2=3)  # [B, k, N]
        rw_landing = jnp.swapaxes(rw_landing, 1, 2)  # [B, N, k]
        spd_ind = jnp.sum(jnp.sort(rw_map, axis=1) <= 0, axis=1)
        spd_onehot = jax.nn.one_hot(spd_ind, self.rw_depth + 1, dtype=xh.dtype)
        rw_landing = jax.lax.stop_gradient(rw_landing)
        spd_onehot = jax.lax.stop_gradient(spd_onehot)

        bond_se_ch = int(self.nf * 0.4)
        bond_type_ch = int(0.5 * (self.nf - bond_se_ch))
        adj_mask = edge_mask[..., None]
        dense_cate = nn.Dense(
            bond_type_ch, dtype=self.dtype, name="proj_cate"
        )(edge_cate.astype(self.dtype)) * adj_mask
        dense_exist = nn.Dense(
            bond_type_ch, dtype=self.dtype, name="proj_exist"
        )(edge_exist.astype(self.dtype)) * adj_mask
        dense_spd = nn.Dense(
            bond_se_ch, dtype=self.dtype, name="proj_spd"
        )(spd_onehot.astype(self.dtype)) * adj_mask
        dense_edge = nn.Dense(self.nf, dtype=self.dtype, name="proj_edge")(
            jnp.concatenate([dense_cate, dense_exist, dense_spd], axis=-1)
        ).astype(jnp.float32) * adj_mask

        atom_se_ch = int(self.nf * 0.2)
        atom_type_ch = self.nf - 2 * atom_se_ch
        atom_degree = jnp.sum(bond_feat, axis=2)  # [B, N, C] (ref :395)
        atom_degree = nn.Dense(atom_se_ch, name="proj_degree")(atom_degree)
        atom_cate = nn.Dense(atom_type_ch, name="proj_atom")(atom_feat)
        x_rwl = nn.Dense(atom_se_ch, name="proj_rwl")(rw_landing)
        h_atom = nn.Dense(self.nf, name="proj_node")(
            jnp.concatenate([atom_degree, atom_cate, x_rwl], axis=-1)
        )

        cat_dim = (self.nf * 2) // self.n_layers
        atom_hids = []
        bond_hids = []
        h_dense_edge = dense_edge
        for i in range(self.n_layers):
            h_atom, h_dense_edge = HybridMPBlock(
                self.nf, self.n_heads, dropout=self.dropout, dtype=self.dtype,
                name=f"block_{i}",
            )(
                h_atom, h_dense_edge, adj, node_mask, edge_mask, temb,
                deterministic=deterministic,
            )
            atom_hids.append(nn.Dense(cat_dim, name=f"node_{i}")(h_atom))
            bond_hids.append(nn.Dense(cat_dim, name=f"edge_{i}")(h_dense_edge))

        atom_hids = jnp.concatenate(atom_hids, axis=-1)
        bond_hids = jnp.concatenate(bond_hids, axis=-1)

        # atom score head (ref :427-433)
        atom_score = nn.silu(
            nn.Dense(self.nf, name="atom_out_0")(
                jnp.concatenate([atom_cate, atom_hids], axis=-1)
            )
        ) * node_mask
        atom_score = nn.silu(nn.Dense(self.nf // 2, name="atom_out_1")(atom_score))
        atom_score = nn.Dense(self.atom_ch, name="atom_out_2")(atom_score)

        # bond + exist score heads (ref :435-453)
        bond_in = jnp.concatenate([dense_cate, bond_hids], axis=-1)
        bond_score = nn.silu(nn.Dense(self.nf, name="bond_out_0")(bond_in)) * adj_mask
        bond_score = nn.silu(nn.Dense(self.nf // 2, name="bond_out_1")(bond_score))
        bond_score = nn.Dense(self.edge_ch - 1, name="bond_out_2")(bond_score)

        exist_in = jnp.concatenate([dense_exist, bond_hids], axis=-1)
        exist_score = nn.silu(nn.Dense(self.nf, name="exist_out_0")(exist_in)) * adj_mask
        exist_score = nn.silu(nn.Dense(self.nf // 2, name="exist_out_1")(exist_score))
        exist_score = nn.Dense(1, name="exist_out_2")(exist_score)

        bond_score = jnp.concatenate([exist_score, bond_score], axis=-1)
        bond_score = M.symmetrize_edges(bond_score)

        atom_score = atom_score * node_mask
        bond_score = bond_score * adj_mask
        return atom_score, bond_score
