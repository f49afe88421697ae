"""Shared dense graph-transformer layers.

TPU-native dense rewrites of the reference's PyG ``MessagePassing`` layers
(ref: models/layers.py). Where the reference runs scatter-softmax over a
sparse ``[2, E]`` edge list, these layers compute masked dense attention over
the full ``[B, N, N]`` pair grid — with N <= 29 this is exactly what the MXU
wants, and the sparse machinery (torch_scatter / torch_geometric) disappears.

Masking contract: ``edge_mask [B, N, N]`` is 1 on real off-diagonal pairs.
Masked pairs get logits of ``MASK_INF`` so they vanish from the softmax, which
is numerically identical to the reference's softmax over the real-edge set.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

# More negative than the reference's -1e10 "adjacency zero" logit so that
# padded pairs are excluded even when every real logit is -1e10
# (ref: models/layers.py:169-176).
MASK_INF = -1e30


def modulate(x, shift, scale):
    """adaLN modulation (ref: models/dmt.py:13-14)."""
    return x * (1 + scale) + shift


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned sinusoidal time embedding (ref: models/layers.py:273-288).

    in: ``[B]`` -> out: ``[B, dim + 1]`` = [x, sin(2 pi x w), cos(2 pi x w)].
    """

    dim: int = 16

    @nn.compact
    def __call__(self, x):
        assert self.dim % 2 == 0
        half_dim = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0), (half_dim,))
        x = x[..., None]
        freqs = x * weights[None, :] * 2 * math.pi
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def _gaussian(x, mean, std):
    # ref models/layers.py:291-295 (uses pi = 3.14159, kept for parity)
    pi = 3.14159
    a = (2 * pi) ** 0.5
    return jnp.exp(-0.5 * (((x - mean) / std) ** 2)) / (a * std)


class GaussianLayer(nn.Module):
    """Gaussian basis features for squared distances (ref: models/layers.py:298-311).

    in: ``[..., 1]`` -> out: ``[..., K]`` = [x, gauss(x; means, stds)].
    """

    K: int
    time_dim: int = 0  # unused; kept for constructor parity

    @nn.compact
    def __call__(self, x, time_emb=None, export_params=False):
        k = self.K - 1
        means = self.param("means", nn.initializers.uniform(3.0), (k,))
        stds = self.param("stds", nn.initializers.uniform(3.0), (k,))
        if export_params:
            # whole-block Pallas path (ops/pallas_block.py): hand the basis
            # params to the kernel; no time conditioning in this variant
            zeros = jnp.zeros((x.shape[0],), jnp.float32)
            return means, stds, zeros, zeros
        std = jnp.abs(stds) + 1e-5
        return jnp.concatenate([x, _gaussian(x, means, std)], axis=-1)


class CondGaussianLayer(nn.Module):
    """Gaussian basis features with time-conditioned scale/shift of the input
    distance (ref: models/layers.py:314-334).

    ``x [B, N, N, 1]``, ``time_emb [B, time_dim]``.
    """

    K: int
    time_dim: int

    @nn.compact
    def __call__(self, x, time_emb=None, export_params=False):
        k = self.K - 1
        means = self.param("means", nn.initializers.uniform(3.0), (k,))
        stds = self.param("stds", nn.initializers.uniform(3.0), (k,))
        if export_params:
            # whole-block Pallas path: the kernel applies the basis on the
            # pair grid; only the node-level time MLP runs here
            ss = nn.Dense(2, name="time_mlp")(nn.silu(time_emb))
            return means, stds, ss[:, 0], ss[:, 1]
        if time_emb is not None:
            ss = nn.Dense(2, name="time_mlp")(nn.silu(time_emb))  # [B, 2]
            scale, shift = ss[:, 0], ss[:, 1]
            bshape = (-1,) + (1,) * (x.ndim - 1)
            x = x * (scale.reshape(bshape) + 1) + shift.reshape(bshape)
        std = jnp.abs(stds) + 1e-5
        return jnp.concatenate([x, _gaussian(x, means, std)], axis=-1)


class DenseParams(nn.Module):
    """Declare nn.Dense-shaped parameters (kernel[, bias]) WITHOUT applying
    them, under the exact variable names/inits nn.Dense would use — so one
    parameter set (and existing checkpoints) can be shared between an XLA
    path that applies them with a plain matmul and a Pallas kernel path
    that consumes the raw arrays."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class CoorsNorm(nn.Module):
    """Normalise coordinate vectors to unit length times a learned scale
    (ref: models/layers.py:337-347)."""

    eps: float = 1e-8
    scale_init: float = 1.0

    @nn.compact
    def __call__(self, coors):
        scale = self.param(
            "scale", nn.initializers.constant(self.scale_init), (1,)
        )
        # Safe normalisation: the dense pair grid contains exactly-zero
        # difference vectors (diagonal) whose norm gradient would be NaN;
        # the double-where pattern keeps both value and gradient clean there
        # (those entries are masked downstream, but 0 * NaN = NaN in VJPs).
        sq = jnp.sum(coors * coors, axis=-1, keepdims=True)
        is_zero = sq <= self.eps * self.eps
        norm = jnp.sqrt(jnp.where(is_zero, 1.0, sq))
        normed = jnp.where(is_zero, 0.0, coors / jnp.maximum(norm, self.eps))
        return normed * scale


class DenseTransMixLayer(nn.Module):
    """Dense masked multi-head attention with edge-feature key/value gating
    and extra adjacency-logit heads.

    Dense rewrite of ``TransMixLayer`` (ref: models/layers.py:92-191):

    - ``heads`` total heads of dimension ``out_channels``; the first
      ``extra_heads`` attention maps are raw adjacency logits (0 -> -1e10 when
      ``set_inf``), the remaining ``sub_heads`` are learned with q/k computed
      in ``sub_channels = heads*out_channels // sub_heads`` dims.
    - learned logits: ``sum_c q_i k_j tanh(E0 e_ij) / sqrt(out_channels)``.
    - message: ``v_j * tanh(E1 e_ij) * alpha_ij`` summed over j.

    Inputs: ``x [B, N, D]``, ``edge_attr [B, N, N, De]``,
    ``extra_heads [B, N, N, n_extra]``, ``edge_mask [B, N, N]``.
    Output: ``[B, N, heads * out_channels]``.
    """

    x_channels: int
    out_channels: int
    extra_heads: int = 2
    heads: int = 4
    dropout: float = 0.0
    set_inf: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, edge_attr, extra_heads, edge_mask,
                 deterministic=True, export_for_block=False):
        H = self.heads
        E = H - self.extra_heads  # sub (learned) heads
        C = self.out_channels
        sub_c = (H * C) // E

        # expand extra heads channel-wise if fewer provided (ref :140-144)
        n_cur = extra_heads.shape[-1]
        if not export_for_block and n_cur != self.extra_heads:
            n_expand = self.extra_heads // n_cur
            extra_heads = jnp.repeat(extra_heads, n_expand, axis=-1)

        B, N, _ = x.shape
        dense = lambda f, name, bias=True: nn.Dense(
            f, use_bias=bias, dtype=self.dtype, name=name
        )
        query = dense(E * sub_c, "lin_query")(x).reshape(B, N, E, sub_c)
        key = dense(E * sub_c, "lin_key")(x).reshape(B, N, E, sub_c)
        value = dense(H * C, "lin_value")(x).reshape(B, N, H, C)

        # edge gate projections: explicit kernels shared by both paths
        w0 = self.param(
            "lin_edge0_kernel", nn.initializers.lecun_normal(),
            (edge_attr.shape[-1], E * sub_c), jnp.float32,
        )
        w1 = self.param(
            "lin_edge1_kernel", nn.initializers.lecun_normal(),
            (edge_attr.shape[-1], H * C), jnp.float32,
        )

        if export_for_block:
            # whole-block Pallas path (ops/pallas_block.py): q/k/v are
            # node-level (computed here, XLA), the edge-gate kernels go to
            # the fused kernel raw; ``edge_attr`` was only a shape donor.
            return (
                query.reshape(B, N, E * sub_c),
                key.reshape(B, N, E * sub_c),
                value.reshape(B, N, H * C),
                w0, w1,
            )

        # fused Pallas kernel: projection+tanh+logits+softmax+sum in VMEM
        # (no attention-weight dropout inside — jnp path when dropout active)
        if self.use_pallas and (deterministic or self.dropout == 0.0):
            from ..ops.pallas_attention import mix_attention

            out = mix_attention(
                query, key, value,
                edge_attr.astype(self.dtype),
                w0.astype(self.dtype), w1.astype(self.dtype),
                extra_heads, edge_mask, set_inf=self.set_inf,
            )
            return out  # [B, N, H*C] f32

        # Two separate gate matmuls, NOT one concatenated [De, E*sub_c+H*C]
        # kernel: the merged variant (round-2 commit 71d24b0) forced the
        # [B,N,N,508] e01 product to materialise in HBM before the slices,
        # while the split products each fuse their tanh into the consumer
        # einsum — measured 64s -> 76s per 1280-mol eval sweep on v5e
        # (bisect record: RESULTS.md round-3 throughput note).
        e0 = (edge_attr.astype(self.dtype) @ w0.astype(self.dtype))
        e0 = jnp.tanh(e0.reshape(B, N, N, E, sub_c))
        e1 = (edge_attr.astype(self.dtype) @ w1.astype(self.dtype))
        e1 = jnp.tanh(e1.reshape(B, N, N, H, C))

        # learned logits, scaled by sqrt(out_channels) as the reference does
        # (ref :167 — NOT sqrt(sub_channels))
        alpha_learned = jnp.einsum("bihc,bjhc,bijhc->bijh", query, key, e0)
        alpha_learned = alpha_learned.astype(jnp.float32) / math.sqrt(C)

        extra_heads = extra_heads.astype(jnp.float32)
        if self.set_inf:
            extra_logits = jnp.where(extra_heads == 0.0, -1e10, extra_heads)
        else:
            extra_logits = extra_heads
        alpha = jnp.concatenate([extra_logits, alpha_learned], axis=-1)  # [B,N,N,H]

        # exclude padded / diagonal pairs exactly like sparse scatter-softmax
        alpha = jnp.where(edge_mask[..., None] > 0, alpha, MASK_INF)
        alpha = jax.nn.softmax(alpha, axis=2).astype(self.dtype)
        # rows with no real neighbours produce garbage uniform weights; they
        # are zeroed by the caller's node_mask (padded nodes only).
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)

        out = jnp.einsum("bjhc,bijhc,bijh->bihc", value, e1, alpha)
        return out.reshape(B, N, H * C).astype(jnp.float32)


def skip_head_mlp_tail(x, width, out, prefix):
    """Layers 1-2 of an edge skip-concat prediction head (ref
    models/dmt.py:227-247): silu -> Dense(width//2) -> silu -> Dense(out),
    consuming ``edge_skip_head_first``'s output. Shared by DMT and
    DMT_WO_EQ; must be called from inside the owning module's
    ``@nn.compact`` ``__call__`` so the params attach to its scope."""
    x = nn.silu(x)
    x = nn.Dense(width // 2, name=f"{prefix}_1")(x)
    x = nn.silu(x)
    return nn.Dense(out, name=f"{prefix}_2")(x)


def edge_skip_head_first(edge_attr, cat_e, n_layers, cat_dim, width):
    """First layer of the two edge skip-concat prediction heads (shared by
    DMT and DMT_WO_EQ; ref models/dmt.py:227-247): plain transpose+concat
    of the stacked scan output ``cat_e [L,B,N,N,d]`` into ``[B,N,N,L*d]``,
    then TWO separate first-layer matmuls (exist head, type head) over the
    shared ``concat([edge_attr, cat_flat])`` input.

    This is deliberately the SPLIT form. The round-2 "HBM reduction"
    (merged first kernels as one matmul + einsum contraction straight from
    the stacked scan layout) benched SLOWER on v5e and was reverted in the
    round-3 bisect — see the inline comment and RESULTS.md's round-3
    throughput note.

    Exact same math and param tree as two ``nn.Dense(width,
    name='edge_{exist,type}_mlp_0')`` over ``concat([edge_attr, cat_e])``
    (params declared via DenseParams under those names). Must be called
    from inside the owning module's ``@nn.compact`` ``__call__`` so the
    params attach to its scope. Returns ``[B,N,N,2*width]``; columns
    ``[:width]`` are the exist head, ``[width:]`` the type head.
    """
    in_e = width + n_layers * cat_dim
    k_ex, b_ex = DenseParams(in_e, width, name="edge_exist_mlp_0")()
    k_ty, b_ty = DenseParams(in_e, width, name="edge_type_mlp_0")()
    # Plain concat + two separate head matmuls. The round-2 "HBM reduction"
    # (commit 12ea575: merged k01 kernel + einsum contraction straight from
    # the stacked [L,B,N,N,d] scan layout) benched SLOWER on v5e — the
    # merged [B,N,N,2*width] product materialises and the l-major einsum
    # defeats XLA's dot fusion — part of the 64s -> 77s eval-sweep
    # regression (bisect record: RESULTS.md round-3 throughput note).
    L, B, N, _, d = cat_e.shape
    cat_flat = jnp.moveaxis(cat_e, 0, 3).reshape(B, N, N, L * d)
    hids = jnp.concatenate([edge_attr, cat_flat], axis=-1)
    return jnp.concatenate(
        [hids @ k_ex + b_ex, hids @ k_ty + b_ty], axis=-1
    )


class DenseEdgeGateTransLayer(nn.Module):
    """Dense rewrite of ``EdgeGateTransLayer`` (ref: models/layers.py:194-270):
    standard multi-head attention where both logits and values are gated by
    tanh-transformed edge features. Used by CDGS."""

    x_channels: int
    out_channels: int
    heads: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_mask, deterministic=True):
        H, C = self.heads, self.out_channels
        B, N, _ = x.shape
        x = x.astype(self.dtype)
        edge_attr = edge_attr.astype(self.dtype)
        dense = lambda f, name, bias=True: nn.Dense(
            f, use_bias=bias, dtype=self.dtype, name=name
        )
        query = dense(H * C, "lin_query")(x).reshape(B, N, H, C)
        key = dense(H * C, "lin_key")(x).reshape(B, N, H, C)
        value = dense(H * C, "lin_value")(x).reshape(B, N, H, C)
        e0 = jnp.tanh(
            dense(H * C, "lin_edge0", bias=False)(edge_attr).reshape(B, N, N, H, C)
        )
        e1 = jnp.tanh(
            dense(H * C, "lin_edge1", bias=False)(edge_attr).reshape(B, N, N, H, C)
        )
        alpha = jnp.einsum("bihc,bjhc,bijhc->bijh", query, key, e0)
        # f32 softmax (mixed-precision recipe: logits/softmax stay f32)
        alpha = alpha.astype(jnp.float32) / math.sqrt(C)
        alpha = jnp.where(edge_mask[..., None] > 0, alpha, MASK_INF)
        alpha = jax.nn.softmax(alpha, axis=2).astype(self.dtype)
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)
        out = jnp.einsum("bjhc,bijhc,bijh->bihc", value, e1, alpha)
        return out.reshape(B, N, H * C).astype(jnp.float32)


def sinusoidal_timestep_embedding(timesteps, embedding_dim: int, max_positions=10000):
    """Transformer sinusoidal embedding (used by CDGS, ref: models/cdgs.py:188-199)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb
