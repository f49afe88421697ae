"""SpecFormer: multi-spectrum patch transformer encoder.

TPU rewrite of ref models/specformer.py:14-470. Each 1-D spectrum
(UV-Vis 701 / IR 3501 / Raman 3501 points) is unfolded into overlapping
patches, linearly projected to d_model with a learned positional embedding,
concatenated across spectra, and encoded by a 3-layer transformer with
residual attention (RealFormer-style pre-softmax score carry,
ref :220-228,400-404) and BatchNorm(channel) normalisation (ref :247,260).
The flattened tokens map to a pooled conditioning embedding.

Patching is a static gather — XLA turns it into a cheap reshape-window op;
the encoder is three dense MHA blocks over <= 347 tokens, all MXU work.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SPECTRUM_LENGTHS = (701, 3501, 3501)  # uv, ir, raman (ref :33)
SPECTRA_VERSIONS = {
    "uv": (0,),
    "ir": (1,),
    "raman": (2,),
    "allspectra": (0, 1, 2),
}


def used_spectra_indices(spectra_version: str) -> Tuple[int, ...]:
    if spectra_version not in SPECTRA_VERSIONS:
        raise ValueError("spectra_version should be uv, ir, raman or allspectra")
    return SPECTRA_VERSIONS[spectra_version]


def patch_count(length: int, patch_len: int, stride: int) -> int:
    return (length - patch_len) // stride + 1


def unfold_patches(spec: jnp.ndarray, patch_len: int, stride: int) -> jnp.ndarray:
    """``[B, L] -> [B, n_patches, patch_len]`` sliding-window patching
    (ref :96-107 ``Tensor.unfold``)."""
    n = patch_count(spec.shape[-1], patch_len, stride)
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(patch_len)[None, :]
    return spec[:, idx]


class _MultiheadAttention(nn.Module):
    """MHA with optional residual attention scores (ref :312-425)."""

    d_model: int
    n_heads: int
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    res_attention: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prev=None, deterministic=True):
        B, L, _ = x.shape
        H = self.n_heads
        dk = self.d_model // H
        x = x.astype(self.dtype)
        q = nn.Dense(H * dk, dtype=self.dtype, name="W_Q")(x).reshape(B, L, H, dk)
        k = nn.Dense(H * dk, dtype=self.dtype, name="W_K")(x).reshape(B, L, H, dk)
        v = nn.Dense(H * dk, dtype=self.dtype, name="W_V")(x).reshape(B, L, H, dk)
        # the reference's scale is a frozen parameter head_dim**-0.5 (ref :382)
        # f32 logits/softmax (mixed-precision recipe); residual scores carry
        # between layers in f32
        scores = jnp.einsum("bihd,bjhd->bhij", q, k).astype(jnp.float32) * (
            dk**-0.5
        )
        if prev is not None:
            scores = scores + prev
        attn = nn.softmax(scores, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, L, H * dk)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="to_out")(out)
        out = out.astype(jnp.float32)
        out = nn.Dropout(self.proj_dropout)(out, deterministic=deterministic)
        if self.res_attention:
            return out, scores
        return out


class TSTEncoderLayer(nn.Module):
    """Post-norm transformer layer with BatchNorm over channels (ref :232-309)."""

    d_model: int
    n_heads: int
    d_ff: int = 256
    dropout: float = 0.0
    attn_dropout: float = 0.0
    res_attention: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, prev=None, deterministic=True):
        attn_out = _MultiheadAttention(
            self.d_model,
            self.n_heads,
            attn_dropout=self.attn_dropout,
            proj_dropout=self.dropout,
            res_attention=self.res_attention,
            dtype=self.dtype,
            name="self_attn",
        )(src, prev=prev, deterministic=deterministic)
        if self.res_attention:
            src2, scores = attn_out
        else:
            src2, scores = attn_out, None
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        # BatchNorm1d over d_model channels, stats over (batch, patches)
        # (ref :247: Transpose -> BatchNorm1d -> Transpose)
        src = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, name="norm_attn"
        )(src)

        ff = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(src.astype(self.dtype))
        ff = nn.gelu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(ff).astype(
            jnp.float32
        )
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        src = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, name="norm_ffn"
        )(src)
        if self.res_attention:
            return src, scores
        return src


class SpecFormer(nn.Module):
    """Pooled spectra conditioning encoder (ref models/specformer.py:14-120).

    ``__call__`` takes a tuple of spectra arrays ``[B, L_i]`` in the order of
    ``used_spectra_indices(spectra_version)`` (a single array is also accepted
    for single-spectrum versions) and returns ``[B, output_dim]``.
    """

    patch_len: Sequence[int] = (20, 50, 50)
    stride: Sequence[int] = (10, 25, 25)
    output_dim: int = 256
    spectra_version: str = "ir"
    n_layers: int = 3
    d_model: int = 128
    n_heads: int = 16
    d_ff: int = 256
    dropout: float = 0.0
    attn_dropout: float = 0.0
    res_attention: bool = True
    # bf16 matmul compute path (params/BatchNorm/softmax stay f32)
    dtype: jnp.dtype = jnp.float32

    def normalize_context(self, context):
        """Accept [B,L], [B,1,L], or tuples thereof; return tuple of [B,L]."""
        if isinstance(context, (list, tuple)):
            specs = list(context)
        else:
            specs = [context]
        used = used_spectra_indices(self.spectra_version)
        if len(specs) != len(used):
            raise ValueError(
                f"expected {len(used)} spectra for version "
                f"{self.spectra_version!r}, got {len(specs)}"
            )
        out = []
        for s in specs:
            if s.ndim == 3:
                s = s.reshape(s.shape[0], s.shape[-1])
            out.append(s)
        return tuple(out)

    @nn.compact
    def __call__(
        self,
        context,
        deterministic: bool = True,
        patch_masks=None,
        return_tokens: bool = False,
    ):
        """``patch_masks``: optional tuple of ``[B, n_patches_i]`` arrays
        (1 = mask this patch's raw values to zero before projection) used by
        the masked-patch pretraining objective (training/pretrain.py);
        zero-masking keeps the parameter tree identical to fine-tuning.
        ``return_tokens``: return the ``[B, P, d_model]`` encoder tokens
        instead of the pooled embedding (skips the flatten head)."""
        used = used_spectra_indices(self.spectra_version)
        specs = self.normalize_context(context)

        pos_names = {0: "W_pos_uv", 1: "W_pos_ir", 2: "W_pos_raman"}
        tokens = []
        for slot, (i, spec) in enumerate(zip(used, specs)):
            patches = unfold_patches(spec, self.patch_len[i], self.stride[i])
            if patch_masks is not None:
                patches = jnp.where(
                    patch_masks[slot][..., None] > 0, 0.0, patches
                )
            z = nn.Dense(self.d_model, dtype=self.dtype, name=f"W_P_{i}")(
                patches.astype(self.dtype)
            ).astype(jnp.float32)
            n_patches = patches.shape[1]
            # learned positional embedding, init U(-0.02, 0.02)
            # (ref specformer_layers.py:105-107)
            pname = pos_names[i] if self.spectra_version == "allspectra" else "W_pos"
            w_pos = self.param(
                pname,
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-0.02, maxval=0.02
                ),
                (n_patches, self.d_model),
            )
            z = nn.Dropout(self.dropout)(z + w_pos, deterministic=deterministic)
            tokens.append(z)

        z = jnp.concatenate(tokens, axis=1)  # [B, total_patches, d_model]

        scores = None
        for li in range(self.n_layers):
            layer = TSTEncoderLayer(
                self.d_model,
                self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                res_attention=self.res_attention,
                dtype=self.dtype,
                name=f"encoder_layer_{li}",
            )
            if self.res_attention:
                z, scores = layer(z, prev=scores, deterministic=deterministic)
            else:
                z = layer(z, deterministic=deterministic)

        tokens = z

        # Flatten head: [B, P, D] -> [B, P*D] -> [B, output_dim] (ref :428-470)
        z = z.reshape(z.shape[0], -1)
        z = nn.Dense(self.output_dim, name="head_linear")(z)
        z = nn.LayerNorm(name="out_norm")(z)
        if return_tokens:
            # (pooled, tokens): the pooled path still runs so the head params
            # exist in the pretraining tree (the restore surface includes
            # head.linear/out_norm, ref dmt.py:292-293)
            return z, tokens
        return z

    @staticmethod
    def from_config(config):
        return SpecFormer(
            patch_len=tuple(config.model.patch_len),
            stride=tuple(config.model.stride),
            output_dim=config.model.nf,
            spectra_version=config.data.spectra_version,
        )
