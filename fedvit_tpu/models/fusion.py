"""Feature-fusion modules (backbone features × segmentation features).

Parity targets: /root/reference/segmentation.py:277-491 —
  AttentionFusion      (:277-331): seg → sigmoid attention scalar scales the
                                   projected transformer features
  ConcatFusion         (:334-389): pool + project both halves, concat, MLP
  CrossAttentionFusion (:392-455): transformer feature as a 1-token query
                                   over the flattened seg map, residual + LN
  build_fusion_module  (:458-491)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fedvit_tpu.ops.activations import gelu

from fedvit_tpu.models.layers import trunc_normal_init
from fedvit_tpu.ops.attention import xla_attention


class AttentionFusion(nn.Module):
    transformer_dim: int
    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, trans_features, seg_features, deterministic=True):
        """trans (B, D); seg (B, H, W, C) → (B, D)."""
        a = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                    name="seg_proj1")(seg_features.astype(self.dtype))
        a = nn.relu(a)
        a = nn.Conv(1, (1, 1), dtype=self.dtype, name="seg_proj2")(a)
        a = jax.nn.sigmoid(a)
        attn_pooled = a.mean(axis=(1, 2))                      # (B, 1)
        t = nn.Dense(self.transformer_dim, dtype=self.dtype,
                     name="trans_proj")(trans_features.astype(self.dtype))
        return (t * (1.0 + attn_pooled)).astype(jnp.float32)


class ConcatFusion(nn.Module):
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, trans_features, seg_features, deterministic=True):
        seg_pooled = seg_features.astype(self.dtype).mean(axis=(1, 2))
        s = nn.Dense(self.output_dim // 2, dtype=self.dtype,
                     name="seg_proj")(seg_pooled)
        t = nn.Dense(self.output_dim // 2, dtype=self.dtype,
                     name="trans_proj")(trans_features.astype(self.dtype))
        x = jnp.concatenate([t, s], axis=-1)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fusion_fc")(x)
        x = gelu(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        return x.astype(jnp.float32)


class CrossAttentionFusion(nn.Module):
    transformer_dim: int
    output_dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, trans_features, seg_features, deterministic=True):
        b = trans_features.shape[0]
        d = self.transformer_dim
        h = self.num_heads
        hd = d // h
        seg = nn.Conv(d, (1, 1), dtype=self.dtype,
                      name="seg_proj")(seg_features.astype(self.dtype))
        seg_flat = seg.reshape(b, -1, d)                      # (B, HW, D)

        # 1-token query cross-attention (nn.MultiheadAttention semantics)
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(
            trans_features.astype(self.dtype))[:, None]       # (B, 1, D)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(seg_flat)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(seg_flat)
        attn = xla_attention(q.reshape(b, 1, h, hd),
                             k.reshape(b, -1, h, hd),
                             v.reshape(b, -1, h, hd))
        attn = nn.Dense(d, dtype=self.dtype,
                        name="attn_out")(attn.reshape(b, 1, d))[:, 0]
        fused = trans_features + attn.astype(jnp.float32)
        fused = nn.Dense(self.output_dim, dtype=self.dtype,
                         name="out_proj")(fused.astype(self.dtype))
        fused = nn.LayerNorm(dtype=jnp.float32, name="norm")(fused)
        return fused.astype(jnp.float32)


def build_fusion_module(fusion_type: str, transformer_dim: int,
                        seg_channels: int, output_dim: Optional[int] = None,
                        dtype=jnp.float32) -> nn.Module:
    """(reference segmentation.py:458-491)"""
    output_dim = output_dim or transformer_dim
    if fusion_type == "attention":
        return AttentionFusion(transformer_dim, dtype=dtype)
    if fusion_type == "concat":
        return ConcatFusion(output_dim, dtype=dtype)
    if fusion_type == "cross_attention":
        return CrossAttentionFusion(transformer_dim, output_dim, dtype=dtype)
    raise ValueError(f"Unknown fusion type: {fusion_type}")
