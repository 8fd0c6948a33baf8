"""Vision Transformer backbone — TPU-first JAX implementation.

Replaces the reference's timm ViT backbones (model.py:112-117;
model_old.py:154 names "vit_base_patch16_384" etc.). Everything here is
designed for the MXU / XLA compilation model:

  * patchify = reshape + one Dense (a single large matmul), not a strided conv
  * static token count; 4-channel patch-embed variant mirrors the RGB-mean
    init surgery of reference model.py:150-166
  * attention is the shared fused op (ops/attention.py)
  * DropPath rates linearly spaced over depth (timm semantics)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fedvit_tpu.ops.layer_norm import LayerNorm
from fedvit_tpu.models.layers import (DropPath, Mlp, MultiHeadAttention,
                                      trunc_normal_init)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as reshape + Dense.

    Equivalent to Conv(kernel=stride=patch) but expressed as one MXU matmul
    over (B·N, P·P·C).
    """
    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, f"image {h}x{w} not divisible by patch {p}"
        nh, nw = h // p, w // p
        x = x.reshape(b, nh, p, nw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, p * p * c)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="proj")(x)
        return x


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = MultiHeadAttention(self.num_heads, self.dropout, self.dtype,
                               self.attention_impl, name="attn")(y, deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic)
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), dropout=self.dropout,
                dtype=self.dtype, name="mlp")(y, deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic)
        return x


class VisionTransformer(nn.Module):
    """ViT backbone returning pooled features (B, embed_dim).

    `num_classes=0` semantics of timm (reference model.py:112-117): this
    module IS the headless backbone; classification heads live elsewhere.
    """
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    drop_path_rate: float = 0.1
    pool: str = "cls"               # "cls" | "mean"
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    remat: bool = False             # rematerialize blocks (HBM ↔ FLOPs trade)

    @property
    def num_features(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_tokens: bool = False):
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(x)
        n = x.shape[1]

        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)
                                              ).astype(self.dtype), x], axis=1)
        pos_embed = self.param("pos_embed", trunc_normal_init,
                               (1, n + 1, self.embed_dim))
        x = x + pos_embed.astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        dpr = [self.drop_path_rate * i / max(1, self.depth - 1)
               for i in range(self.depth)]
        block_cls = (nn.remat(ViTBlock, static_argnums=(2,))
                     if self.remat else ViTBlock)
        for i in range(self.depth):
            x = block_cls(self.num_heads, self.mlp_ratio, self.dropout, dpr[i],
                          self.dtype, self.attention_impl, name=f"blocks_{i}")(
                              x, deterministic)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)

        if return_tokens:
            return x
        if self.pool == "cls":
            feats = x[:, 0]
        else:
            feats = x[:, 1:].mean(axis=1)
        return feats.astype(jnp.float32)


# canonical configs (timm naming) -------------------------------------------

VIT_CONFIGS = {
    "tiny":  dict(embed_dim=192,  depth=12, num_heads=3),
    "small": dict(embed_dim=384,  depth=12, num_heads=6),
    "base":  dict(embed_dim=768,  depth=12, num_heads=12),
    "large": dict(embed_dim=1024, depth=24, num_heads=16),
    "huge":  dict(embed_dim=1280, depth=32, num_heads=16),
}
