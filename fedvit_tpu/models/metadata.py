"""Metadata fusion branches.

* MetadataBranch — the current-generation MLP on the flat 13-dim vector
  (parity: /root/reference/model.py:27-60:
  Linear(13→256) → BN → GELU → Dropout(0.4) → Linear(256→128) → BN → GELU).
* MetadataEmbedding — the old-generation learned embeddings
  (parity: /root/reference/model_old.py:28-112: Embedding sex(3→d/4) &
  site(9→d/2), Linear age(1→d/4)+ReLU, concat → Linear+LN+ReLU+Dropout(0.1)).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fedvit_tpu.ops.activations import gelu

from fedvit_tpu.data.constants import NUM_SEX, NUM_SITE
from fedvit_tpu.models.layers import TorchBatchNorm


class MetadataBranch(nn.Module):
    input_dim: int = 13
    hidden_dim: int = 256
    output_dim: int = 128
    dropout: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, input_dim) → (B, output_dim)."""
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = TorchBatchNorm(dtype=jnp.float32, name="bn1")(
            x, use_running_average=deterministic)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(x)
        x = TorchBatchNorm(dtype=jnp.float32, name="bn2")(
            x, use_running_average=deterministic)
        x = gelu(x)
        return x.astype(jnp.float32)


class MetadataEmbedding(nn.Module):
    """Old-gen learned categorical embeddings (model_old.py:28-112).

    Inputs are raw fields: age (B,) float, sex (B,) int, site (B,) int.
    """
    embed_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, age: jnp.ndarray, sex: jnp.ndarray, site: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        d = self.embed_dim
        if age.ndim == 1:
            age = age[:, None]
        age_emb = nn.relu(nn.Dense(d // 4, dtype=self.dtype, name="age_proj")(
            age.astype(self.dtype)))
        sex_emb = nn.Embed(NUM_SEX, d // 4, dtype=self.dtype, name="sex_embed")(sex)
        site_emb = nn.Embed(NUM_SITE, d // 2, dtype=self.dtype, name="site_embed")(site)
        x = jnp.concatenate([age_emb, sex_emb, site_emb], axis=-1)
        x = nn.Dense(d, dtype=self.dtype, name="fusion")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="fusion_ln")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        return x.astype(jnp.float32)
