"""Shared model layers — DropPath, MLP, attention wrapper, init helpers.

TPU-first conventions used throughout the model zoo:
  * NHWC activations; channels-last everywhere (XLA's native TPU layout).
  * Patchify via reshape + a single Dense (one big MXU matmul) instead of a
    strided conv.
  * bfloat16 compute / float32 params: the `dtype` argument is the compute
    dtype; parameters are always stored float32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fedvit_tpu.ops.attention import dot_product_attention

# trunc-normal(0.02) — the reference head/backbone init (model.py:168-173)
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm semantics: scale by 1/keep_prob)."""
    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Transformer MLP block: Dense → GELU → Drop → Dense → Drop."""
    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """Standard MHA with a pluggable fused-attention implementation.

    qkv as one Dense (single MXU matmul), heads split afterwards.
    """
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"   # auto | pallas | xla

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, d = x.shape
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, N, H, Dh)
        out = dot_product_attention(q, k, v, impl=self.attention_impl)
        out = out.reshape(b, n, d)
        out = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
