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

from fedvit_tpu.ops.activations import gelu
from fedvit_tpu.ops.attention import (attention_from_qkv,
                                      attention_from_qkvb, attention_from_x)

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


class TorchBatchNorm(nn.Module):
    """BatchNorm over the leading axis with torch's running-stat convention.

    flax's nn.BatchNorm accumulates the BIASED batch variance into
    `batch_stats`; torch's BatchNorm1d accumulates the UNBIASED (n/(n−1))
    variance (normalization itself uses the biased variance in both). The
    reference MetadataBranch uses torch BN (reference model.py:48-56), so
    eval-after-training parity requires torch's convention. Param/collection
    layout matches nn.BatchNorm ({scale, bias} / {mean, var}).
    """
    momentum: float = 0.1          # torch convention: new = (1−m)·old + m·batch
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((d,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((d,), jnp.float32))
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0]
            mean = x32.mean(axis=0)
            var = ((x32 - mean) ** 2).mean(axis=0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


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
        x = gelu(x)
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
        if self.attention_impl == "mega":
            # QKV projection fused INTO the attention kernel; the param
            # tree ("qkv"/{kernel,bias}) stays identical to nn.Dense so
            # checkpoints and weight import are unaffected
            w, bias = _QKVParams(3 * d, name="qkv")(d)
            out = attention_from_x(x, w.astype(self.dtype),
                                   bias.astype(self.dtype), self.num_heads,
                                   impl="mega")
        elif self.attention_impl == "packed":
            # plain packed path (bias in the projection epilogue) — kept as
            # the A/B reference for the default biased kernel below
            qkv = nn.Dense(3 * d, dtype=self.dtype,
                           kernel_init=trunc_normal_init, name="qkv")(x)
            out = attention_from_qkv(qkv, self.num_heads, impl="auto")
        else:
            # default: bias-free projection matmul (XLA, stays fused with
            # the preceding LayerNorm), bias added inside the attention
            # kernel where its cotangent accumulates for free; the param
            # tree ("qkv"/{kernel,bias}) is nn.Dense-identical
            w, bias = _QKVParams(3 * d, name="qkv")(d)
            qkv = jnp.dot(x, w.astype(self.dtype))
            out = attention_from_qkvb(qkv, bias, self.num_heads,
                                      impl=self.attention_impl)
        out = nn.Dense(d, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class _QKVParams(nn.Module):
    """nn.Dense-shaped parameters ({kernel, bias}) without the matmul —
    the mega attention kernel applies them itself."""
    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param("kernel", trunc_normal_init, (in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b
