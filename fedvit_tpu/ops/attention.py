"""Attention dispatch — Pallas fused kernel on TPU, XLA einsum elsewhere.

The reference's attention lives inside timm backbones (SwinV2/ViT,
/root/reference/model.py:112-117); here it is a first-class op so every
backbone shares one tuned implementation.

Layout: q, k, v are (B, N, H, Dh); output (B, N, H, Dh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference XLA attention: softmax(q·kᵀ/√d [+ bias])·v.

    bias: optional (H, N, N) or (B, H, N, N) additive bias (e.g. Swin relative
    position bias).
    """
    orig_dtype = q.dtype
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    # (B, H, N, N) — contract head dims in fp32 accumulation
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        if bias.ndim == 3:
            bias = bias[None]
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights, v,
                     preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          impl: str = "auto") -> jnp.ndarray:
    """Dispatch to the fused Pallas kernel on TPU or the XLA path.

    impl: "auto" (pallas iff on TPU), "pallas", or "xla".
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas" and bias is None:
        from fedvit_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v)
    # biased attention (Swin relative-position bias) uses the XLA path so
    # the bias table stays differentiable (see flash_attention docstring)
    return xla_attention(q, k, v, bias=bias)
