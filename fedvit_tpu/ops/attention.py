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
                  bias: Optional[jnp.ndarray] = None,
                  scale: Optional[float] = None) -> jnp.ndarray:
    """Reference XLA attention: softmax(q·kᵀ·scale [+ bias])·v.

    bias: optional additive bias —
      (H, N, N): per-head, broadcast over the batch
      (W0, H, N, N) with B % W0 == 0: per-(window, head); the window index
        of batch element b is b % W0 (Swin's (B·nW) window batching; a
        (B, H, N, N) per-sample bias is the W0 == B special case).
    scale: score scale; default 1/√d (pass 1.0 when folded into q).
    """
    orig_dtype = q.dtype
    if scale is None:
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    # (B, H, N, N) — contract head dims in fp32 accumulation
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        if bias.ndim == 3:
            logits = logits + bias[None].astype(jnp.float32)
        else:
            b = q.shape[0]
            w0 = bias.shape[0]
            shaped = logits.reshape((b // w0, w0) + logits.shape[1:])
            logits = (shaped + bias[None].astype(jnp.float32)
                      ).reshape(logits.shape)
    weights = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights, v,
                     preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


def dot_product_attention_flat(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, num_heads: int,
                               impl: str = "auto") -> jnp.ndarray:
    """Unbiased attention on flat (B, N, E) operands (heads head-major in
    lanes) — the zero-layout-op hot path for ViT backbones.

    The Pallas branch consumes the flat operands directly (no transpose /
    pad / slice anywhere, see ops/flash_attention.py); the XLA branch splits
    heads with free reshapes.
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas":
        from fedvit_tpu.ops.flash_attention import flash_attention_flat
        return flash_attention_flat(q, k, v, num_heads)
    b, n, e = q.shape
    d = e // num_heads
    out = xla_attention(q.reshape(b, n, num_heads, d),
                        k.reshape(b, n, num_heads, d),
                        v.reshape(b, n, num_heads, d))
    return out.reshape(b, n, e)


def attention_from_qkv(qkv: jnp.ndarray, num_heads: int,
                       impl: str = "auto") -> jnp.ndarray:
    """Unbiased attention straight from the packed (B, N, 3E) QKV projection
    output — the zero-copy ViT hot path (neither the q/k/v slices nor the
    backward dq/dk/dv concatenation ever materialize on the Pallas path)."""
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas":
        from fedvit_tpu.ops.flash_attention import flash_attention_qkv
        return flash_attention_qkv(qkv, num_heads)
    b, n, e3 = qkv.shape
    e = e3 // 3
    return dot_product_attention_flat(qkv[..., :e], qkv[..., e:2 * e],
                                      qkv[..., 2 * e:], num_heads, impl=impl)


def windowed_attention_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            bias: jnp.ndarray, mask: Optional[jnp.ndarray],
                            num_heads: int,
                            impl: str = "auto") -> jnp.ndarray:
    """Windowed biased attention on flat window-major operands (Swin path).

    q, k, v: (W0·B, N, E) with rows [w·B, (w+1)·B) belonging to window w and
    heads head-major in lanes. bias: (H, N, N) differentiable rel-pos bias;
    mask: (W0, N, N) static additive shift mask or None. Any score scale is
    folded into q by the caller.

    On TPU this is one fused Pallas kernel (bias and mask added to scores
    in-kernel — the (W0, H, N, N) combined bias never materializes in HBM,
    and dBias accumulates across the window×batch grid in VMEM).
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    wb, n, e = q.shape
    d = e // num_heads
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    if impl == "pallas":
        from fedvit_tpu.ops.flash_attention import flash_attention_bias_flat
        return flash_attention_bias_flat(q, k, v, bias, mask, num_heads)
    # XLA reference: window-major grouping
    w0 = mask.shape[0]
    b = wb // w0
    qh = q.reshape(w0, b, n, num_heads, d)
    kh = k.reshape(w0, b, n, num_heads, d)
    vh = v.reshape(w0, b, n, num_heads, d)
    logits = jnp.einsum("wbnhd,wbmhd->wbhnm", qh, kh,
                        preferred_element_type=jnp.float32)
    logits = logits + bias[None, None].astype(jnp.float32)
    logits = logits + mask[:, None, None].astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("wbhnm,wbmhd->wbnhd", weights, vh,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(wb, n, e)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          impl: str = "auto",
                          scale: Optional[float] = None) -> jnp.ndarray:
    """Generic (B, N, H, D) attention dispatch.

    impl: "auto" (pallas iff on TPU), "pallas", or "xla".
    Hot paths use the flat entry points instead: ViT →
    dot_product_attention_flat, Swin → windowed_attention_flat. Biased
    attention on (B, N, H, D) operands always takes the XLA path — the
    fused biased kernel works on the flat window-major layout only.
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "pallas" and bias is None:
        from fedvit_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v)
    return xla_attention(q, k, v, bias=bias, scale=scale)
