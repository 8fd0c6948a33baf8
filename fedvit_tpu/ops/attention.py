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
    if impl == "mega":
        impl = "pallas"   # 'mega' only changes the ViT MHA composition;
                          # every other attention keeps its fused kernel
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
    if impl == "mega":
        impl = "pallas"   # 'mega' only changes the ViT MHA composition;
                          # every other attention keeps its fused kernel
    if impl == "pallas":
        from fedvit_tpu.ops.flash_attention import flash_attention_qkv
        return flash_attention_qkv(qkv, num_heads)
    b, n, e3 = qkv.shape
    e = e3 // 3
    return dot_product_attention_flat(qkv[..., :e], qkv[..., e:2 * e],
                                      qkv[..., 2 * e:], num_heads, impl=impl)


def attention_from_qkvb(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                        impl: str = "auto") -> jnp.ndarray:
    """Attention on the BIAS-FREE packed (B, N, 3E) projection output with
    the projection bias (3E,) applied inside the op.

    Equals attention_from_qkv(qkv + bias) exactly; on the Pallas path the
    bias cotangent accumulates inside the backward kernel, so XLA never
    re-reads the (B, N, 3E) dqkv from HBM to reduce it (measured 2.9 ms/step
    on the ViT-B bs=192 train step)."""
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl in ("pallas", "mega"):
        from fedvit_tpu.ops.flash_attention import flash_attention_qkvb
        return flash_attention_qkvb(qkv, bias, num_heads)
    return attention_from_qkv(
        qkv + bias.reshape(1, 1, -1).astype(qkv.dtype), num_heads, impl=impl)


def attention_from_x(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     num_heads: int, impl: str = "auto") -> jnp.ndarray:
    """QKV projection + attention fused into one kernel (ViT 'mega' path).

    x (B, N, D) · w (D, 3E) + b, then per-head attention — the packed QKV
    tensor never exists in HBM in either pass (flash_attention_xqkv). The
    XLA fallback computes the identical composition for CPU/parity."""
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl in ("pallas", "mega"):
        from fedvit_tpu.ops.flash_attention import flash_attention_xqkv
        return flash_attention_xqkv(x, w, b, num_heads)
    qkv = (jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + b.astype(jnp.float32)).astype(x.dtype)
    return attention_from_qkv(qkv, num_heads, impl="xla")


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
    if impl == "mega":
        impl = "pallas"   # 'mega' only changes the ViT MHA composition
    wb, n, e = q.shape
    d = e // num_heads
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    if impl == "pallas":
        from fedvit_tpu.ops.flash_attention import flash_attention_bias_flat
        # NEGATIVE RESULT (round 3): padding unaligned head counts (e.g.
        # SwinV2-L stage 1's H=6, d=32, where no head-block divisor tiles
        # onto 128 lanes) up to 8 zero heads was tried and measured SLOWER
        # end-to-end (228.4 vs 220.3 ms/step SwinV2-L@384 bs=16): Mosaic's
        # fallback handles the unaligned per-head lane slices at full
        # efficiency (stage-1 time tracks its FLOP ratio vs the aligned
        # stages), so the pad/slice bandwidth is pure overhead.
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


def windowed_cosine_attention_flat(q: jnp.ndarray, k: jnp.ndarray,
                                   v: jnp.ndarray, scale: jnp.ndarray,
                                   bias: jnp.ndarray,
                                   mask: Optional[jnp.ndarray],
                                   num_heads: int,
                                   impl: str = "auto") -> jnp.ndarray:
    """SwinV2 scaled-cosine windowed attention on RAW flat operands.

    softmax(scale_h · q̂_h k̂_hᵀ + bias_h + mask_w) · v_h with
    x̂ = x/max(‖x‖₂, 1e-6) per head (the reference clamp, timm
    swin_transformer_v2 WindowAttention.forward semantics).

    q, k, v: (W0·B, N, E) window-major flat; scale: (H,) f32 per-head
    logit scale (differentiable); bias (H, N, N); mask (W0, N, N) or None.

    On TPU the normalization happens INSIDE the fused Pallas kernel on the
    resident head slice. NOTE: measured round 3, this fusion is a net LOSS
    on SwinV2-L@384 (+44 ms/step of kernel time vs the ≈12 ms XLA-side
    normalization it removes — see ops/flash_attention.py) because the
    in-program norm chain serializes with the MXU dots; models/swin.py
    uses windowed_attention_flat with XLA-side norms instead."""
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "mega":
        impl = "pallas"   # 'mega' only changes the ViT MHA composition
    wb, n, e = q.shape
    d = e // num_heads
    if mask is None:
        mask = jnp.zeros((1, n, n), jnp.float32)
    if impl == "pallas":
        from fedvit_tpu.ops.flash_attention import flash_attention_cosine_flat
        return flash_attention_cosine_flat(q, k, v, scale, bias, mask,
                                           num_heads)
    w0 = mask.shape[0]
    b = wb // w0
    qh = q.reshape(w0, b, n, num_heads, d).astype(jnp.float32)
    kh = k.reshape(w0, b, n, num_heads, d).astype(jnp.float32)
    vh = v.reshape(w0, b, n, num_heads, d)
    qh = qh / jnp.clip(jnp.linalg.norm(qh, axis=-1, keepdims=True),
                       min=1e-6) * scale.reshape(1, 1, 1, num_heads, 1)
    kh = kh / jnp.clip(jnp.linalg.norm(kh, axis=-1, keepdims=True), min=1e-6)
    logits = jnp.einsum("wbnhd,wbmhd->wbhnm", qh.astype(q.dtype),
                        kh.astype(q.dtype),
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
    if impl == "mega":
        impl = "pallas"   # 'mega' only changes the ViT MHA composition
    if impl == "pallas" and bias is None:
        from fedvit_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v)
    return xla_attention(q, k, v, bias=bias, scale=scale)
