"""Micro-bench: SwinV2 windowed-attention kernel — softmax variants (fwd).

    python tools/wattn_micro.py [stage0|stage1|stage2|stage3]

Times flash_attention_bias_flat forward at SwinV2-L@384 bs=16 stage shapes
for FEDVIT_WATTN_SOFTMAX in {max, postdiv, capped} — quantifies how much of
the kernel is the softmax VPU chain vs the (K=d=32-capped) MXU dots.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

STAGES = {   # (windows, batch, N, C, H) at 384², window 24 (12 at stage 3)
    "stage0": (16, 16, 576, 192, 6),
    "stage1": (4, 16, 576, 384, 12),
    "stage2": (1, 16, 576, 768, 24),
    "stage3": (1, 16, 144, 1536, 48),
    "tiny": (2, 2, 64, 64, 2),      # CPU smoke (interpret mode)
}
stage = sys.argv[1] if len(sys.argv) > 1 else "stage2"
w0, b, n, c, h = STAGES[stage]

r = np.random.default_rng(0)
d = c // h


def cosine_rows(scale):
    """Per-head L2-normalized rows (what models/swin.py feeds the kernel:
    q carries the learned scale, k is unit) — keeps 'capped' in range."""
    x = r.normal(size=(w0 * b, n, h, d))
    x = x / np.linalg.norm(x, axis=-1, keepdims=True) * scale
    return jnp.asarray(x.reshape(w0 * b, n, c), jnp.bfloat16)


q = cosine_rows(10.0)
k = cosine_rows(1.0)
v = jnp.asarray(r.normal(size=(w0 * b, n, c)), jnp.bfloat16)
bias = jnp.asarray(r.uniform(size=(h, n, n)) * 16, jnp.float32)
mask = jnp.zeros((w0, n, n), jnp.float32)


def bench():
    from fedvit_tpu.ops.flash_attention import flash_attention_bias_flat

    def loop(qq):
        acc = qq
        for _ in range(20):
            acc = acc + 0.0 * flash_attention_bias_flat(acc, k, v, bias,
                                                        mask, h)
        return acc
    lj = jax.jit(loop)
    o = lj(q); _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    o = lj(q); _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / 20 * 1000


ref = None
for variant in ("max", "postdiv"):
    os.environ["FEDVIT_WATTN_SOFTMAX"] = variant
    jax.clear_caches()
    from fedvit_tpu.ops.flash_attention import flash_attention_bias_flat
    out = flash_attention_bias_flat(q, k, v, bias, mask, h)
    out = np.asarray(out.astype(jnp.float32))
    if ref is None:
        ref = out
    else:
        err = float(np.abs(out - ref).max())
        print(f"  [{variant}] max|Δ| vs max-variant: {err:.2e}", flush=True)
    t = bench()
    print(f"{stage} {variant:8s}: {t:7.3f} ms fwd", flush=True)
os.environ.pop("FEDVIT_WATTN_SOFTMAX", None)
