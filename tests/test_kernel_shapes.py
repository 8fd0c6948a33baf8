"""Shape-robustness sweep for the kernel dispatchers (VERDICT r3 #7).

The ViT-L N=577 Mosaic failure was caught by hand in round 3; this sweep
pins the contract mechanically: for every shape a model might feed them —
odd token counts, prime batch sizes, unaligned head dims, non-8-divisible
row counts — the dispatchers (`attention_from_qkvb`, the windowed kernels,
the fused LayerNorm backward) must produce a WORKING path (Pallas, in
interpret mode on this CPU platform, exercising the same group/block-size
selection logic that runs on TPU) and match the XLA reference in both
passes. A dispatcher that picks an invalid block/group for some shape fails
here with a shape/compile error instead of on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedvit_tpu.ops.attention import (attention_from_qkv,
                                      attention_from_qkvb, attention_from_x,
                                      windowed_attention_flat,
                                      windowed_cosine_attention_flat)
from fedvit_tpu.ops.layer_norm import layer_norm


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


# ---------------------------------------------------------------------------
# packed-QKV + in-kernel-bias attention (the ViT default path)
# ---------------------------------------------------------------------------

# (b, n, h, d): odd N (ViT-B 197, ViT-L 577-class odd counts), prime batch,
# tiny head dim, single head, lane-unaligned E = h*d
QKVB_SHAPES = [
    (1, 5, 1, 8),        # degenerate: single row-ish, single head
    (3, 33, 3, 8),       # prime batch (group divisor = 1), tiny d
    (2, 197, 4, 16),     # ViT-B token count
    (5, 49, 7, 8),       # everything odd/prime: b=5, n=49, h=7
    (2, 577, 2, 16),     # the round-3 Mosaic-failure token count (ViT-L@384)
    (4, 64, 6, 32),      # SwinV2 stage-1 geometry (h·d = 192, 1.5 lanes)
]


@pytest.mark.parametrize("b,n,h,d", QKVB_SHAPES)
def test_qkvb_dispatch_fwd_bwd_all_shapes(b, n, h, d):
    e = h * d
    qkv = _rand((b, n, 3 * e), seed=n + b)
    bias = _rand((3 * e,), seed=7)

    def f_pallas(qkv, bias):
        return (attention_from_qkvb(qkv, bias, h, impl="pallas") ** 2).sum()

    def f_xla(qkv, bias):
        return (attention_from_qkvb(qkv, bias, h, impl="xla") ** 2).sum()

    out_p = attention_from_qkvb(qkv, bias, h, impl="pallas")
    out_x = attention_from_qkvb(qkv, bias, h, impl="xla")
    assert out_p.shape == (b, n, e)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)
    gp = jax.grad(f_pallas, argnums=(0, 1))(qkv, bias)
    gx = jax.grad(f_xla, argnums=(0, 1))(qkv, bias)
    for a, r, name in zip(gp, gx, ("dqkv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("b,n,h,d", [(3, 33, 3, 8), (2, 197, 4, 16)])
def test_qkv_and_mega_dispatch_odd_shapes(b, n, h, d):
    """The bias-free packed kernel and the fused-projection mega kernel
    survive the same odd shapes."""
    e = h * d
    qkv = _rand((b, n, 3 * e), seed=b * n)
    np.testing.assert_allclose(
        np.asarray(attention_from_qkv(qkv, h, impl="pallas")),
        np.asarray(attention_from_qkv(qkv, h, impl="xla")),
        rtol=2e-4, atol=2e-4)

    x = _rand((b, n, e), seed=1)
    w = _rand((e, 3 * e), seed=2) * 0.1
    bias = _rand((3 * e,), seed=3)
    np.testing.assert_allclose(
        np.asarray(attention_from_x(x, w, bias, h, impl="pallas")),
        np.asarray(attention_from_x(x, w, bias, h, impl="xla")),
        rtol=3e-4, atol=3e-4)
    gp = jax.grad(lambda *a: (attention_from_x(*a, h, impl="pallas") ** 2)
                  .sum(), argnums=(0, 1, 2))(x, w, bias)
    gx = jax.grad(lambda *a: (attention_from_x(*a, h, impl="xla") ** 2)
                  .sum(), argnums=(0, 1, 2))(x, w, bias)
    for a, r, name in zip(gp, gx, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=4e-4, atol=4e-4, err_msg=name)


# ---------------------------------------------------------------------------
# windowed (Swin) kernels — odd window counts, unaligned heads, d=32 slices
# ---------------------------------------------------------------------------

# (w0, b, n, h, d): n = window², SwinV2 windows are 7/8/12/24 → n 49/64/144/
# 576; h=6,d=32 is the SwinV2-L stage-1 unaligned case
WFLAT_SHAPES = [
    (1, 2, 49, 2, 8),      # 7x7 window, odd N
    (4, 1, 16, 3, 8),      # multi-window, single batch row per window
    (9, 2, 16, 1, 8),      # odd window count (shifted 3x3 partition)
    (1, 3, 64, 6, 32),     # SwinV2 stage-1 head geometry, prime batch
    (4, 2, 144, 2, 16),    # window-12 token count
]


@pytest.mark.parametrize("w0,b,n,h,d", WFLAT_SHAPES)
def test_windowed_dispatch_fwd_bwd_all_shapes(w0, b, n, h, d):
    e = h * d
    q = _rand((w0 * b, n, e), seed=1)
    k = _rand((w0 * b, n, e), seed=2)
    v = _rand((w0 * b, n, e), seed=3)
    bias = _rand((h, n, n), seed=4) * 0.1
    mask = jnp.where(_rand((w0, n, n), seed=5) > 1.0, -100.0, 0.0)

    out_p = windowed_attention_flat(q, k, v, bias, mask, h, impl="pallas")
    out_x = windowed_attention_flat(q, k, v, bias, mask, h, impl="xla")
    assert out_p.shape == (w0 * b, n, e)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-4, atol=2e-4)

    def loss(impl):
        def f(q, k, v, bias):
            return (windowed_attention_flat(q, k, v, bias, mask, h,
                                            impl=impl) ** 2).sum()
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, r, name in zip(gp, gx, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("w0,b,n,h,d", [(1, 2, 49, 3, 8), (4, 1, 16, 6, 32)])
def test_windowed_cosine_dispatch_odd_shapes(w0, b, n, h, d):
    e = h * d
    q = _rand((w0 * b, n, e), seed=1)
    k = _rand((w0 * b, n, e), seed=2)
    v = _rand((w0 * b, n, e), seed=3)
    scale = jnp.abs(_rand((h,), seed=6)) + 0.5
    bias = _rand((h, n, n), seed=4) * 0.1
    np.testing.assert_allclose(
        np.asarray(windowed_cosine_attention_flat(q, k, v, scale, bias, None,
                                                  h, impl="pallas")),
        np.asarray(windowed_cosine_attention_flat(q, k, v, scale, bias, None,
                                                  h, impl="xla")),
        rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# fused LayerNorm backward — row counts hitting every dispatcher branch
# ---------------------------------------------------------------------------

# (shape, d): rows%8==0 (flat Pallas path), odd N (batch-blocked path:
# ViT 197/577 faces), prime leading dim, 2-D input, tiny rows (XLA fallback)
LN_SHAPES = [
    ((16, 8, 64), 64),        # flat path: rows = 128 ≡ 0 (mod 8)
    ((4, 197, 128), 128),     # ViT-B face — batch-blocked path
    ((3, 577, 64), 64),       # ViT-L face, prime batch
    ((5, 33, 48), 48),        # everything odd, unaligned D
    ((7, 96), 96),            # 2-D input, 7 rows → XLA fallback
    ((1, 1, 256), 256),       # single row
]


@pytest.mark.parametrize("shape,d", LN_SHAPES)
def test_layer_norm_bwd_dispatch_all_shapes(shape, d):
    x = _rand(shape, seed=11)
    scale = _rand((d,), seed=12) * 0.1 + 1.0
    bias = _rand((d,), seed=13) * 0.1

    def f(impl):
        def g(x, scale, bias):
            return (layer_norm(x, scale, bias, impl=impl) ** 2).sum()
        return g

    out_p = layer_norm(x, scale, bias, impl="pallas")
    out_x = layer_norm(x, scale, bias, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    gp = jax.grad(f("pallas"), argnums=(0, 1, 2))(x, scale, bias)
    gx = jax.grad(f("xla"), argnums=(0, 1, 2))(x, scale, bias)
    for a, r, name in zip(gp, gx, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
