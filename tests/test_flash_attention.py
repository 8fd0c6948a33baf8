"""Pallas fused attention vs the XLA reference — values and gradients.

Runs in Pallas interpret mode on the CPU test platform (SURVEY.md §7 hard
part #2: Pallas backward correctness vs XLA reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedvit_tpu.ops.attention import dot_product_attention, xla_attention
from fedvit_tpu.ops.flash_attention import flash_attention


def make_qkv(b=2, n=197, h=4, d=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    def t():
        return jnp.asarray(rng.normal(size=(b, n, h, d)), dtype)
    return t(), t(), t()


@pytest.mark.parametrize("n", [64, 197, 130])
def test_forward_matches_xla(n):
    q, k, v = make_qkv(n=n)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_backward_matches_xla():
    q, k, v = make_qkv(n=96, h=2, d=16)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_xla(q, k, v):
        return (xla_attention(q, k, v) ** 2).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_backward_nonuniform_cotangent():
    q, k, v = make_qkv(n=80, h=2, d=16, seed=3)
    rng = np.random.default_rng(1)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    _, vjp_flash = jax.vjp(lambda *a: flash_attention(*a, interpret=True),
                           q, k, v)
    _, vjp_xla = jax.vjp(xla_attention, q, k, v)
    for a, b, name in zip(vjp_flash(ct), vjp_xla(ct), "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_padding_independence():
    """Result must not depend on the lane padding (N=100 pads to 128)."""
    q, k, v = make_qkv(n=100, h=2, d=16, seed=5)
    out = flash_attention(q, k, v, interpret=True)
    # recompute with explicit larger padding by embedding into N=120 inputs
    q2, k2, v2 = (jnp.pad(t, ((0, 0), (0, 20), (0, 0), (0, 0)))
                  for t in (q, k, v))
    out2 = flash_attention(q2, k2, v2, interpret=True)[:, :100]
    # padded-key contributions must be fully masked in rows 0..99
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert np.isfinite(np.asarray(out2)).all()


def test_bfloat16_inputs():
    q, k, v = make_qkv(n=64, h=2, d=32, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_dispatch_zero_bias_matches_unbiased():
    q, k, v = make_qkv(n=32, h=2, d=16)
    bias = jnp.zeros((2, 32, 32))
    out = dot_product_attention(q, k, v, bias=bias, impl="pallas")
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# Flat windowed biased kernel (Swin rel-pos bias + shift mask path)
# ---------------------------------------------------------------------------

from fedvit_tpu.ops.attention import windowed_attention_flat
from fedvit_tpu.ops.flash_attention import flash_attention_bias_flat


def make_windowed(w0, b, n, e, seed=7):
    rng = np.random.default_rng(seed)
    def t(shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)
    return (t((w0 * b, n, e)), t((w0 * b, n, e)), t((w0 * b, n, e)))


@pytest.mark.parametrize("n,w0,h", [(64, 1, 2), (49, 4, 2), (144, 2, 3)])
def test_wflat_forward_matches_xla(n, w0, h):
    b, e = 3, 48 if h == 3 else 32
    q, k, v = make_windowed(w0, b, n, e, seed=11)
    rng = np.random.default_rng(7)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(w0, n, n)), jnp.float32)
    ref = windowed_attention_flat(q, k, v, bias, mask, h, impl="xla")
    out = flash_attention_bias_flat(q, k, v, bias, mask, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stats,delta", [("0", "0"), ("1", "0"), ("1", "1")])
def test_wflat_backward_matches_xla(monkeypatch, stats, delta):
    """dq, dk, dv AND dbias — the in-kernel dBias accumulation across the
    window×batch grid dimensions must match XLA autodiff through the
    bias add (b > group forces >1 batch tile; w0 > 1 forces >1 window).

    Parametrized over FEDVIT_WATTN_STATS ("1" default: the forward saves
    per-row softmax stats and the backward skips its re-reductions; "0" is
    the full-recompute backward) and FEDVIT_WATTN_DELTA ("1": the backward
    additionally computes the softmax-VJP row correction as do·o — the
    flash-attention delta identity — instead of Σ(dp·p)). All variants must
    stay exact."""
    monkeypatch.setenv("FEDVIT_WATTN_STATS", stats)
    monkeypatch.setenv("FEDVIT_WATTN_DELTA", delta)
    w0, b, n, h, e = 2, 5, 49, 2, 32
    q, k, v = make_windowed(w0, b, n, e, seed=13)
    rng = np.random.default_rng(19)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(w0, n, n)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    _, vjp_pal = jax.vjp(
        lambda q, k, v, bi: flash_attention_bias_flat(q, k, v, bi, mask, h,
                                                      interpret=True),
        q, k, v, bias)
    _, vjp_xla = jax.vjp(
        lambda q, k, v, bi: windowed_attention_flat(q, k, v, bi, mask, h,
                                                    impl="xla"),
        q, k, v, bias)
    for a, r, name in zip(vjp_pal(ct), vjp_xla(ct), ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_wflat_unaligned_head_count_matches_xla():
    """H=6, d=32 (SwinV2-L stage 1) has no 128-lane head-block divisor —
    the kernel's all-heads fallback with unaligned per-head lane slices
    must still be exact (it is also the FAST path: zero-head padding was
    measured slower end-to-end, see ops/attention.py)."""
    w0, b, n, h, e = 2, 3, 64, 6, 192
    q, k, v = make_windowed(w0, b, n, e, seed=31)
    rng = np.random.default_rng(37)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(w0, n, n)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out_p, vjp_pal = jax.vjp(
        lambda q, k, v, bi: windowed_attention_flat(q, k, v, bi, mask, h,
                                                    impl="pallas"),
        q, k, v, bias)
    out_x, vjp_xla = jax.vjp(
        lambda q, k, v, bi: windowed_attention_flat(q, k, v, bi, mask, h,
                                                    impl="xla"),
        q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    for a, r, name in zip(vjp_pal(ct), vjp_xla(ct), ["q", "k", "v", "bias"]):
        assert a.shape == r.shape, f"d{name} shape {a.shape} vs {r.shape}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_wcos_forward_and_grads_match_xla():
    """The fused cosine kernel (in-kernel per-head L2 norm + SMEM logit
    scale) must match the XLA reference formulation in forward and in all
    five cotangents — dq/dk (normalization chain rule incl. the 1e-6 norm
    clamp), dv, dBias, and the per-head dScale accumulated across the
    window×batch grid."""
    from fedvit_tpu.ops.attention import windowed_cosine_attention_flat
    from fedvit_tpu.ops.flash_attention import flash_attention_cosine_flat
    w0, b, n, h, e = 2, 5, 49, 2, 32
    q, k, v = make_windowed(w0, b, n, e, seed=41)
    rng = np.random.default_rng(43)
    scale = jnp.asarray(rng.uniform(5.0, 15.0, size=(h,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(w0, n, n)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out_p, vjp_pal = jax.vjp(
        lambda q, k, v, s, bi: flash_attention_cosine_flat(
            q, k, v, s, bi, mask, h, interpret=True),
        q, k, v, scale, bias)
    out_x, vjp_xla = jax.vjp(
        lambda q, k, v, s, bi: windowed_cosine_attention_flat(
            q, k, v, s, bi, mask, h, impl="xla"),
        q, k, v, scale, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    for a, r, name in zip(vjp_pal(ct), vjp_xla(ct),
                          ["q", "k", "v", "scale", "bias"]):
        assert a.shape == r.shape, f"d{name} {a.shape} vs {r.shape}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_wcos_norm_clamp_zero_rows():
    """All-zero q/k rows hit the ‖x‖ ≤ 1e-6 clamp: forward must be finite
    and the clamped rows' normalization grads must be the constant-r
    branch (no NaN from 0/0)."""
    from fedvit_tpu.ops.attention import windowed_cosine_attention_flat
    w0, b, n, h, e = 1, 2, 16, 2, 32
    q, k, v = make_windowed(w0, b, n, e, seed=47)
    q = q.at[:, :4].set(0.0)
    k = k.at[:, 2:6].set(0.0)
    scale = jnp.full((h,), 10.0, jnp.float32)
    bias = jnp.zeros((h, n, n), jnp.float32)

    def run(impl):
        def f(q, k, v, s):
            o = windowed_cosine_attention_flat(q, k, v, s, bias, None, h,
                                               impl=impl)
            return (o ** 2).sum()
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(q, k, v,
                                                                 scale)
        return val, grads

    vx, gx = run("xla")
    vp, gp = run("pallas")   # interpret on CPU
    assert np.isfinite(float(vp))
    # the kernel's clamp branch keeps grads FINITE on zero rows — the XLA
    # formulation NaNs there (norm's autodiff at 0 is 0/0), so the kernel
    # is strictly safer; compare only where XLA itself is finite
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, r in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        a, r = np.asarray(a), np.asarray(r)
        assert np.isfinite(a).all(), "pallas grads must be finite"
        fin = np.isfinite(r)
        np.testing.assert_allclose(a[fin], r[fin], rtol=2e-4, atol=2e-4)


def test_wflat_no_mask_broadcasts():
    """mask=None must equal an explicit zero mask on both impls."""
    w0, b, n, h, e = 1, 4, 36, 2, 32
    q, k, v = make_windowed(w0, b, n, e, seed=23)
    rng = np.random.default_rng(29)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    zero = jnp.zeros((1, n, n), jnp.float32)
    for impl in ("pallas", "xla"):
        a = windowed_attention_flat(q, k, v, bias, None, h, impl=impl)
        r = windowed_attention_flat(q, k, v, bias, zero, h, impl=impl)
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-6)


def test_swin_block_pallas_matches_xla():
    """A real SwinV2 block (cosine attention, CPB bias, shifted windows)
    must produce identical outputs and parameter grads on both paths."""
    from fedvit_tpu.models.swin import SwinBlockV2

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)

    def build(impl):
        return SwinBlockV2(num_heads=2, window=8, shift=4, drop_path=0.0,
                           attention_impl=impl)

    params = build("xla").init({"params": jax.random.key(0)}, x)["params"]

    def loss(params, impl):
        out = build(impl).apply({"params": params}, x, True)
        return (out.astype(jnp.float32) ** 2).sum()

    v_x, g_x = jax.value_and_grad(loss)(params, "xla")
    v_p, g_p = jax.value_and_grad(loss)(params, "pallas")
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    for (path, a), (_, b) in zip(flat_p, flat_x):
        # grads span 1e-4..1e3 here; scale atol to the leaf's magnitude
        tol = 2e-4 * max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=tol,
                                   err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# Flat-layout kernel (the zero-layout-op hot path, ops/flash_attention.py)
# ---------------------------------------------------------------------------

from fedvit_tpu.ops.attention import dot_product_attention_flat
from fedvit_tpu.ops.flash_attention import flash_attention_flat


def make_flat(b=4, n=197, e=128, seed=41, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    def t():
        return jnp.asarray(rng.normal(size=(b, n, e)), dtype)
    return t(), t(), t()


@pytest.mark.parametrize("b,n,e,h", [(4, 197, 128, 4), (3, 64, 96, 3),
                                     (6, 130, 64, 1)])
def test_flat_forward_matches_xla(b, n, e, h):
    q, k, v = make_flat(b, n, e)
    d = e // h
    ref = xla_attention(q.reshape(b, n, h, d), k.reshape(b, n, h, d),
                        v.reshape(b, n, h, d)).reshape(b, n, e)
    out = flash_attention_flat(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flat_backward_matches_xla():
    b, n, e, h = 5, 96, 64, 2   # b=5 → batch group must divide (g=1 or 5)
    q, k, v = make_flat(b, n, e, seed=43)
    d = e // h

    def loss_flat(q, k, v):
        return (flash_attention_flat(q, k, v, h, interpret=True) ** 2).sum()

    def loss_xla(q, k, v):
        out = xla_attention(q.reshape(b, n, h, d), k.reshape(b, n, h, d),
                            v.reshape(b, n, h, d))
        return (out.reshape(b, n, e) ** 2).sum()

    g_flat = jax.grad(loss_flat, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(g_flat, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_flat_dispatch_pallas_vs_xla():
    q, k, v = make_flat(4, 49, 96, seed=47)
    out_p = dot_product_attention_flat(q, k, v, 3, impl="pallas")
    out_x = dot_product_attention_flat(q, k, v, 3, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_flat_head_layout_is_head_major():
    """Head h must live at lanes [h·d, (h+1)·d) — the layout contract shared
    with the QKV projection slicing in models/layers.py and the torch
    pretrained-weight import."""
    b, n, e, h = 2, 32, 64, 2
    q, k, v = make_flat(b, n, e, seed=53)
    out = flash_attention_flat(q, k, v, h, interpret=True)
    d = e // h
    for t in range(h):
        sl = slice(t * d, (t + 1) * d)
        ref_h = xla_attention(q[..., sl][:, :, None].transpose(0, 1, 2, 3)
                              .reshape(b, n, 1, d),
                              k[..., sl].reshape(b, n, 1, d),
                              v[..., sl].reshape(b, n, 1, d))
        np.testing.assert_allclose(np.asarray(out[..., sl]),
                                   np.asarray(ref_h.reshape(b, n, d)),
                                   rtol=2e-5, atol=2e-5)


def test_qkv_packed_matches_flat():
    """flash_attention_qkv on the packed tensor must equal the flat/XLA
    paths for values and the packed-cotangent backward."""
    from fedvit_tpu.ops.attention import attention_from_qkv
    from fedvit_tpu.ops.flash_attention import flash_attention_qkv
    b, n, e, h = 4, 50, 64, 2
    rng = np.random.default_rng(61)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * e)), jnp.float32)

    out_p = flash_attention_qkv(qkv, h, interpret=True)
    out_x = attention_from_qkv(qkv, h, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)

    def loss(fn):
        return jax.grad(lambda t: (fn(t).astype(jnp.float32) ** 2).sum())(qkv)

    g_p = loss(lambda t: flash_attention_qkv(t, h, interpret=True))
    g_x = loss(lambda t: attention_from_qkv(t, h, impl="xla"))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=2e-4, atol=2e-4)


def test_xqkv_mega_forward_and_grads_match_xla():
    """The mega kernel (QKV projection fused into attention) must match the
    XLA composition Dense→attention in forward and in dx/dW/db — including
    the in-kernel dW/db accumulation across multiple batch-grid steps."""
    from fedvit_tpu.ops.attention import attention_from_x

    b, n, h, dim = 4, 64, 4, 128
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(dim, 3 * dim)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3 * dim,)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)

    from fedvit_tpu.ops.flash_attention import flash_attention_xqkv
    out_p, vjp_pal = jax.vjp(
        lambda x, w, bias: flash_attention_xqkv(x, w, bias, h,
                                                interpret=True),
        x, w, bias)
    out_x, vjp_xla = jax.vjp(
        lambda x, w, bias: attention_from_x(x, w, bias, h, impl="xla"),
        x, w, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    for a, r, name in zip(vjp_pal(ct), vjp_xla(ct), ["x", "w", "b"]):
        assert a.shape == r.shape, f"d{name} shape {a.shape} vs {r.shape}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=f"d{name}")


def test_mega_attention_impl_in_vit_block():
    """attention_impl='mega' must produce the same model function as the
    default path (same param tree, same logits) on a tiny ViT."""
    from fedvit_tpu.core.config import from_dict
    from fedvit_tpu.models import build_model

    def build(impl):
        cfg = from_dict({
            "model": {"backbone": "vit_tiny_patch16_224", "image_size": 224,
                      "compute_dtype": "float32", "attention_impl": impl,
                      "metadata": {"enabled": False}},
        })
        return build_model(cfg)

    rng = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(2, 224, 224, 3)),
                    jnp.float32)
    m_ref = build("xla")
    v_ref = m_ref.init({"params": rng, "dropout": rng}, x, None)
    m_mega = build("mega")
    v_mega = m_mega.init({"params": rng, "dropout": rng}, x, None)
    # identical param trees (shapes AND values: same init streams)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_ref["params"], v_mega["params"])
    o_ref = m_ref.apply(v_ref, x, None, deterministic=True)
    o_mega = m_mega.apply(v_mega, x, None, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_mega["logits"]),
                               np.asarray(o_ref["logits"]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("stats,delta", [("0", "0"), ("1", "0"), ("1", "1")])
def test_qkvb_matches_qkv_plus_bias(monkeypatch, stats, delta):
    """flash_attention_qkvb(qkv, bias) must equal attention over qkv+bias in
    forward and in the dqkv/dbias backward — with the batch grid forced to
    multiple steps so the in-kernel dbias accumulation is exercised.

    Parametrized over FEDVIT_QKVB_STATS ("1" saves per-row softmax stats —
    row max + 1/Σ — in forward and the backward recomputes p from them
    without its own reductions, _qkvb_bwd_stats_kernel; "0" (default) is
    the full-recompute backward) and FEDVIT_QKVB_DELTA ("1": the backward's
    softmax-VJP row correction is computed as do·o, _qkvb_bwd_delta_kernel)."""
    from fedvit_tpu.ops.attention import attention_from_qkv
    from fedvit_tpu.ops.flash_attention import flash_attention_qkvb

    monkeypatch.setenv("FEDVIT_QKVB_STATS", stats)
    monkeypatch.setenv("FEDVIT_QKVB_DELTA", delta)
    monkeypatch.setenv("FEDVIT_ATTN_G", "1,1")   # 4 grid steps at b=4
    b, n, e, h = 4, 50, 64, 2
    rng = np.random.default_rng(62)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * e)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(3 * e,)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)

    out_p, vjp_pal = jax.vjp(
        lambda t, c: flash_attention_qkvb(t, c, h, interpret=True), qkv, bias)
    out_x, vjp_xla = jax.vjp(
        lambda t, c: attention_from_qkv(t + c.reshape(1, 1, -1), h,
                                        impl="xla"), qkv, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    for a, r, name in zip(vjp_pal(ct), vjp_xla(ct), ["qkv", "bias"]):
        assert a.shape == r.shape, f"d{name} shape {a.shape} vs {r.shape}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=f"d{name}")


def test_default_attention_composition_matches_packed():
    """The default MHA composition (bias-free projection + in-kernel bias)
    must keep the nn.Dense-identical param tree and reproduce the 'packed'
    (Dense epilogue bias) logits exactly in f32."""
    from fedvit_tpu.core.config import from_dict
    from fedvit_tpu.models import build_model

    def build(impl):
        cfg = from_dict({
            "model": {"backbone": "vit_tiny_patch16_224", "image_size": 224,
                      "compute_dtype": "float32", "attention_impl": impl,
                      "metadata": {"enabled": False}},
        })
        return build_model(cfg)

    rng = jax.random.key(0)
    x = jnp.asarray(np.random.default_rng(5).uniform(size=(2, 224, 224, 3)),
                    jnp.float32)
    m_ref = build("packed")
    v_ref = m_ref.init({"params": rng, "dropout": rng}, x, None)
    m_new = build("auto")
    v_new = m_new.init({"params": rng, "dropout": rng}, x, None)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_ref["params"], v_new["params"])
    o_ref = m_ref.apply(v_ref, x, None, deterministic=True)
    o_new = m_new.apply(v_new, x, None, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_new["logits"]),
                               np.asarray(o_ref["logits"]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("delta", ["0", "1"])
def test_wflat_backward_bf16_accuracy(monkeypatch, delta):
    """bf16 accuracy of the windowed stats/delta backwards vs an f32 oracle.

    The delta variant computes the softmax-VJP row correction as do·o from
    the STORED-precision forward output — under bf16 inputs o is rounded to
    bf16 before the dot, so its correction is inherently less accurate than
    the stats path's in-kernel f32 Σ(dp·p). Inputs are exact bf16 values
    (generated f32 → bf16 → upcast for the oracle) so the tolerance below
    measures internal rounding only. Both variants must stay within a
    bf16-scale bound of the f32 XLA reference; f32 exactness is pinned
    separately by test_wflat_backward_matches_xla."""
    monkeypatch.setenv("FEDVIT_WATTN_STATS", "1")
    monkeypatch.setenv("FEDVIT_WATTN_DELTA", delta)
    w0, b, n, h, e = 2, 3, 49, 2, 32
    q32, k32, v32 = make_windowed(w0, b, n, e, seed=43)
    rng = np.random.default_rng(47)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(w0, n, n)), jnp.float32)
    to_bf = lambda t: t.astype(jnp.bfloat16)
    q, k, v = to_bf(q32), to_bf(k32), to_bf(v32)
    ct32 = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
    ct = to_bf(ct32)

    _, vjp_pal = jax.vjp(
        lambda q, k, v, bi: flash_attention_bias_flat(q, k, v, bi, mask, h,
                                                      interpret=True),
        q, k, v, bias)
    _, vjp_xla = jax.vjp(
        lambda q, k, v, bi: windowed_attention_flat(q, k, v, bi, mask, h,
                                                    impl="xla"),
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), bias)
    grads_p = vjp_pal(ct)
    grads_x = vjp_xla(ct.astype(jnp.float32))
    for a, r, name in zip(grads_p, grads_x, ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(r),
                                   rtol=5e-2, atol=5e-2, err_msg=f"d{name}")


@pytest.mark.parametrize("delta", ["0", "1"])
def test_qkvb_backward_bf16_accuracy(monkeypatch, delta):
    """Same bf16 bound for the packed-QKV stats/delta backwards (the delta
    kernel's row correction do·o reads the bf16-rounded forward output o;
    see _qkvb_bwd_delta_kernel)."""
    from fedvit_tpu.ops.attention import attention_from_qkv
    from fedvit_tpu.ops.flash_attention import flash_attention_qkvb

    monkeypatch.setenv("FEDVIT_QKVB_STATS", "1")
    monkeypatch.setenv("FEDVIT_QKVB_DELTA", delta)
    monkeypatch.setenv("FEDVIT_ATTN_G", "1,1")
    b, n, e, h = 4, 50, 64, 2
    rng = np.random.default_rng(53)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * e)),
                      jnp.float32).astype(jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(3 * e,)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b, n, e)),
                     jnp.float32).astype(jnp.bfloat16)

    _, vjp_pal = jax.vjp(
        lambda t, c: flash_attention_qkvb(t, c, h, interpret=True),
        qkv, bias)
    _, vjp_xla = jax.vjp(
        lambda t, c: attention_from_qkv(t + c.reshape(1, 1, -1), h,
                                        impl="xla"),
        qkv.astype(jnp.float32), bias)
    grads_p = vjp_pal(ct)
    grads_x = vjp_xla(ct.astype(jnp.float32))
    for a, r, name in zip(grads_p, grads_x, ["qkv", "bias"]):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(r),
                                   rtol=5e-2, atol=5e-2, err_msg=f"d{name}")


@pytest.mark.parametrize("softmax", ["postdiv", "dotsum"])
def test_wflat_stats_fwd_softmax_variants_match_xla(monkeypatch, softmax):
    """FEDVIT_WATTN_SOFTMAX fwd variants of the STATS kernel (postdiv:
    normalize the (N, d) output after PV; dotsum: additionally compute the
    row sum as a p·ones MXU matvec instead of a cross-lane reduce) must
    stay exact in f32 — forward AND the stats-consuming backward (the
    backward recomputes p from the saved mx/inv, so a wrong inv would
    surface in the gradients too)."""
    monkeypatch.setenv("FEDVIT_WATTN_STATS", "1")
    monkeypatch.setenv("FEDVIT_WATTN_SOFTMAX", softmax)
    w0, b, n, h, e = 2, 3, 49, 2, 32
    q, k, v = make_windowed(w0, b, n, e, seed=59)
    rng = np.random.default_rng(61)
    bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(w0, n, n)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out_p, vjp_pal = jax.vjp(
        lambda q, k, v, bi: flash_attention_bias_flat(q, k, v, bi, mask, h,
                                                      interpret=True),
        q, k, v, bias)
    out_x, vjp_xla = jax.vjp(
        lambda q, k, v, bi: windowed_attention_flat(q, k, v, bi, mask, h,
                                                    impl="xla"),
        q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    for a, r, name in zip(vjp_pal(ct), vjp_xla(ct), ["q", "k", "v", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")
