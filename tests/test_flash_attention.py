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


def test_dispatch_uses_xla_for_bias():
    q, k, v = make_qkv(n=32, h=2, d=16)
    bias = jnp.zeros((2, 32, 32))
    out = dot_product_attention(q, k, v, bias=bias, impl="pallas")
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
