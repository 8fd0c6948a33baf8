"""gelu: the bf16 fast path (tanh form) must be indistinguishable from
exact erf at bfloat16 precision; f32 path must BE exact erf. The retired
degree-7 polynomial stays covered as the accuracy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from fedvit_tpu.ops.activations import _gelu_poly, gelu


def test_f32_path_is_exact_erf():
    x = jnp.asarray(np.linspace(-30, 30, 10001), jnp.float32)
    np.testing.assert_array_equal(np.asarray(gelu(x)),
                                  np.asarray(jax.nn.gelu(x,
                                                         approximate=False)))


def test_bf16_path_within_one_ulp():
    xs = np.linspace(-50, 50, 200001).astype(np.float32)
    x16 = jnp.asarray(xs, jnp.bfloat16)
    fast = np.asarray(gelu(x16), np.float32)
    exact = np.asarray(
        jax.nn.gelu(x16.astype(jnp.float32), approximate=False)
        .astype(jnp.bfloat16), np.float32)
    # absolute error bound: poly fit max 6.6e-4 + one bf16 rounding
    err = np.abs(fast - exact)
    scale = np.maximum(np.abs(exact), 1.0)
    # bf16 has 7 explicit mantissa bits: one ulp step is 2^-7 relative
    # (2^-6 just above a binade boundary)
    assert (err / scale).max() < 2 ** -6, (err / scale).max()
    # mismatches beyond one bf16 ulp: none
    ulp = np.maximum(np.abs(exact), 2.0 ** -126) * 2 ** -7
    assert (err <= ulp + 7e-4).all()


def test_bf16_grad_matches_erf_grad():
    xs = (np.linspace(-8, 8, 4001) + 1.7e-3).astype(np.float32)
    g_fast = np.asarray(jax.vmap(jax.grad(
        lambda x: gelu(x.astype(jnp.bfloat16)).astype(jnp.float32)))(
            jnp.asarray(xs)))
    g_ref = np.asarray(jax.vmap(jax.grad(
        lambda x: jax.nn.gelu(x, approximate=False)))(jnp.asarray(xs)))
    # tanh-GELU's derivative is smooth; max deviation from the exact-erf
    # derivative is ~4e-3 (no seams to exclude)
    np.testing.assert_allclose(g_fast, g_ref, atol=8e-3)


def test_poly_reference_still_subulp():
    # the retired degree-7 polynomial remains the documented accuracy
    # reference (PARITY.md) — keep its bound pinned
    xs = np.linspace(-50, 50, 200001).astype(np.float32)
    fast = np.asarray(_gelu_poly(jnp.asarray(xs)), np.float32)
    exact = np.asarray(jax.nn.gelu(jnp.asarray(xs), approximate=False),
                       np.float32)
    assert np.abs(fast - exact).max() < 7e-4
