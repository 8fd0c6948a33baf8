"""Fused-backward LayerNorm vs flax nn.LayerNorm (oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from fedvit_tpu.ops.layer_norm import LayerNorm, layer_norm


def _rand(shape, dtype, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(6, 197, 768), (4, 12, 12, 192)])
def test_forward_matches_flax(dtype, shape):
    x = _rand(shape, dtype)
    d = shape[-1]
    ref = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    var = ref.init(jax.random.PRNGKey(1), x)
    got = layer_norm(x, var["params"]["scale"], var["params"]["bias"],
                     eps=1e-5, dtype=dtype, impl="xla")
    want = ref.apply(var, x)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol,
                               rtol=tol)
    assert got.dtype == dtype and got.shape == shape


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_backward_matches_flax_grads(dtype):
    shape = (6, 197, 768)
    x = _rand(shape, dtype)
    dy = _rand(shape, dtype, seed=2)
    scale = _rand((768,), jnp.float32, seed=3) + 1.0
    bias = _rand((768,), jnp.float32, seed=4)

    def fused(x, s, b):
        y = layer_norm(x, s, b, eps=1e-5, dtype=dtype, impl="pallas",
                       interpret=True)
        return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

    def oracle(x, s, b):
        ref = nn.LayerNorm(epsilon=1e-5, dtype=dtype)
        y = ref.apply({"params": {"scale": s, "bias": b}}, x)
        return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

    gx, gs, gb = jax.grad(fused, argnums=(0, 1, 2))(x, scale, bias)
    ox, os_, ob = jax.grad(oracle, argnums=(0, 1, 2))(x, scale, bias)
    tol = 1e-4 if dtype == jnp.float32 else 1e-1
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(ox, np.float32), atol=tol, rtol=tol)
    # column reductions over ~1.2k rows: compare with scaled tolerance
    np.testing.assert_allclose(np.asarray(gs), np.asarray(os_),
                               atol=tol * 30, rtol=tol)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ob),
                               atol=tol * 30, rtol=tol)
    assert gx.dtype == dtype
    assert gs.dtype == jnp.float32 and gb.dtype == jnp.float32


@pytest.mark.parametrize("shape", [(4, 577, 128), (6, 197, 768)])
def test_awkward_row_counts_use_3d_blocks(shape):
    # 4·577 has no multiple-of-8 divisor — exercises the (gb, N, D) path
    x = _rand(shape, jnp.float32)
    dy = _rand(shape, jnp.float32, seed=2)
    d = shape[-1]
    scale = _rand((d,), jnp.float32, seed=3) + 1.0
    bias = jnp.zeros((d,))

    def fused(x, s):
        y = layer_norm(x, s, bias, eps=1e-6, impl="pallas", interpret=True)
        return jnp.sum(y * dy)

    def oracle(x, s):
        y = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": s, "bias": bias}}, x)
        return jnp.sum(y * dy)

    gx, gs = jax.grad(fused, argnums=(0, 1))(x, scale)
    ox, os_ = jax.grad(oracle, argnums=(0, 1))(x, scale)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ox), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(os_), atol=3e-3,
                               rtol=1e-4)


def test_degenerate_rows_fall_back_to_xla_path():
    x = _rand((4, 16), jnp.float32)
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))

    def f(x):
        return jnp.sum(layer_norm(x, scale, bias, eps=1e-6,
                                  impl="pallas", interpret=True) ** 2)

    def o(x):
        ref = nn.LayerNorm(epsilon=1e-6)
        return jnp.sum(ref.apply(
            {"params": {"scale": scale, "bias": bias}}, x) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(o)(x)), atol=1e-5,
                               rtol=1e-5)


def test_backward_dispatch_never_forces_relayout(monkeypatch):
    """The bwd picks 2D row blocks only when flattening to (rows, D) is a
    layout-free bitcast (second-minor dim 8-aligned); otherwise it blocks
    over the batch dim on the original shape (measured: the relayout copy
    costs ~13 ms/step on the ViT-B bs=192 train step)."""
    import fedvit_tpu.ops.layer_norm as lnmod

    calls = []
    real = lnmod._ln_bwd_pallas

    def spy(xb, s, dyb, eps, interp, lead):
        calls.append((xb.shape, lead))
        return real(xb, s, dyb, eps, True, lead)

    monkeypatch.setattr(lnmod, "_ln_bwd_pallas", spy)

    def run(shape):
        calls.clear()
        x = _rand(shape, jnp.float32)
        s = jnp.ones((shape[-1],))
        b = jnp.zeros((shape[-1],))
        jax.grad(lambda x: jnp.sum(lnmod.layer_norm(
            x, s, b, impl="pallas", interpret=True) ** 2))(x)
        return calls[0] if calls else None

    # ViT-B-like: 197 tokens not 8-aligned -> batch-blocked, NO flatten
    got = run((16, 197, 256))
    assert got == ((16, 197, 256), 16), got
    # 8-aligned tokens -> free flatten, 2D row blocks
    got = run((16, 64, 256))
    assert got is not None and len(got[0]) == 2 and got[0][1] == 256, got
    # 4D swin-stage-like with 12x12 face (not 8-aligned) -> 4D batch blocks
    got = run((8, 12, 12, 384))
    assert got == ((8, 12, 12, 384), 8), got


def test_module_param_tree_matches_nn_layer_norm():
    x = _rand((2, 9, 64), jnp.float32)
    ours = LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    flax_ = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(ours) == \
        jax.tree_util.tree_structure(flax_)
    got = LayerNorm(epsilon=1e-5).apply(flax_, x)
    want = nn.LayerNorm(epsilon=1e-5).apply(flax_, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
