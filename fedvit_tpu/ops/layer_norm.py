"""Fused LayerNorm — XLA forward, single-pass Pallas backward.

Trace evidence (v5e, ViT-B/16@224 bs=192 train step, round 3): XLA lowers
each LayerNorm backward into 3-4 separate elementwise+reduce fusions —
`convert_reduce_fusion` / `multiply_reduce_fusion` groups totalling ~38 ms
of the 150 ms step, ~4-7× over the HBM speed-of-light of the tensors they
touch. The slow part is structural: dgamma/dbeta are reductions over the
~38k batch·token rows (the MAJOR dims), which XLA performs as separate
strided passes over the (R, D) cotangent, re-reading dy and the
recomputed x̂ once per pass.

The Pallas backward makes it one pass: the sequential row-block grid reads
each (x, dy) block exactly once, computes dx in-block, and accumulates
dgamma/dbeta into (1, D) f32 outputs that stay VMEM-resident across grid
steps (constant index_map — same revisited-accumulator pattern as the
windowed-attention dBias in `ops/flash_attention.py`). Total HBM traffic is
read x + read dy + write dx, which is the analytic minimum.

Measured (v5e, round 3). The kernel itself hits that minimum — XLA's
`multiply_reduce` LN-backward passes (22.8 ms/step on ViT-B bs=192) become
a 5.5 ms/step kernel — but two boundary effects decide the end-to-end
result and shaped this file:
  * Flattening (B, N, D) -> (B·N, D) around the kernel is a real relayout
    copy when N isn't 8-aligned (ViT's 197/577): first attempt cost
    +13 ms/step of `reshape` ops (150.6 -> 175.0 ms/step). The dispatch
    below therefore never reshapes unless it's a free bitcast.
  * The custom-call boundary materializes dy/dx that XLA previously fused
    into neighbouring backward chains: ~+19 ms/step of `fusion` time on
    ViT-B, cancelling the reduce win exactly (150.8 vs 150.6 ms/step —
    parity). SwinV2-L@384 bs=16, whose LN rows/D ratios are steeper,
    nets a real win: 169.4 -> 166.9 ms/step (94.5 -> 95.9 img/s).

The forward stays XLA: it fuses into neighbouring matmul prologues, and a
custom kernel there would only break those fusions (same reasoning as the
measured mega-kernel negative result in `ops/flash_attention.py`). Stats
are computed in f32 regardless of the compute dtype, like flax
``nn.LayerNorm``; the module below is param-tree-identical to
``nn.LayerNorm`` ("scale", "bias") so checkpoints and torch weight import
are unaffected.

Reference parity: torch ``nn.LayerNorm`` inside the reference's timm
backbones (/root/reference/model.py:112-166).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fedvit_tpu.ops.flash_attention import _interpret_flag, _scoped_vmem_kwargs

# Row blocks sized so the kernel's f32 temporaries (x, dy, x̂, g, dx and
# Mosaic's own copies — budget ~8 block-sized f32 arrays) fit the default
# 16M scoped-VMEM window with margin.
_BLOCK_F32_BUDGET = 10 * 1024 * 1024


def _row_block(rows: int, d: int) -> int:
    """Largest multiple-of-8 divisor of `rows` whose (rb, d) f32
    temporaries fit VMEM (Mosaic requires the sublane dim of a partial
    block to be divisible by 8)."""
    cap = max(1, _BLOCK_F32_BUDGET // (8 * 4 * d))
    for rb in range(min(rows, cap) // 8 * 8, 0, -8):
        if rows % rb == 0:
            return rb
    return 0


def _ln_fwd(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
            eps: float, dtype) -> jnp.ndarray:
    # One pass over x for both reductions (E[x], E[x²]) — the centered
    # two-pass form forces XLA to read x twice because the second reduce
    # depends on the first's result. Same formula as flax `_compute_stats`.
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mu * mu, 0.0)
    xhat = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def _ln_bwd_kernel(eps: float, x_ref, dy_ref, s_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)        # (rb, D) or (gb, ..., D)
    dy = dy_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)        # (1, D)
    s = s.reshape((1,) * (x.ndim - 1) + (-1,))
    mu = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mu * mu, 0.0)
    xc = x - mu
    r = jax.lax.rsqrt(var + eps)
    xhat = xc * r
    g = dy * s
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (r * (g - m1 - xhat * m2)).astype(dx_ref.dtype)
    red = tuple(range(x.ndim - 1))
    dg_ref[...] += jnp.sum(dy * xhat, axis=red).reshape(dg_ref.shape)
    db_ref[...] += jnp.sum(dy, axis=red).reshape(db_ref.shape)


def _ln_bwd_pallas(xb: jnp.ndarray, s: jnp.ndarray, dyb: jnp.ndarray,
                   eps: float, interp: bool, lead: int):
    """xb/dyb pre-shaped so dim 0 is divisible by the `lead` block and the
    remaining dims are carried whole in each block (Mosaic's partial-block
    divisibility rule never applies to full dims)."""
    shape = xb.shape
    d = shape[-1]
    nd = len(shape)
    blk = (lead,) + shape[1:]
    row_spec = pl.BlockSpec(blk, lambda i: (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    live = 8 * int(np.prod(blk)) * 4 + 2 * d * 4
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps),
        grid=(shape[0] // lead,),
        in_specs=[row_spec, row_spec, vec_spec],
        out_specs=[row_spec, vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct(shape, xb.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=interp,
        **_scoped_vmem_kwargs(live, interp),
    )(xb, dyb, s.reshape(1, d))
    return dx, dg[0], db[0]


def _ln_bwd_xla(x2: jnp.ndarray, s: jnp.ndarray, dy2: jnp.ndarray,
                eps: float):
    """Analytic LN backward in plain jnp (degenerate-shape fallback)."""
    x32 = x2.astype(jnp.float32)
    dy = dy2.astype(jnp.float32)
    s32 = s.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = xc * r
    g = dy * s32
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx = (r * (g - m1 - xhat * m2)).astype(x2.dtype)
    return dx, jnp.sum(dy * xhat, axis=0), jnp.sum(dy, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _layer_norm_fused(x, scale, bias, eps: float, dtype,
                      interpret: Optional[bool]):
    return _ln_fwd(x, scale, bias, eps, dtype)


def _ln_fwd_rule(x, scale, bias, eps, dtype, interpret):
    return _ln_fwd(x, scale, bias, eps, dtype), (x, scale)


# Budget for the batch-blocked path's (gb, ..., D) blocks — scoped VMEM is
# raised to fit (the v5e has 128M; _scoped_vmem_kwargs caps at 120M).
_BLOCK3D_BUDGET = 40 * 1024 * 1024


def _ln_bwd_rule(eps, dtype, interpret, res, dy):
    x, scale = res
    d = x.shape[-1]
    rows = x.size // d
    # Flattening (..., N, D) -> (rows, D) is a free bitcast on TPU only when
    # the second-minor dim stays 8-aligned (whole sublane tiles stack).
    # For ViT's N=197/577 XLA instead inserts a real relayout copy on BOTH
    # sides of the kernel — measured ~13 ms/step of `reshape` ops on the
    # ViT-B bs=192 train step, erasing the kernel's win — so in that case
    # block over the leading batch dim and carry the trailing face whole
    # (full trailing dims are exempt from the (8, 128) divisibility rule).
    flatten_free = x.ndim == 2 or x.shape[-2] % 8 == 0
    rb = _row_block(rows, d) if flatten_free else 0
    per_lead = 8 * (x.size // x.shape[0]) * 4
    gb = next((c for c in range(x.shape[0], 0, -1)
               if x.shape[0] % c == 0 and c * per_lead <= _BLOCK3D_BUDGET),
              0) if x.ndim >= 3 else 0
    if rb >= 64:
        dx, dg, db = _ln_bwd_pallas(x.reshape(rows, d), scale,
                                    dy.reshape(rows, d), eps,
                                    _interpret_flag(interpret), rb)
    elif gb:
        dx, dg, db = _ln_bwd_pallas(x, scale, dy, eps,
                                    _interpret_flag(interpret), gb)
    else:
        dx, dg, db = _ln_bwd_xla(x.reshape(rows, d), scale,
                                 dy.reshape(rows, d), eps)
    return (dx.reshape(x.shape).astype(x.dtype),
            dg.astype(scale.dtype), db.astype(scale.dtype))


_layer_norm_fused.defvjp(_ln_fwd_rule, _ln_bwd_rule)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6, dtype: Any = None, impl: str = "auto",
               interpret: Optional[bool] = None) -> jnp.ndarray:
    """LayerNorm over the last axis; f32 stats, output cast to `dtype`.

    impl: "auto" (fused Pallas backward iff on TPU), "pallas", or "xla"
    (plain jnp, XLA autodiff backward — also the CPU default, where the
    interpret-mode kernel would only slow tests down).
    """
    dtype = dtype or x.dtype
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _ln_fwd(x, scale, bias, eps, dtype)
    return _layer_norm_fused(x, scale, bias, eps, dtype, interpret)


class LayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same "scale"/"bias" param tree) with
    the fused Pallas backward on TPU."""
    epsilon: float = 1e-6
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return layer_norm(x, scale, bias, self.epsilon, self.dtype,
                          self.impl)
