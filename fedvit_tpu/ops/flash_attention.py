"""Pallas fused attention — forward + custom-VJP backward.

The driver north star requires the ViT attention to be a Pallas kernel for
both passes. ViT shapes here are short-sequence (N ≤ ~640 tokens: 197 for
ViT-B/16@224, 577 for ViT-L/16@384), so the optimal TPU schedule is NOT a
long-sequence flash loop: the whole (N, N) score tile fits in VMEM. The
performance problem at these shapes is *layout*, not memory: any design that
wants (B·H, N, D)-shaped operands forces XLA to emit transpose + pad + slice
ops around the kernel, and on a v5e those layout ops cost ~3× the attention
math itself (measured: 45 ms/step of pure data formatting on the ViT-B/16
@224 bs=128 train step).

The kernel therefore consumes q, k, v **exactly as the QKV projection
produces them**: flat (B, N, E) arrays with heads packed head-major along
the lane (minor) dimension. Blocks are (g, N, E) slices of the batch — a
fully contiguous DMA — and each grid cell loops over the heads with
64·h-aligned lane slices, running one batched (g, N, D)·(g, M, D) MXU dot
per head with the softmax tile VMEM-resident (never written to HBM). No
XLA-side transpose, pad, or slice exists in either pass (measured on-device:
1.87 ms vs 3.96 ms for the layout-based variant, fwd, ViT-B shapes).

The backward recomputes the score tile and its row statistics from q, k —
no attention residuals are persisted at all (the memory cost of the op is
exactly its q/k/v/o tensors) — and emits dQ, dK, dV in one kernel, again in
flat (B, N, E) layout so the cotangents flow straight into the QKV
projection's VJP.

Biased attention (`flash_attention_bias`) covers Swin's relative-position
bias + shift mask: scores = q·kᵀ + bias with bias differentiable — the
backward ACCUMULATES dBias across the batch grid dimension inside the kernel
(the bias block is revisited across consecutive grid steps, so the partial
sum lives in VMEM). Any score scale (1/√d, or SwinV2's learned cosine scale)
is folded into q by the caller, so scale gradients flow through XLA outside
the kernel.

Reference parity: this op implements the attention inside the reference's
timm backbones (/root/reference/model.py:112-117).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


def _pad_axis(x: jnp.ndarray, n: int, axis: int) -> jnp.ndarray:
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _interpret_flag(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Flat-layout kernels — refs are (g, N, E) batch slices, heads along lanes
# ---------------------------------------------------------------------------

_BATCHED_QKT = (((2,), (2,)), ((0,), (0,)))   # (G,N,D)·(G,M,D) → (G,N,M)
_BATCHED_PV = (((2,), (1,)), ((0,), (0,)))    # (G,N,M)·(G,M,D) → (G,N,D)
_BATCHED_PTDO = (((1,), (1,)), ((0,), (0,)))  # (G,N,M)ᵀ·(G,N,D) → (G,M,D)


def _head_probs(q_ref, k_ref, sl, scale):
    s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl], _BATCHED_QKT,
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _flat_fwd_kernel(nheads, scale, q_ref, k_ref, v_ref, o_ref):
    d = q_ref.shape[-1] // nheads
    outs = []
    for t in range(nheads):
        sl = slice(t * d, (t + 1) * d)
        p = _head_probs(q_ref, k_ref, sl, scale)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:, :, sl],
                                _BATCHED_PV, preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _flat_bwd_kernel(nheads, scale, q_ref, k_ref, v_ref, do_ref,
                     dq_ref, dk_ref, dv_ref):
    d = q_ref.shape[-1] // nheads
    dqs, dks, dvs = [], [], []
    for t in range(nheads):
        sl = slice(t * d, (t + 1) * d)
        p = _head_probs(q_ref, k_ref, sl, scale)
        do = do_ref[:, :, sl]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[:, :, sl], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(do.dtype)
        dq = jax.lax.dot_general(ds, k_ref[:, :, sl], _BATCHED_PV,
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q_ref[:, :, sl], _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)


def _flat_groups(b: int, n: int, e: int, itemsize: int):
    """Largest batch-group g dividing b whose fwd/bwd live set fits VMEM.

    Measured optimum on v5e (ViT-B shapes): fwd g=8-cap under the default
    ~14 MB scoped window (larger groups with a raised vmem limit run SLOWER —
    pipelining headroom shrinks); bwd g=4-cap under a raised 64 MB limit
    (g=4 beats both g=2@default and g=8@64MB)."""
    n_lanes = _round_up(n)

    def pick(blocks: int, tiles: int, budget_mb: int, cap: int) -> int:
        per_g = 2 * blocks * n * e * itemsize + tiles * n * n_lanes * 4
        g = int(max(1, min(cap, budget_mb * 1024 * 1024 // per_g)))
        while b % g:
            g -= 1
        return g

    return pick(4, 2, 14, 8), pick(7, 4, 28, 4)


def _flat_spec(g: int, n: int, e: int):
    return pl.BlockSpec((g, n, e), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         num_heads: int,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention on flat (B, N, E) operands, heads head-major in lanes.

    Exactly softmax(q_h·k_hᵀ/√d)·v_h per head h where x_h = x[..., h·d:(h+1)·d],
    d = E // num_heads. Returns (B, N, E) in the same flat layout.
    """
    out, _ = _flat_fwd_rule(q, k, v, num_heads, interpret)
    return out


def _flat_fwd_rule(q, k, v, num_heads, interpret):
    b, n, e = q.shape
    assert e % num_heads == 0
    d = e // num_heads
    scale = 1.0 / float(np.sqrt(d))
    g, _ = _flat_groups(b, n, e, q.dtype.itemsize)

    out = pl.pallas_call(
        functools.partial(_flat_fwd_kernel, num_heads, scale),
        grid=(b // g,),
        in_specs=[_flat_spec(g, n, e)] * 3,
        out_specs=_flat_spec(g, n, e),
        out_shape=jax.ShapeDtypeStruct((b, n, e), q.dtype),
        interpret=_interpret_flag(interpret),
    )(q, k, v)
    return out, (q, k, v)


def _flat_bwd_rule(num_heads, interpret, res, grad_out):
    q, k, v = res
    b, n, e = q.shape
    d = e // num_heads
    scale = 1.0 / float(np.sqrt(d))
    _, g = _flat_groups(b, n, e, q.dtype.itemsize)

    interp = _interpret_flag(interpret)
    kwargs = {}
    if not interp:
        # the bwd live set (7 blocks + 4 score tiles) exceeds the default
        # ~16 MB scoped-vmem window at the measured-optimal g=4
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flat_bwd_kernel, num_heads, scale),
        grid=(b // g,),
        in_specs=[_flat_spec(g, n, e)] * 4,
        out_specs=[_flat_spec(g, n, e)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, n, e), q.dtype)] * 3,
        interpret=interp,
        **kwargs,
    )(q, k, v, grad_out.astype(q.dtype))
    return dq, dk, dv


flash_attention_flat.defvjp(_flat_fwd_rule, _flat_bwd_rule)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention for (B, N, H, D) operands → (B, N, H, D).

    Compatibility wrapper over `flash_attention_flat` — the (H, D) minor dims
    are merged into flat lanes (a head-major reshape, the inverse of how the
    model's QKV projection splits heads). Callers on the hot path should pass
    flat (B, N, E) operands to `flash_attention_flat` directly and skip the
    reshapes entirely (models/layers.py does).
    """
    b, n, h, d = q.shape
    out = flash_attention_flat(q.reshape(b, n, h * d), k.reshape(b, n, h * d),
                               v.reshape(b, n, h * d), h, interpret)
    return out.reshape(b, n, h, d)


# ---------------------------------------------------------------------------
# Biased attention (Swin): scores = q·kᵀ + bias, bias differentiable
# ---------------------------------------------------------------------------
#
# q, k, v: (B, N, H, D) with B = B_outer·nW (batch × windows, window minor).
# bias: (W0, H, N, N) fp32 — per-(window, head) additive bias (rel-pos bias
# + shift mask); window index of batch element b is b % W0. The kernel
# reorganizes to (W = W0·H, B_outer, N, D) and runs a 2-D grid
# (W, B_outer/G): for a fixed bias block the batch tiles iterate fastest,
# so dBias accumulates in the revisited VMEM output block.

def _bias_group_size(r_pad: int, c_pad: int, d_pad: int, itemsize: int) -> int:
    """Batch-group size under a ~9 MB VMEM budget (s and p tiles dominate)."""
    per_g = r_pad * c_pad * 4 * 2 + 4 * (r_pad + c_pad) * d_pad * itemsize
    fixed = 2 * r_pad * c_pad * 4  # bias in + dbias out
    budget = 9 * 1024 * 1024
    return int(max(1, min(8, (budget - fixed) // per_g)))


def _window_layout(t: jnp.ndarray, w0: int, n_pad: int, d_pad: int,
                   gb: int) -> jnp.ndarray:
    """(B_outer·W0, N, H, D) → (W0·H, B_outer_pad, N_pad, D_pad)."""
    b, n, h, d = t.shape
    bo = b // w0
    x = t.reshape(bo, w0, n, h, d).transpose(1, 3, 0, 2, 4)
    x = x.reshape(w0 * h, bo, n, d)
    x = _pad_axis(_pad_axis(x, n_pad, 2), d_pad, 3)
    return _pad_axis(x, _round_up(bo, gb), 1)


def _window_unlayout(x: jnp.ndarray, b: int, n: int, h: int, d: int,
                     w0: int) -> jnp.ndarray:
    """(W0·H, B_outer_pad, N_pad, D_pad) → (B, N, H, D)."""
    bo = b // w0
    x = x[:, :bo, :n, :d].reshape(w0, h, bo, n, d)
    return x.transpose(2, 0, 3, 1, 4).reshape(b, n, h, d)


def _bias_probs(q_ref, k_ref, b_ref, n_real):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], _BATCHED_QKT,
                            preferred_element_type=jnp.float32)
    s = s + b_ref[0][None].astype(jnp.float32)
    g, r, c = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, r, c), 2)
    s = jnp.where(col < n_real, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _bias_fwd_kernel(n_real, q_ref, k_ref, v_ref, b_ref, o_ref):
    p = _bias_probs(q_ref, k_ref, b_ref, n_real)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0], _BATCHED_PV,
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bias_bwd_kernel(n_real, q_ref, k_ref, v_ref, b_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, db_ref):
    p = _bias_probs(q_ref, k_ref, b_ref, n_real)
    do = do_ref[0]
    p_lp = p.astype(do.dtype)
    dv = jax.lax.dot_general(p_lp, do, _BATCHED_PTDO,
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0], _BATCHED_QKT,
                             preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row)                       # fp32 (G, R, C)
    ds_lp = ds.astype(q_ref.dtype)
    dq = jax.lax.dot_general(ds_lp, k_ref[0], _BATCHED_PV,
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds_lp, q_ref[0], _BATCHED_PTDO,
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    dsum = jnp.sum(ds, axis=0)                # (R, C)
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        db_ref[0] = dsum

    @pl.when(bi > 0)
    def _():
        db_ref[0] = db_ref[0] + dsum


def _bias_specs(gb: int, r_pad: int, c_pad: int, d_pad: int):
    q_spec = pl.BlockSpec((1, gb, r_pad, d_pad), lambda w, i: (w, i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, gb, c_pad, d_pad), lambda w, i: (w, i, 0, 0),
                           memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, r_pad, c_pad), lambda w, i: (w, 0, 0),
                          memory_space=pltpu.VMEM)
    return q_spec, kv_spec, b_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_bias(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         bias: jnp.ndarray,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused biased attention: softmax(q·kᵀ + bias)·v, bias differentiable.

    q, k, v: (B, N, H, D); bias: (W0, H, N, N) with B % W0 == 0 (window
    index = b % W0; W0 == 1 broadcasts one bias over the batch). The caller
    folds any score scale into q."""
    out, _ = _bias_fwd_rule(q, k, v, bias, interpret)
    return out


def _bias_dims(q, bias):
    b, n, h, d = q.shape
    w0 = bias.shape[0]
    assert b % w0 == 0, f"batch {b} not divisible by bias windows {w0}"
    assert bias.shape[1] == h and bias.shape[2] == n and bias.shape[3] == n
    sublane = 16 if q.dtype == jnp.bfloat16 else 8
    r_pad = _round_up(n, sublane)
    c_pad = _round_up(n)
    d_pad = _round_up(d, 64)
    gb = _bias_group_size(r_pad, c_pad, d_pad, q.dtype.itemsize)
    bo_pad = _round_up(b // w0, gb)
    return b, n, h, d, w0, r_pad, c_pad, d_pad, gb, bo_pad


def _pad_bias(bias, w0, h, r_pad, c_pad):
    x = bias.astype(jnp.float32).reshape(w0 * h, bias.shape[2], bias.shape[3])
    return _pad_axis(_pad_axis(x, r_pad, 1), c_pad, 2)


def _bias_fwd_rule(q, k, v, bias, interpret):
    b, n, h, d, w0, r_pad, c_pad, d_pad, gb, bo_pad = _bias_dims(q, bias)
    qt = _window_layout(q, w0, r_pad, d_pad, gb)
    kt = _window_layout(k, w0, c_pad, d_pad, gb)
    vt = _window_layout(v, w0, c_pad, d_pad, gb)
    bt = _pad_bias(bias, w0, h, r_pad, c_pad)

    q_spec, kv_spec, b_spec = _bias_specs(gb, r_pad, c_pad, d_pad)
    out = pl.pallas_call(
        functools.partial(_bias_fwd_kernel, n),
        grid=(w0 * h, bo_pad // gb),
        in_specs=[q_spec, kv_spec, kv_spec, b_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((w0 * h, bo_pad, r_pad, d_pad),
                                       q.dtype),
        interpret=_interpret_flag(interpret),
    )(qt, kt, vt, bt)
    return _window_unlayout(out, b, n, h, d, w0), (q, k, v, bias)


def _bias_bwd_rule(interpret, res, grad_out):
    q, k, v, bias = res
    b, n, h, d, w0, r_pad, c_pad, d_pad, gb, bo_pad = _bias_dims(q, bias)
    qt = _window_layout(q, w0, r_pad, d_pad, gb)
    kt = _window_layout(k, w0, c_pad, d_pad, gb)
    vt = _window_layout(v, w0, c_pad, d_pad, gb)
    gt = _window_layout(grad_out, w0, r_pad, d_pad, gb)
    bt = _pad_bias(bias, w0, h, r_pad, c_pad)

    q_spec, kv_spec, b_spec = _bias_specs(gb, r_pad, c_pad, d_pad)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bias_bwd_kernel, n),
        grid=(w0 * h, bo_pad // gb),
        in_specs=[q_spec, kv_spec, kv_spec, b_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((w0 * h, bo_pad, r_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((w0 * h, bo_pad, c_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((w0 * h, bo_pad, c_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((w0 * h, r_pad, c_pad), jnp.float32),
        ],
        interpret=_interpret_flag(interpret),
    )(qt, kt, vt, bt, gt)

    dbias = db[:, :n, :n].reshape(w0, h, n, n).astype(bias.dtype)
    return (_window_unlayout(dq, b, n, h, d, w0),
            _window_unlayout(dk, b, n, h, d, w0),
            _window_unlayout(dv, b, n, h, d, w0),
            dbias)


flash_attention_bias.defvjp(_bias_fwd_rule, _bias_bwd_rule)
