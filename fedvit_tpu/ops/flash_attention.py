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

Windowed biased attention (`flash_attention_bias_flat`) covers Swin's
relative-position bias + shift mask on the same flat layout: scores =
q·kᵀ + bias_h + mask_w with bias differentiable — the backward ACCUMULATES
dBias across the window×batch grid dimensions inside the kernel (the bias
block is revisited across consecutive grid steps, so the partial sum lives
in VMEM). Any score scale (1/√d, or SwinV2's learned cosine scale) is
folded into q by the caller, so scale gradients flow through XLA outside
the kernel. A 2-D variant reading window tiles straight off the feature
map (no partition at all) was built and measured SLOWER end-to-end on
SwinV2-L (48.0 vs 50.1 img/s — 18 of 24 blocks have nW == 1 where the
partition is a free reshape), so the flat layout stays.

Reference parity: this op implements the attention inside the reference's
timm backbones (/root/reference/model.py:112-117).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


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


def _probs(q, k, scale):
    s = jax.lax.dot_general(q, k, _BATCHED_QKT,
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _head_probs(q_ref, k_ref, sl, scale):
    qsl, ksl = sl if isinstance(sl, tuple) else (sl, sl)
    return _probs(q_ref[:, :, qsl], k_ref[:, :, ksl], scale)


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


def _qkv_fwd_kernel(nheads, e, scale, qkv_ref, o_ref):
    d = e // nheads
    outs = []
    for t in range(nheads):
        p = _head_probs(qkv_ref, qkv_ref,
                        (slice(t * d, (t + 1) * d),
                         slice(e + t * d, e + (t + 1) * d)), scale)
        o = jax.lax.dot_general(p.astype(qkv_ref.dtype),
                                qkv_ref[:, :, 2 * e + t * d: 2 * e + (t + 1) * d],
                                _BATCHED_PV, preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _qkv_bwd_kernel(nheads, e, scale, qkv_ref, do_ref, dqkv_ref):
    d = e // nheads
    dqs, dks, dvs = [], [], []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        p = _head_probs(qkv_ref, qkv_ref, (qs, ks), scale)
        do = do_ref[:, :, qs]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, qkv_ref[:, :, vs], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(do.dtype)
        dq = jax.lax.dot_general(ds, qkv_ref[:, :, ks], _BATCHED_PV,
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qkv_ref[:, :, qs], _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv_ref[:] = jnp.concatenate(dqs + dks + dvs, axis=-1)


def _flat_groups(b: int, n: int, e: int, itemsize: int):
    """Largest batch-group g dividing b whose fwd/bwd live set fits VMEM.

    Measured optimum on v5e (ViT-B shapes): fwd g=8-cap under the default
    ~14 MB scoped window (larger groups with a raised vmem limit run SLOWER —
    pipelining headroom shrinks); bwd g=4-cap under a raised 64 MB limit
    (g=4 beats both g=2@default and g=8@64MB).

    FEDVIT_ATTN_G="f,b" overrides (0 keeps auto) — a tuning knob for
    on-hardware sweeps at new shapes (tools/attn_micro.py); the callers
    raise the scoped-VMEM window to fit a forced group.

    ViT-L@384 (N=577, E=1024, bs=16) sweep result (round 3, v5e): the auto
    g=(1,1) is the only viable choice — every bwd group ≥ 2 fails Mosaic
    compilation outright (live set ~45 MB + scratch exceeds what the
    compiler will schedule), and forced (1,1) re-measured within run noise
    of auto. No tuning headroom at large-N shapes; measured negative."""
    n_lanes = _round_up(n)

    def pick(blocks: int, tiles: int, budget_mb: int, cap: int) -> int:
        per_g = 2 * blocks * n * e * itemsize + tiles * n * n_lanes * 4
        g = int(max(1, min(cap, budget_mb * 1024 * 1024 // per_g)))
        while b % g:
            g -= 1
        return g

    fwd, bwd = pick(4, 2, 14, 8), pick(7, 4, 28, 4)
    ov = os.environ.get("FEDVIT_ATTN_G")
    if ov:
        f_ov, b_ov = (int(t) for t in ov.split(","))
        if f_ov and b % f_ov == 0:
            fwd = f_ov
        if b_ov and b % b_ov == 0:
            bwd = b_ov
    return fwd, bwd


def _flat_live_bytes(g: int, n: int, e: int, itemsize: int,
                     blocks: int, tiles: int) -> int:
    return g * (2 * blocks * n * e * itemsize + tiles * n * _round_up(n) * 4)


def _scoped_vmem_kwargs(live: int, interp: bool, floor_mb: int = 0):
    """compiler_params raising the scoped-VMEM window to fit `live` bytes
    (+25% Mosaic scratch margin); no-op when the default window suffices
    and no floor is requested (auto groups are sized to stay under it)."""
    if interp:
        return {}
    need = max(int(live * 1.25), floor_mb * 1024 * 1024)
    if need <= 14 * 1024 * 1024:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=min(need, 120 * 1024 * 1024))}


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

    interp = _interpret_flag(interpret)
    out = pl.pallas_call(
        functools.partial(_flat_fwd_kernel, num_heads, scale),
        grid=(b // g,),
        in_specs=[_flat_spec(g, n, e)] * 3,
        out_specs=_flat_spec(g, n, e),
        out_shape=jax.ShapeDtypeStruct((b, n, e), q.dtype),
        interpret=interp,
        **_scoped_vmem_kwargs(
            _flat_live_bytes(g, n, e, q.dtype.itemsize, 4, 2), interp),
    )(q, k, v)
    return out, (q, k, v)


def _flat_bwd_rule(num_heads, interpret, res, grad_out):
    q, k, v = res
    b, n, e = q.shape
    d = e // num_heads
    scale = 1.0 / float(np.sqrt(d))
    _, g = _flat_groups(b, n, e, q.dtype.itemsize)

    interp = _interpret_flag(interpret)
    # the bwd live set (7 blocks + 4 score tiles) exceeds the default
    # ~16 MB scoped-vmem window at the measured-optimal g=4
    kwargs = _scoped_vmem_kwargs(
        _flat_live_bytes(g, n, e, q.dtype.itemsize, 7, 4), interp,
        floor_mb=64)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_qkv(qkv: jnp.ndarray, num_heads: int,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention directly on the PACKED (B, N, 3E) QKV projection
    output ([q | k | v] along lanes, heads head-major within each third).

    Returns (B, N, E). Strictly cheaper than flash_attention_flat when the
    caller holds the packed tensor: the three (B, N, E) q/k/v slices never
    materialize (saves two full-tensor HBM passes per direction — the
    forward slices and the backward dq/dk/dv concatenation; the backward
    here writes the packed (B, N, 3E) cotangent in-kernel)."""
    out, _ = _qkv_fwd_rule(qkv, num_heads, interpret)
    return out


def _qkv_fwd_rule(qkv, num_heads, interpret):
    b, n, e3 = qkv.shape
    assert e3 % (3 * num_heads) == 0
    e = e3 // 3
    scale = 1.0 / float(np.sqrt(e // num_heads))
    g, _ = _flat_groups(b, n, e, qkv.dtype.itemsize)

    interp = _interpret_flag(interpret)
    out = pl.pallas_call(
        functools.partial(_qkv_fwd_kernel, num_heads, e, scale),
        grid=(b // g,),
        in_specs=[_flat_spec(g, n, e3)],
        out_specs=_flat_spec(g, n, e),
        out_shape=jax.ShapeDtypeStruct((b, n, e), qkv.dtype),
        interpret=interp,
        **_scoped_vmem_kwargs(
            _flat_live_bytes(g, n, e, qkv.dtype.itemsize, 4, 2), interp),
    )(qkv)
    return out, (qkv,)


def _qkv_bwd_rule(num_heads, interpret, res, grad_out):
    (qkv,) = res
    b, n, e3 = qkv.shape
    e = e3 // 3
    scale = 1.0 / float(np.sqrt(e // num_heads))
    _, g = _flat_groups(b, n, e, qkv.dtype.itemsize)

    interp = _interpret_flag(interpret)
    kwargs = _scoped_vmem_kwargs(
        _flat_live_bytes(g, n, e, qkv.dtype.itemsize, 7, 4), interp,
        floor_mb=64)
    dqkv = pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, num_heads, e, scale),
        grid=(b // g,),
        in_specs=[_flat_spec(g, n, e3), _flat_spec(g, n, e)],
        out_specs=_flat_spec(g, n, e3),
        out_shape=jax.ShapeDtypeStruct((b, n, e3), qkv.dtype),
        interpret=interp,
        **kwargs,
    )(qkv, grad_out.astype(qkv.dtype))
    return (dqkv,)


flash_attention_qkv.defvjp(_qkv_fwd_rule, _qkv_bwd_rule)


# ---------------------------------------------------------------------------
# Packed QKV attention with the PROJECTION BIAS applied in-kernel.
#
# Motivation (round-3 ViT-B trace): with the bias added by the projection's
# XLA epilogue, the projection VJP computes dbias = Σ_{B,N} dqkv as a
# standalone reduce that re-reads the full (B, N, 3E) cotangent from HBM —
# 2.9 ms/step at bs=192 (12 blocks × 174 MB at memory bandwidth). Here the
# backward kernel already holds each dqkv block in VMEM, so the bias
# cotangent accumulates across the batch grid for free (same revisited-
# output pattern as the windowed kernel's dBias) and the HBM re-read
# disappears. The caller's projection becomes bias-free (dense matmul
# only); the parameter tree is unchanged (models/layers.py::_QKVParams).
# ---------------------------------------------------------------------------


def _qkvb_fwd_kernel(nheads, e, scale, qkv_ref, b_ref, o_ref):
    # The bias ref is pre-tiled to (1, N, 3E) by the caller and added per
    # (g, N, d) head slice — never as a whole-block qkv + b temp: a
    # (g, N, 3E) biased copy is an extra block the live-set estimate
    # doesn't budget (measured: 884K over the 16M scoped window at ViT-B
    # bs=192 g=4, a compile failure), and a (1, 1, 3E) row can't be
    # lane-sliced + sublane-broadcast by Mosaic ("Invalid input layout").
    # The (1, N, d) slice broadcasts only along the untiled leading dim.
    d = e // nheads
    outs = []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        q = qkv_ref[:, :, qs] + b_ref[:, :, qs]
        k = qkv_ref[:, :, ks] + b_ref[:, :, ks]
        v = qkv_ref[:, :, vs] + b_ref[:, :, vs]
        p = _probs(q, k, scale)
        o = jax.lax.dot_general(p.astype(v.dtype), v, _BATCHED_PV,
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _qkvb_bwd_kernel(nheads, e, scale, qkv_ref, b_ref, do_ref,
                     dqkv_ref, db_ref):
    # same per-head-slice bias application as the forward (no whole-block
    # biased temp); b_ref is the (1, N, 3E) pre-tiled bias
    d = e // nheads
    dqs, dks, dvs = [], [], []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        q = qkv_ref[:, :, qs] + b_ref[:, :, qs]
        k = qkv_ref[:, :, ks] + b_ref[:, :, ks]
        v = qkv_ref[:, :, vs] + b_ref[:, :, vs]
        p = _probs(q, k, scale)
        do = do_ref[:, :, qs]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(do.dtype)
        dq = jax.lax.dot_general(ds, k, _BATCHED_PV,
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv_ref[:] = dqkv
    dsum = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))[None]   # (1, 3E)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        db_ref[:] = dsum

    @pl.when(jnp.logical_not(first))
    def _acc():
        db_ref[:] = db_ref[:] + dsum


def _bias_spec(e3: int):
    return pl.BlockSpec((1, e3), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _tiled_bias_spec(n: int, e3: int):
    # (1, N, 3E) bias tile, revisited (constant index_map → one DMA)
    return pl.BlockSpec((1, n, e3), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _tile_bias(bias: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """Tile the (3E,) projection bias to (1, N, 3E) so the kernel's
    per-head lane slices broadcast only along the leading dim (Mosaic
    can't sublane-broadcast a lane-sliced (1, 1, d) row)."""
    e3 = bias.shape[-1]
    return jnp.broadcast_to(bias.astype(dtype).reshape(1, 1, e3), (1, n, e3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def flash_attention_qkvb(qkv: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention on the BIAS-FREE packed (B, N, 3E) QKV projection
    output plus the projection bias (3E,), added to the block in-kernel.

    Mathematically identical to flash_attention_qkv(qkv + bias): the bias
    broadcast-add runs on the VMEM-resident block (one VPU pass), and the
    backward accumulates dbias = Σ_{B,N} dqkv across the batch grid in a
    resident f32 block — the projection's bias-VJP HBM re-read of dqkv
    never happens."""
    out, _ = _qkvb_fwd_rule(qkv, bias, num_heads, interpret)
    return out


def _qkvb_fwd_stats_kernel(nheads, e, scale, qkv_ref, b_ref, o_ref, st_ref):
    """Forward that also emits per-row softmax stats (row max at lanes
    [0:H), 1/Σ at lanes [64:64+H)) so the backward skips its reductions —
    the same trick as the windowed `_wflat_fwd_stats_kernel`."""
    d = e // nheads
    outs, mxs, invs = [], [], []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        q = qkv_ref[:, :, qs] + b_ref[:, :, qs]
        k = qkv_ref[:, :, ks] + b_ref[:, :, ks]
        v = qkv_ref[:, :, vs] + b_ref[:, :, vs]
        s = jax.lax.dot_general(q, k, _BATCHED_QKT,
                                preferred_element_type=jnp.float32) * scale
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general((p * inv).astype(v.dtype), v, _BATCHED_PV,
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
        mxs.append(mx[..., 0])
        invs.append(inv[..., 0])
    o_ref[:] = jnp.concatenate(outs, axis=-1)
    g, nn = mxs[0].shape
    pad = jnp.zeros((g, nn, _STATS_HALF - nheads), jnp.float32)
    st_ref[:] = jnp.concatenate(
        [jnp.stack(mxs, -1), pad, jnp.stack(invs, -1), pad], axis=-1)


def _qkvb_bwd_stats_kernel(nheads, e, scale, qkv_ref, b_ref, st_ref, do_ref,
                           dqkv_ref, db_ref):
    d = e // nheads
    dqs, dks, dvs = [], [], []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        q = qkv_ref[:, :, qs] + b_ref[:, :, qs]
        k = qkv_ref[:, :, ks] + b_ref[:, :, ks]
        v = qkv_ref[:, :, vs] + b_ref[:, :, vs]
        s = jax.lax.dot_general(q, k, _BATCHED_QKT,
                                preferred_element_type=jnp.float32) * scale
        mx = st_ref[:, :, t:t + 1]
        inv = st_ref[:, :, _STATS_HALF + t:_STATS_HALF + t + 1]
        p = jnp.exp(s - mx) * inv               # saved-stats recompute
        do = do_ref[:, :, qs]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(do.dtype)
        dq = jax.lax.dot_general(ds, k, _BATCHED_PV,
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv_ref[:] = dqkv
    dsum = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))[None]   # (1, 3E)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        db_ref[:] = dsum

    @pl.when(jnp.logical_not(first))
    def _acc():
        db_ref[:] = db_ref[:] + dsum


def _qkvb_bwd_delta_kernel(nheads, e, scale, qkv_ref, b_ref, st_ref, o_ref,
                           do_ref, dqkv_ref, db_ref):
    """Stats backward + the flash-attention delta identity (row_i = do_i·o_i
    — see _wflat_bwd_delta_kernel): the (N, N) dp·p product and its N-wide
    cross-lane reduce become a d-wide reduce over the forward output the
    projection VJP keeps alive anyway. FEDVIT_QKVB_DELTA gates it (requires
    FEDVIT_QKVB_STATS=1)."""
    d = e // nheads
    dqs, dks, dvs = [], [], []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        q = qkv_ref[:, :, qs] + b_ref[:, :, qs]
        k = qkv_ref[:, :, ks] + b_ref[:, :, ks]
        v = qkv_ref[:, :, vs] + b_ref[:, :, vs]
        do = do_ref[:, :, qs]
        delta = jnp.sum(do.astype(jnp.float32)
                        * o_ref[:, :, qs].astype(jnp.float32),
                        axis=-1, keepdims=True)          # (g, N, 1)
        s = jax.lax.dot_general(q, k, _BATCHED_QKT,
                                preferred_element_type=jnp.float32) * scale
        mx = st_ref[:, :, t:t + 1]
        inv = st_ref[:, :, _STATS_HALF + t:_STATS_HALF + t + 1]
        p = jnp.exp(s - mx) * inv               # saved-stats recompute
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(do.dtype)
        dq = jax.lax.dot_general(ds, k, _BATCHED_PV,
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
    dqkv_ref[:] = dqkv
    dsum = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))[None]   # (1, 3E)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        db_ref[:] = dsum

    @pl.when(jnp.logical_not(first))
    def _acc():
        db_ref[:] = db_ref[:] + dsum


_QKVB_AUTO_N = 384


def _qkvb_stats_enabled(num_heads: int, n: int) -> bool:
    """Geometry-aware default: stats backward ON at large N.

    End-to-end on v5e (round 5): ViT-L@384 (N=577) with stats+delta runs
    **114.6 img/s bs24 / 66.8% MFU** vs 108.4 / 63.1% plain — the backward's
    softmax recompute (max/sum reductions over (577, 640) f32 tiles ×16
    heads) is the dominant VPU chain at this N, and the saved-stats + delta
    identity delete it. ViT-B@224 (N=197) measured NEUTRAL for stats in the
    round-4 e2e A/B, so small-N keeps the plain recompute backward (its
    (197, 256) tiles cost little and the stats write is pure overhead).
    FEDVIT_QKVB_STATS=1/0 forces either way."""
    env = os.environ.get("FEDVIT_QKVB_STATS")
    on = (n >= _QKVB_AUTO_N) if env is None else (env == "1")
    return on and num_heads <= _STATS_HALF


def _qkvb_delta_enabled(n: int) -> bool:
    # delta measured REDUNDANT on top of stats at ViT-L@384 (stats-only
    # 114.9 img/s bs24 vs stats+delta 114.6, bs16 111.0 vs 109.5 — the
    # o_ref block read cancels the row-reduce saving, same finding as the
    # windowed kernel). Default off; FEDVIT_QKVB_DELTA=1 forces it.
    del n
    return os.environ.get("FEDVIT_QKVB_DELTA", "0") == "1"


def _qkvb_fwd_rule(qkv, bias, num_heads, interpret):
    b, n, e3 = qkv.shape
    e = e3 // 3
    scale = 1.0 / float(np.sqrt(e // num_heads))
    g, _ = _flat_groups(b, n, e, qkv.dtype.itemsize)

    interp = _interpret_flag(interpret)
    bias2 = _tile_bias(bias, n, qkv.dtype)
    # measured on v5e at ViT-B bs=192 g=4: real scoped usage is 16.16M
    # (bias tile + per-head biased q/k/v temps exceed the 25% margin),
    # so the window is floored at 20 MB
    kwargs = _scoped_vmem_kwargs(
        _flat_live_bytes(g, n, e, qkv.dtype.itemsize, 4, 2)
        + n * 3 * e * qkv.dtype.itemsize, interp, floor_mb=20)
    if not _qkvb_stats_enabled(num_heads, n):
        out = pl.pallas_call(
            functools.partial(_qkvb_fwd_kernel, num_heads, e, scale),
            grid=(b // g,),
            in_specs=[_flat_spec(g, n, e3), _tiled_bias_spec(n, e3)],
            out_specs=_flat_spec(g, n, e),
            out_shape=jax.ShapeDtypeStruct((b, n, e), qkv.dtype),
            interpret=interp,
            **kwargs,
        )(qkv, bias2)
        return out, (qkv, bias, None, None)
    lanes = 2 * _STATS_HALF
    st_spec = pl.BlockSpec((g, n, lanes), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    # the stats output block + its f32 staging push real usage past the
    # 20 MB floor at large N (measured: N=577/E=1024 needs 21.26M — Mosaic
    # rejects the 20 MB window outright), so this branch gets its own
    # accounting with the stats block included and a 24 MB floor
    st_kwargs = _scoped_vmem_kwargs(
        _flat_live_bytes(g, n, e, qkv.dtype.itemsize, 4, 2)
        + n * 3 * e * qkv.dtype.itemsize
        + 2 * g * n * lanes * 4, interp, floor_mb=24)
    out, stats = pl.pallas_call(
        functools.partial(_qkvb_fwd_stats_kernel, num_heads, e, scale),
        grid=(b // g,),
        in_specs=[_flat_spec(g, n, e3), _tiled_bias_spec(n, e3)],
        out_specs=[_flat_spec(g, n, e), st_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, e), qkv.dtype),
                   jax.ShapeDtypeStruct((b, n, lanes), jnp.float32)],
        interpret=interp,
        **st_kwargs,
    )(qkv, bias2)
    return out, (qkv, bias, stats, out if _qkvb_delta_enabled(n) else None)


def _qkvb_bwd_rule(num_heads, interpret, res, grad_out):
    qkv, bias, stats, out = res
    b, n, e3 = qkv.shape
    bias2 = _tile_bias(bias, n, qkv.dtype)
    e = e3 // 3
    scale = 1.0 / float(np.sqrt(e // num_heads))
    _, g = _flat_groups(b, n, e, qkv.dtype.itemsize)

    interp = _interpret_flag(interpret)
    live = (_flat_live_bytes(g, n, e, qkv.dtype.itemsize, 7, 4)
            + n * 3 * e * qkv.dtype.itemsize)
    if out is not None:
        # the delta kernel additionally holds the forward output block
        # o_ref (g, n, e) resident for the whole program
        live += g * n * e * qkv.dtype.itemsize
    kwargs = _scoped_vmem_kwargs(live, interp, floor_mb=64)
    if stats is None:
        dqkv, db = pl.pallas_call(
            functools.partial(_qkvb_bwd_kernel, num_heads, e, scale),
            grid=(b // g,),
            in_specs=[_flat_spec(g, n, e3), _tiled_bias_spec(n, e3),
                      _flat_spec(g, n, e)],
            out_specs=[_flat_spec(g, n, e3), _bias_spec(e3)],
            out_shape=[jax.ShapeDtypeStruct((b, n, e3), qkv.dtype),
                       jax.ShapeDtypeStruct((1, e3), jnp.float32)],
            interpret=interp,
            **kwargs,
        )(qkv, bias2, grad_out.astype(qkv.dtype))
    elif out is not None:                       # stats + delta backward
        lanes = 2 * _STATS_HALF
        st_spec = pl.BlockSpec((g, n, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        dqkv, db = pl.pallas_call(
            functools.partial(_qkvb_bwd_delta_kernel, num_heads, e, scale),
            grid=(b // g,),
            in_specs=[_flat_spec(g, n, e3), _tiled_bias_spec(n, e3),
                      st_spec, _flat_spec(g, n, e), _flat_spec(g, n, e)],
            out_specs=[_flat_spec(g, n, e3), _bias_spec(e3)],
            out_shape=[jax.ShapeDtypeStruct((b, n, e3), qkv.dtype),
                       jax.ShapeDtypeStruct((1, e3), jnp.float32)],
            interpret=interp,
            **kwargs,
        )(qkv, bias2, stats, out, grad_out.astype(qkv.dtype))
    else:
        lanes = 2 * _STATS_HALF
        st_spec = pl.BlockSpec((g, n, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        dqkv, db = pl.pallas_call(
            functools.partial(_qkvb_bwd_stats_kernel, num_heads, e, scale),
            grid=(b // g,),
            in_specs=[_flat_spec(g, n, e3), _tiled_bias_spec(n, e3),
                      st_spec, _flat_spec(g, n, e)],
            out_specs=[_flat_spec(g, n, e3), _bias_spec(e3)],
            out_shape=[jax.ShapeDtypeStruct((b, n, e3), qkv.dtype),
                       jax.ShapeDtypeStruct((1, e3), jnp.float32)],
            interpret=interp,
            **kwargs,
        )(qkv, bias2, stats, grad_out.astype(qkv.dtype))
    return dqkv, db.reshape(bias.shape).astype(bias.dtype)


flash_attention_qkvb.defvjp(_qkvb_fwd_rule, _qkvb_bwd_rule)


# ---------------------------------------------------------------------------
# Mega-kernel: QKV projection + attention in ONE Pallas program.
#
# The packed (B, N, 3E) projection output never exists in HBM in either
# pass: forward computes qkv = x·W + b on the resident batch block and
# consumes it for attention in VMEM; backward recomputes it, runs the
# attention VJP to a VMEM dqkv, and immediately applies the projection VJP
# in-kernel — dx = dqkv·Wᵀ streams out per block while dW = xᵀ·dqkv and
# db = Σ dqkv accumulate across the batch grid in resident f32 blocks
# (same revisited-output pattern as the windowed kernel's dBias).
# Eliminated HBM traffic per step vs flash_attention_qkv: qkv write+read
# forward, qkv recompute read + dqkv write+read backward — ~5 full
# (B, N, 3E) passes (~870 MB at ViT-B bs=192).
# ---------------------------------------------------------------------------


def _xqkv_fwd_kernel(nheads, e, scale, x_ref, w_ref, b_ref, o_ref):
    d = e // nheads
    qkv = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:][None]).astype(x_ref.dtype)  # (1, e3) stays 2-D (Mosaic rank-1 hazard)
    outs = []
    for t in range(nheads):
        p = _head_probs(qkv, qkv,
                        (slice(t * d, (t + 1) * d),
                         slice(e + t * d, e + (t + 1) * d)), scale)
        o = jax.lax.dot_general(p.astype(qkv.dtype),
                                qkv[:, :, 2 * e + t * d: 2 * e + (t + 1) * d],
                                _BATCHED_PV, preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _xqkv_bwd_kernel(nheads, e, scale, x_ref, w_ref, b_ref, do_ref,
                     dx_ref, dw_ref, db_ref):
    d = e // nheads
    g, n, dim = x_ref.shape
    qkv = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:][None]).astype(x_ref.dtype)  # (1, e3) stays 2-D (Mosaic rank-1 hazard)
    dqs, dks, dvs = [], [], []
    for t in range(nheads):
        qs = slice(t * d, (t + 1) * d)
        ks = slice(e + t * d, e + (t + 1) * d)
        vs = slice(2 * e + t * d, 2 * e + (t + 1) * d)
        p = _head_probs(qkv, qkv, (qs, ks), scale)
        do = do_ref[:, :, qs]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, qkv[:, :, vs], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(do.dtype)
        dq = jax.lax.dot_general(ds, qkv[:, :, ks], _BATCHED_PV,
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qkv[:, :, qs], _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq.astype(x_ref.dtype))
        dks.append(dk.astype(x_ref.dtype))
        dvs.append(dv.astype(x_ref.dtype))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)      # (g, N, 3E) bf16
    dx_ref[:] = jax.lax.dot_general(
        dqkv, w_ref[:], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    xf = x_ref[:].reshape(g * n, dim)
    df = dqkv.reshape(g * n, 3 * e)
    dw = jax.lax.dot_general(xf, df, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    db = jnp.sum(df.astype(jnp.float32), axis=0, keepdims=True)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] = dw_ref[:] + dw
        db_ref[:] = db_ref[:] + db


def _xqkv_groups(b: int, n: int, dim: int, e: int, itemsize: int):
    """Batch-groups: forward caps like the packed kernel; backward must also
    hold the resident W (dim, 3E) bf16 + dW (dim, 3E) f32 + the in-flight
    f32 qkv/dqkv values, so it gets a tighter budget."""
    n_lanes = _round_up(n)

    def pick(bytes_per_g: int, fixed: int, budget_mb: int, cap: int) -> int:
        avail = budget_mb * 1024 * 1024 - fixed
        g = int(max(1, min(cap, avail // bytes_per_g)))
        while b % g:
            g -= 1
        return g

    w_bytes = dim * 3 * e * itemsize
    fwd_per_g = n * (dim + 4 * e) * itemsize + 4 * n * 3 * e + \
        2 * n * n_lanes * 4
    bwd_per_g = n * (2 * dim + 4 * e) * itemsize + 8 * n * 3 * e + \
        4 * n * n_lanes * 4
    return (pick(fwd_per_g, 2 * w_bytes, 28, 8),
            pick(bwd_per_g, 2 * w_bytes + 2 * dim * 3 * e * 4, 48, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_xqkv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                         num_heads: int,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused QKV-projection + attention: attention(x·W + b) → (B, N, E).

    x: (B, N, D); w: (D, 3E) packed [Wq | Wk | Wv] head-major within each
    third (exactly nn.Dense(3E)'s kernel); b: (3E,). The projection runs on
    the MXU inside the kernel (f32 accumulation + bias, then cast to the
    compute dtype — same numerics as the XLA Dense it replaces)."""
    out, _ = _xqkv_fwd_rule(x, w, b, num_heads, interpret)
    return out


def _xqkv_fwd_rule(x, w, b, num_heads, interpret):
    bsz, n, dim = x.shape
    e3 = w.shape[1]
    assert w.shape[0] == dim and b.shape == (e3,)
    e = e3 // 3
    assert e % num_heads == 0
    scale = 1.0 / float(np.sqrt(e // num_heads))
    g, _ = _xqkv_groups(bsz, n, dim, e, x.dtype.itemsize)
    interp = _interpret_flag(interpret)
    kwargs = {} if interp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)}
    out = pl.pallas_call(
        functools.partial(_xqkv_fwd_kernel, num_heads, e, scale),
        grid=(bsz // g,),
        in_specs=[_flat_spec(g, n, dim),
                  pl.BlockSpec((dim, e3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, e3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=_flat_spec(g, n, e),
        out_shape=jax.ShapeDtypeStruct((bsz, n, e), x.dtype),
        interpret=interp,
        **kwargs,
    )(x, w, b.reshape(1, e3).astype(jnp.float32))
    return out, (x, w, b)


def _xqkv_bwd_rule(num_heads, interpret, res, grad_out):
    x, w, b = res
    bsz, n, dim = x.shape
    e3 = w.shape[1]
    e = e3 // 3
    scale = 1.0 / float(np.sqrt(e // num_heads))
    _, g = _xqkv_groups(bsz, n, dim, e, x.dtype.itemsize)
    interp = _interpret_flag(interpret)
    kwargs = {} if interp else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}
    dx, dw, db = pl.pallas_call(
        functools.partial(_xqkv_bwd_kernel, num_heads, e, scale),
        grid=(bsz // g,),
        in_specs=[_flat_spec(g, n, dim),
                  pl.BlockSpec((dim, e3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, e3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  _flat_spec(g, n, e)],
        out_specs=[_flat_spec(g, n, dim),
                   pl.BlockSpec((dim, e3), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, e3), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((bsz, n, dim), x.dtype),
                   jax.ShapeDtypeStruct((dim, e3), jnp.float32),
                   jax.ShapeDtypeStruct((1, e3), jnp.float32)],
        interpret=interp,
        **kwargs,
    )(x, w, b.reshape(1, e3).astype(jnp.float32),
      grad_out.astype(x.dtype))
    return (dx, dw.astype(w.dtype), db[0].astype(b.dtype))


flash_attention_xqkv.defvjp(_xqkv_fwd_rule, _xqkv_bwd_rule)


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
# Flat windowed biased attention (Swin hot path)
# ---------------------------------------------------------------------------
#
# q, k, v: (W0·B, N, E) WINDOW-MAJOR flat layout — rows [w·B, (w+1)·B) all
# belong to window w, heads packed head-major along lanes (same contract as
# flash_attention_flat). bias: (H, N, N) fp32, differentiable (Swin's CPB
# rel-pos bias). mask: (W0, N, N) fp32, non-differentiable (the static
# shifted-window cross-region mask; pass a zeros (1, N, N) when unmasked).
#
# Keeping bias and mask SEPARATE kernel inputs (added to the scores
# in-kernel) avoids materializing the (W0, H, N, N) combined bias in HBM —
# 127 MB per block at SwinV2-L stage 1 — which the previous window-minor
# kernel forced. The grid is (H/hb, W0, B/g) with the head-block dimension
# OUTERMOST so the dBias output block sees only consecutive grid steps and
# can accumulate across both window and batch dimensions in VMEM.

def _wflat_head_block(num_heads: int, d: int) -> int:
    """Heads per grid cell: smallest divisor of H whose lane width hb·d is a
    multiple of 128 (legal non-full block lane dim); falls back to all heads
    (block = full E, always legal). FEDVIT_WATTN_HB overrides (experiment
    knob, tools/wattn_micro.py) when it divides H legally."""
    env = os.environ.get("FEDVIT_WATTN_HB")
    if env:
        hb = int(env)
        if num_heads % hb == 0 and (hb == num_heads or (hb * d) % LANE == 0):
            return hb
    for hb in range(1, num_heads):
        if num_heads % hb == 0 and (hb * d) % LANE == 0:
            return hb
    return num_heads


def _wflat_groups(b: int, n: int, hb: int, d: int, h: int, itemsize: int):
    """Batch-group sizes for fwd/bwd under the scoped-VMEM window, counting
    the resident bias/mask blocks."""
    n_lanes = _round_up(n)
    fixed = (hb + 1) * n * n_lanes * 4          # bias block + mask block

    def pick(blocks: int, tiles: int, budget_mb: int, cap: int) -> int:
        per_g = 2 * blocks * n * hb * d * itemsize + tiles * n * n_lanes * 4
        avail = budget_mb * 1024 * 1024 - (2 if blocks > 4 else 1) * fixed
        g = int(max(1, min(cap, avail // per_g)))
        while b % g:
            g -= 1
        return g

    # budgets sized against the 64 MB scoped window (_wflat_compiler_kwargs):
    # at SwinV2-L@384 shapes (N=576) the previous 14/28 MB budgets forced
    # g=1 on every stage
    gf, gb = pick(4, 2, 28, 8), pick(7, 4, 48, 4)
    for env, cur in (("FEDVIT_WATTN_GF", gf), ("FEDVIT_WATTN_GB", gb)):
        val = os.environ.get(env)               # experiment knob
        if val and b % int(val) == 0:
            if env.endswith("GF"):
                gf = int(val)
            else:
                gb = int(val)
    return gf, gb


def _wflat_fwd_kernel(hb, d, q_ref, k_ref, v_ref, b_ref, m_ref, o_ref):
    # FEDVIT_WATTN_SOFTMAX=postdiv (experiment knob, tools/wattn_micro.py):
    # keep the row-max shift but fold the 1/Σ normalization into the (N, d)
    # output instead of the (N, N) probability tile — one fewer full-tile
    # VPU pass per head. MEASURED NEGATIVE at SwinV2-L@384 shapes (round 3,
    # v5e fwd): stage0 4.10→3.91 ms (−4.5%) but stage2 1.92→2.26 ms (+18%)
    # — the f32 (N, d) rescale breaks the p→PV cast fusion where nW=1 —
    # so "max" stays the default. A static-shift "capped" variant (no
    # max-reduce at all) is UNWORKABLE: the shift must cover the worst-case
    # score (scale ≤ 100 + bias 16) while typical rows sit at |s| ≤ 26, so
    # exp(s − 120) underflows ENTIRE ROWS to 0/0 at normal operating points.
    variant = os.environ.get("FEDVIT_WATTN_SOFTMAX", "max")
    m = m_ref[0][None].astype(jnp.float32)
    outs = []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl],
                                _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        s = s + b_ref[t][None] + m
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        if variant == "postdiv":
            inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:, :, sl],
                                    _BATCHED_PV,
                                    preferred_element_type=jnp.float32)
            o = o * inv
        else:
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
            o = jax.lax.dot_general(p, v_ref[:, :, sl], _BATCHED_PV,
                                    preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _wflat_bwd_kernel(hb, d, q_ref, k_ref, v_ref, b_ref, m_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, db_ref):
    m = m_ref[0][None].astype(jnp.float32)
    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)
    dqs, dks, dvs, dbs = [], [], [], []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl],
                                _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        s = s + b_ref[t][None] + m
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        do = do_ref[:, :, sl]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[:, :, sl], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row)                    # fp32 (g, N, N)
        ds_lp = ds.astype(do.dtype)
        dq = jax.lax.dot_general(ds_lp, k_ref[:, :, sl], _BATCHED_PV,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds_lp, q_ref[:, :, sl], _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        dbs.append(jnp.sum(ds, axis=0))
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)
    dsum = jnp.stack(dbs, axis=0)              # (hb, N, N)

    @pl.when(first)
    def _():
        db_ref[:] = dsum

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[:] = db_ref[:] + dsum


def _wflat_dims(q, bias, mask, num_heads):
    wb, n, e = q.shape
    h = bias.shape[0]
    assert h == num_heads and e % h == 0
    d = e // h
    w0 = mask.shape[0]
    assert wb % w0 == 0, f"rows {wb} not divisible by windows {w0}"
    assert bias.shape == (h, n, n) and mask.shape == (w0, n, n)
    b = wb // w0
    hb = _wflat_head_block(h, d)
    return wb, n, e, h, d, w0, b, hb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_bias_flat(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, bias: jnp.ndarray,
                               mask: jnp.ndarray, num_heads: int,
                               interpret: Optional[bool] = None
                               ) -> jnp.ndarray:
    out, _ = _wflat_fwd_rule(q, k, v, bias, mask, num_heads, interpret)
    return out


def flash_attention_bias_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              bias: jnp.ndarray, mask: jnp.ndarray,
                              num_heads: int,
                              interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused windowed attention: softmax(q_h·k_hᵀ + bias_h + mask_w)·v_h.

    q, k, v: (W0·B, N, E) window-major flat; bias (H, N, N) differentiable;
    mask (W0, N, N) static additive. Caller folds any score scale into q.

    `mask` is structurally non-differentiable (stop_gradient applied here):
    the kernel's backward does not compute a mask cotangent, so a learned /
    traced mask must not silently receive zeros."""
    return _flash_attention_bias_flat(q, k, v, bias,
                                      jax.lax.stop_gradient(mask),
                                      num_heads, interpret)


def _wflat_specs(g, n, e, hb, d, w0, b, h):
    bpg = b // g
    qkv = pl.BlockSpec((g, n, hb * d), lambda j, w, i: (w * bpg + i, 0, j),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((hb, n, n), lambda j, w, i: (j, 0, 0),
                        memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, n, n), lambda j, w, i: (w if w0 > 1 else 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, bias, mask


def _wflat_compiler_kwargs(interp: bool):
    """Raise the scoped-VMEM window: the resident bias (hb, N, N) + mask
    (1, N, N) f32 blocks alone approach the 16 MB default at Swin windows
    (N=576), and Mosaic scratch pushes past it. FEDVIT_WATTN_VMEM=<MB>
    overrides (experiment knob: larger head blocks need ~100 MB of the
    v5e's 128 MB VMEM)."""
    if interp:
        return {}
    mb = int(os.environ.get("FEDVIT_WATTN_VMEM", "64"))
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=mb * 1024 * 1024)}


def _wflat_fwd_rule(q, k, v, bias, mask, num_heads, interpret):
    wb, n, e, h, d, w0, b, hb = _wflat_dims(q, bias, mask, num_heads)
    g, _ = _wflat_groups(b, n, hb, d, h, q.dtype.itemsize)
    qkv_spec, b_spec, m_spec = _wflat_specs(g, n, e, hb, d, w0, b, h)
    interp = _interpret_flag(interpret)
    out = pl.pallas_call(
        functools.partial(_wflat_fwd_kernel, hb, d),
        grid=(h // hb, w0, b // g),
        in_specs=[qkv_spec] * 3 + [b_spec, m_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((wb, n, e), q.dtype),
        interpret=interp,
        **_wflat_compiler_kwargs(interp),
    )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out, (q, k, v, bias)


# --- softmax-stats VJP variant (FEDVIT_WATTN_STATS=1, tools/wattn_micro) ---
#
# The forward additionally emits per-row softmax statistics — row max and
# 1/Σexp — so the backward's recompute chain collapses from
# max-reduce → sub+exp → sum-reduce → divide (two 576-wide cross-lane
# reductions + a divide per (N, N) tile) to a single exp·mul. Stats ride in
# a lane-padded f32 tensor: one 128-lane slot per head-block j, lanes
# [0:hb) = max, [64:64+hb) = 1/Σ (hb ≤ 64 always: hb is a divisor of H and
# H ≤ 48 at SwinV2-L). Both kernels also fold bias+mask ONCE per (N, N)
# tile instead of broadcasting two adds over the (g, N, N) batch block.

_STATS_HALF = 64


def _wflat_fwd_stats_kernel(hb, d, q_ref, k_ref, v_ref, b_ref, m_ref,
                            o_ref, st_ref):
    # FEDVIT_WATTN_SOFTMAX fwd variants (stats path; stage2 fwd sits at
    # ~33% of its d=32 cap, far under bwd, so the softmax VPU chain — two
    # cross-lane reductions + a full-tile normalize per head — is the
    # suspect):
    #   max (default): mx reduce → exp → Σ reduce → p·(1/Σ) → PV
    #   postdiv:       normalize the (N, d) output instead of the (N, N) p
    #   dotsum:        postdiv + the Σ row-reduce rides the MXU as a
    #                  p·ones (N,N)x(N,1) matvec — no cross-lane Σ at all
    #
    # MEASURED (round 5, stage2 (1,16,576,768,24) one-process A/B, v5e,
    # drift sentinel fwd 1.3% / bwd 8%): both variants are NEGATIVES.
    #   base    fwd 1.922 ms (34.4% of d=32 cap)   postdiv fwd 1.915 ms
    #   dotsum  fwd 4.616 ms — the (N,N)x(N,1) matvec emits a 1-lane MXU
    #   output tile and serializes against the PV dot; full fwd+bwd 4.85
    #   vs base 4.51 ms.
    # Removing the Σ reduce and the (N,N) normalize moved NOTHING → the
    # fwd's VPU chain is bound by the exp itself (+ the bias/mask adds),
    # which every softmax formulation keeps. 'max' stays the default; the
    # variants remain for geometries with cheaper exp/larger d.
    variant = os.environ.get("FEDVIT_WATTN_SOFTMAX", "max")
    outs, mxs, invs = [], [], []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl],
                                _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        bm = b_ref[t] + m_ref[0].astype(jnp.float32)    # fold once (N, N)
        s = s + bm[None]
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        if variant == "dotsum":
            ones = jnp.ones((s.shape[-1], 1), jnp.float32)
            ssum = jax.lax.dot_general(p, ones, (((2,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            inv = 1.0 / ssum
            o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:, :, sl],
                                    _BATCHED_PV,
                                    preferred_element_type=jnp.float32)
            o = o * inv
        elif variant == "postdiv":
            inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:, :, sl],
                                    _BATCHED_PV,
                                    preferred_element_type=jnp.float32)
            o = o * inv
        else:
            inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general((p * inv).astype(v_ref.dtype),
                                    v_ref[:, :, sl], _BATCHED_PV,
                                    preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
        mxs.append(mx[..., 0])
        invs.append(inv[..., 0])
    o_ref[:] = jnp.concatenate(outs, axis=-1)
    g, nn = mxs[0].shape
    pad = jnp.zeros((g, nn, _STATS_HALF - hb), jnp.float32)
    st_ref[:] = jnp.concatenate(
        [jnp.stack(mxs, -1), pad, jnp.stack(invs, -1), pad], axis=-1)


def _wflat_bwd_stats_kernel(hb, d, q_ref, k_ref, v_ref, b_ref, m_ref,
                            st_ref, do_ref, dq_ref, dk_ref, dv_ref, db_ref):
    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)
    dqs, dks, dvs, dbs = [], [], [], []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl],
                                _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        bm = b_ref[t] + m_ref[0].astype(jnp.float32)
        s = s + bm[None]
        mx = st_ref[:, :, t:t + 1]
        inv = st_ref[:, :, _STATS_HALF + t:_STATS_HALF + t + 1]
        p = jnp.exp(s - mx) * inv               # saved-stats recompute

        do = do_ref[:, :, sl]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[:, :, sl], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row)
        ds_lp = ds.astype(do.dtype)
        dq = jax.lax.dot_general(ds_lp, k_ref[:, :, sl], _BATCHED_PV,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds_lp, q_ref[:, :, sl], _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        dbs.append(jnp.sum(ds, axis=0))
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)
    dsum = jnp.stack(dbs, axis=0)

    @pl.when(first)
    def _():
        db_ref[:] = dsum

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[:] = db_ref[:] + dsum


def _wflat_bwd_delta_kernel(hb, d, q_ref, k_ref, v_ref, b_ref, m_ref,
                            st_ref, o_ref, do_ref,
                            dq_ref, dk_ref, dv_ref, db_ref):
    """Stats backward + the flash-attention delta identity.

    row_i = Σ_j dp_ij·p_ij = do_i · o_i  (o = Σ_j p_ij v_j), so the per-row
    softmax-VJP correction collapses from an (N, N) elementwise product plus
    an N-wide cross-lane reduce (the widest VPU pass left in the stats
    backward) to a d=32-wide reduce over tensors the kernel already holds —
    `o` is the forward output, which the surrounding projection's VJP keeps
    alive anyway (XLA dedupes the residual). FEDVIT_WATTN_DELTA gates it."""
    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)
    dqs, dks, dvs, dbs = [], [], [], []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        do = do_ref[:, :, sl]
        delta = jnp.sum(do.astype(jnp.float32)
                        * o_ref[:, :, sl].astype(jnp.float32),
                        axis=-1, keepdims=True)          # (g, N, 1)
        s = jax.lax.dot_general(q_ref[:, :, sl], k_ref[:, :, sl],
                                _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        bm = b_ref[t] + m_ref[0].astype(jnp.float32)
        s = s + bm[None]
        mx = st_ref[:, :, t:t + 1]
        inv = st_ref[:, :, _STATS_HALF + t:_STATS_HALF + t + 1]
        p = jnp.exp(s - mx) * inv

        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[:, :, sl], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        ds_lp = ds.astype(do.dtype)
        dq = jax.lax.dot_general(ds_lp, k_ref[:, :, sl], _BATCHED_PV,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds_lp, q_ref[:, :, sl], _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        dbs.append(jnp.sum(ds, axis=0))
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)
    dsum = jnp.stack(dbs, axis=0)

    @pl.when(first)
    def _():
        db_ref[:] = dsum

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[:] = db_ref[:] + dsum


def _wflat_stats_spec(g, n, hb, b):
    bpg = b // g
    lanes = 2 * _STATS_HALF
    return pl.BlockSpec((g, n, lanes), lambda j, w, i: (w * bpg + i, 0, j),
                        memory_space=pltpu.VMEM), lanes


def _stats_enabled() -> bool:
    return os.environ.get("FEDVIT_WATTN_STATS", "1") == "1"


def _delta_enabled() -> bool:
    # Default OFF — end-to-end is the arbiter and it contradicts the micro
    # A/B (round 5, same session, v5e): interleaved micro at stage2 says
    # delta wins (full fwd+bwd 4.80 vs 5.05 ms means, 2/3 adjacent pairs;
    # earlier session −17.4% bwd), but `bench.py swinv2` back-to-back says
    # delta=1 95.5 img/s (167.5 ms/step) vs delta=0 96.2 (166.4) — with
    # delta=0 run SECOND in a session drifting SLOWER, so the e2e ordering
    # is real, not drift. Inside the full step the extra o_ref block DMA
    # competes with the surrounding fusions in a way the isolated micro
    # never sees. FEDVIT_WATTN_DELTA=1 re-enables for new geometries.
    return os.environ.get("FEDVIT_WATTN_DELTA", "0") == "1"


def _wflat_fwd_rule_vjp(q, k, v, bias, mask, num_heads, interpret):
    if not _stats_enabled():
        out, _ = _wflat_fwd_rule(q, k, v, bias, mask, num_heads, interpret)
        return out, (q, k, v, bias, mask, None, None)
    wb, n, e, h, d, w0, b, hb = _wflat_dims(q, bias, mask, num_heads)
    g, _ = _wflat_groups(b, n, hb, d, h, q.dtype.itemsize)
    qkv_spec, b_spec, m_spec = _wflat_specs(g, n, e, hb, d, w0, b, h)
    st_spec, st_lanes = _wflat_stats_spec(g, n, hb, b)
    interp = _interpret_flag(interpret)
    out, stats = pl.pallas_call(
        functools.partial(_wflat_fwd_stats_kernel, hb, d),
        grid=(h // hb, w0, b // g),
        in_specs=[qkv_spec] * 3 + [b_spec, m_spec],
        out_specs=[qkv_spec, st_spec],
        out_shape=[jax.ShapeDtypeStruct((wb, n, e), q.dtype),
                   jax.ShapeDtypeStruct((wb, n, (h // hb) * st_lanes),
                                        jnp.float32)],
        interpret=interp,
        **_wflat_compiler_kwargs(interp),
    )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out, (q, k, v, bias, mask, stats,
                 out if _delta_enabled() else None)


def _make_wflat_bwd():
    def rule(num_heads, interpret, res, grad_out):
        q, k, v, bias, mask, stats, out = res
        wb, n, e, h, d, w0, b, hb = _wflat_dims(q, bias, mask, num_heads)
        _, g = _wflat_groups(b, n, hb, d, h, q.dtype.itemsize)
        qkv_spec, b_spec, m_spec = _wflat_specs(g, n, e, hb, d, w0, b, h)
        interp = _interpret_flag(interpret)
        kwargs = _wflat_compiler_kwargs(interp)
        if stats is None:
            dq, dk, dv, db = pl.pallas_call(
                functools.partial(_wflat_bwd_kernel, hb, d),
                grid=(h // hb, w0, b // g),
                in_specs=[qkv_spec] * 3 + [b_spec, m_spec, qkv_spec],
                out_specs=[qkv_spec] * 3 + [b_spec],
                out_shape=[jax.ShapeDtypeStruct((wb, n, e), q.dtype)] * 3
                + [jax.ShapeDtypeStruct((h, n, n), jnp.float32)],
                interpret=interp,
                **kwargs,
            )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32),
              grad_out.astype(q.dtype))
        elif out is not None:                   # stats + delta backward
            st_spec, _ = _wflat_stats_spec(g, n, hb, b)
            dq, dk, dv, db = pl.pallas_call(
                functools.partial(_wflat_bwd_delta_kernel, hb, d),
                grid=(h // hb, w0, b // g),
                in_specs=[qkv_spec] * 3 + [b_spec, m_spec, st_spec,
                                           qkv_spec, qkv_spec],
                out_specs=[qkv_spec] * 3 + [b_spec],
                out_shape=[jax.ShapeDtypeStruct((wb, n, e), q.dtype)] * 3
                + [jax.ShapeDtypeStruct((h, n, n), jnp.float32)],
                interpret=interp,
                **kwargs,
            )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32),
              stats, out, grad_out.astype(q.dtype))
        else:
            st_spec, _ = _wflat_stats_spec(g, n, hb, b)
            dq, dk, dv, db = pl.pallas_call(
                functools.partial(_wflat_bwd_stats_kernel, hb, d),
                grid=(h // hb, w0, b // g),
                in_specs=[qkv_spec] * 3 + [b_spec, m_spec, st_spec,
                                           qkv_spec],
                out_specs=[qkv_spec] * 3 + [b_spec],
                out_shape=[jax.ShapeDtypeStruct((wb, n, e), q.dtype)] * 3
                + [jax.ShapeDtypeStruct((h, n, n), jnp.float32)],
                interpret=interp,
                **kwargs,
            )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32),
              stats, grad_out.astype(q.dtype))
        return dq, dk, dv, db.astype(bias.dtype), jnp.zeros_like(mask)
    return rule


_flash_attention_bias_flat.defvjp(_wflat_fwd_rule_vjp, _make_wflat_bwd())


# ---------------------------------------------------------------------------
# Fused COSINE windowed attention (SwinV2): the per-head L2 normalization of
# q and k moves INTO the kernel, as a row reduce + multiply on the resident
# (g, N, d) head slice; the learned per-head logit scale rides in SMEM and
# its gradient accumulates across the window×batch grid like dBias.
#
# MEASURED NEGATIVE RESULT (round 3, SwinV2-L@384 bs=16 on v5e): this fusion
# is a net LOSS. The XLA-side normalization it replaces (one-hot segment
# matmuls + two full passes over q and k) costs ≈12 ms/step — but moving it
# in-kernel inflated the attention custom-call time 189→319 ms per 3-step
# trace (+44 ms/step): the norm chain (bf16→f32 upcast, square-reduce,
# rsqrt, multiply, downcast — twice per head slice in fwd, plus the
# normalization chain rule in bwd) executes SERIALLY with the MXU dots
# inside one Mosaic program, and on d=32 stage-1 slices it runs on
# quarter-filled lanes. End-to-end: 226.5 vs 220.3 ms/step.
# `models/swin.py` therefore keeps the XLA-side formulation; this kernel
# stays available (and exactness-tested vs the XLA path, incl. the dscale
# cotangent) for geometries where the trade-off could flip (d ≥ 128).
#
#   out_h = softmax(scale_h · q̂_h k̂_hᵀ + bias_h + mask_w) · v_h,
#   x̂ = x / max(‖x‖₂, eps)   (eps = 1e-6, reference clamp semantics)
# ---------------------------------------------------------------------------

_COS_EPS = 1e-6


def _inv_l2(x32):
    """(g, n, d) f32 → (g, n, 1) 1/max(‖row‖, eps), plus the row norms."""
    nrm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    return 1.0 / jnp.clip(nrm, min=_COS_EPS), nrm


def _wcos_fwd_kernel(hb, d, q_ref, k_ref, v_ref, sc_ref, b_ref, m_ref,
                     o_ref):
    m = m_ref[0][None].astype(jnp.float32)
    # sc_ref holds the FULL (h, 1) scale table in SMEM (Mosaic's block rule
    # forbids an (hb, 1) block over (h, 1) when hb ∤ 8); index the resident
    # head block's row dynamically
    h0 = pl.program_id(0) * hb
    outs = []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        qt = q_ref[:, :, sl].astype(jnp.float32)
        kt = k_ref[:, :, sl].astype(jnp.float32)
        rq, _ = _inv_l2(qt)
        rk, _ = _inv_l2(kt)
        qn = (qt * (rq * sc_ref[h0 + t, 0])).astype(v_ref.dtype)
        kn = (kt * rk).astype(v_ref.dtype)
        s = jax.lax.dot_general(qn, kn, _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        s = s + b_ref[t][None] + m
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
        o = jax.lax.dot_general(p, v_ref[:, :, sl], _BATCHED_PV,
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _wcos_bwd_kernel(hb, d, q_ref, k_ref, v_ref, sc_ref, b_ref, m_ref,
                     do_ref, dq_ref, dk_ref, dv_ref, db_ref, dsc_ref):
    m = m_ref[0][None].astype(jnp.float32)
    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)
    h0 = pl.program_id(0) * hb
    dqs, dks, dvs, dbs, dscs = [], [], [], [], []
    for t in range(hb):
        sl = slice(t * d, (t + 1) * d)
        sc = sc_ref[h0 + t, 0]
        qt = q_ref[:, :, sl].astype(jnp.float32)
        kt = k_ref[:, :, sl].astype(jnp.float32)
        rq, nq = _inv_l2(qt)
        rk, nk = _inv_l2(kt)
        qh = qt * rq                                   # q̂ (unscaled)
        kh = kt * rk
        qn = (qh * sc).astype(v_ref.dtype)
        kn = kh.astype(v_ref.dtype)
        s = jax.lax.dot_general(qn, kn, _BATCHED_QKT,
                                preferred_element_type=jnp.float32)
        s = s + b_ref[t][None] + m
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        do = do_ref[:, :, sl]
        dv = jax.lax.dot_general(p.astype(do.dtype), do, _BATCHED_PTDO,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[:, :, sl], _BATCHED_QKT,
                                 preferred_element_type=jnp.float32)
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row)                            # fp32 (g, N, N)
        ds_lp = ds.astype(do.dtype)
        # cotangents of the NORMALIZED operands
        dqn = jax.lax.dot_general(ds_lp, kn, _BATCHED_PV,
                                  preferred_element_type=jnp.float32)
        dkn = jax.lax.dot_general(ds_lp, qn, _BATCHED_PTDO,
                                  preferred_element_type=jnp.float32)
        # chain through x̂ = x/max(‖x‖, eps): for ‖x‖ > eps
        #   dx = r·(dx̂ − x̂·(x̂ᵀdx̂));  at the clamp, r is constant: dx = r·dx̂
        rowq = jnp.sum(qh * dqn, axis=-1, keepdims=True)
        rowk = jnp.sum(kh * dkn, axis=-1, keepdims=True)
        dq = sc * rq * (dqn - jnp.where(nq > _COS_EPS, qh * rowq, 0.0))
        dk = rk * (dkn - jnp.where(nk > _COS_EPS, kh * rowk, 0.0))
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        dbs.append(jnp.sum(ds, axis=0))
        # scale_t multiplies q̂ in the score dot: dscale = Σ q̂∘dq̂n
        dscs.append(jnp.sum(rowq, axis=(0, 1), keepdims=True))  # (1,1,1)
    dq_ref[:] = jnp.concatenate(dqs, axis=-1)
    dk_ref[:] = jnp.concatenate(dks, axis=-1)
    dv_ref[:] = jnp.concatenate(dvs, axis=-1)
    dsum = jnp.stack(dbs, axis=0)                      # (hb, N, N)
    dsc = jnp.broadcast_to(jnp.concatenate(dscs, axis=0), (hb, 1, LANE))

    @pl.when(first)
    def _():
        db_ref[:] = dsum
        dsc_ref[:] = dsc

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[:] = db_ref[:] + dsum
        dsc_ref[:] = dsc_ref[:] + dsc


def _wcos_specs(g, n, e, hb, d, w0, b, h):
    qkv, bias, mask = _wflat_specs(g, n, e, hb, d, w0, b, h)
    # full (h, 1) table every grid step — an (hb, 1) block would violate
    # Mosaic's divisible-by-8-or-full rule for h=12, hb=4 (SwinV2-L stage 2)
    scale = pl.BlockSpec((h, 1), lambda j, w, i: (0, 0),
                         memory_space=pltpu.SMEM)
    return qkv, bias, mask, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_attention_cosine_flat(q, k, v, scale, bias, mask, num_heads,
                                 interpret=None):
    out, _ = _wcos_fwd_rule(q, k, v, scale, bias, mask, num_heads, interpret)
    return out


def flash_attention_cosine_flat(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, scale: jnp.ndarray,
                                bias: jnp.ndarray, mask: jnp.ndarray,
                                num_heads: int,
                                interpret: Optional[bool] = None
                                ) -> jnp.ndarray:
    """Fused SwinV2 attention: softmax(s_h·q̂_h k̂_hᵀ + bias_h + mask_w)·v_h.

    q, k, v: (W0·B, N, E) window-major flat RAW (un-normalized) operands;
    scale: (H,) f32 per-head logit scale, differentiable; bias (H, N, N)
    differentiable; mask (W0, N, N) static additive (stop_gradient)."""
    return _flash_attention_cosine_flat(q, k, v, scale, bias,
                                        jax.lax.stop_gradient(mask),
                                        num_heads, interpret)


def _wcos_fwd_rule(q, k, v, scale, bias, mask, num_heads, interpret):
    wb, n, e, h, d, w0, b, hb = _wflat_dims(q, bias, mask, num_heads)
    g, _ = _wflat_groups(b, n, hb, d, h, q.dtype.itemsize)
    qkv_spec, b_spec, m_spec, s_spec = _wcos_specs(g, n, e, hb, d, w0, b, h)
    interp = _interpret_flag(interpret)
    out = pl.pallas_call(
        functools.partial(_wcos_fwd_kernel, hb, d),
        grid=(h // hb, w0, b // g),
        in_specs=[qkv_spec] * 3 + [s_spec, b_spec, m_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((wb, n, e), q.dtype),
        interpret=interp,
        **_wflat_compiler_kwargs(interp),
    )(q, k, v, scale.reshape(h, 1).astype(jnp.float32),
      bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out, (q, k, v, scale, bias, mask)


def _wcos_bwd_rule(num_heads, interpret, res, grad_out):
    q, k, v, scale, bias, mask = res
    wb, n, e, h, d, w0, b, hb = _wflat_dims(q, bias, mask, num_heads)
    _, g = _wflat_groups(b, n, hb, d, h, q.dtype.itemsize)
    qkv_spec, b_spec, m_spec, s_spec = _wcos_specs(g, n, e, hb, d, w0, b, h)
    interp = _interpret_flag(interpret)
    dsc_spec = pl.BlockSpec((hb, 1, LANE), lambda j, w, i: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv, db, dsc = pl.pallas_call(
        functools.partial(_wcos_bwd_kernel, hb, d),
        grid=(h // hb, w0, b // g),
        in_specs=[qkv_spec] * 3 + [s_spec, b_spec, m_spec, qkv_spec],
        out_specs=[qkv_spec] * 3 + [b_spec, dsc_spec],
        out_shape=[jax.ShapeDtypeStruct((wb, n, e), q.dtype)] * 3
        + [jax.ShapeDtypeStruct((h, n, n), jnp.float32),
           jax.ShapeDtypeStruct((h, 1, LANE), jnp.float32)],
        interpret=interp,
        **_wflat_compiler_kwargs(interp),
    )(q, k, v, scale.reshape(h, 1).astype(jnp.float32),
      bias.astype(jnp.float32), mask.astype(jnp.float32),
      grad_out.astype(q.dtype))
    return (dq, dk, dv, dsc[:, 0, 0].astype(scale.dtype).reshape(scale.shape),
            db.astype(bias.dtype), jnp.zeros_like(mask))


_flash_attention_cosine_flat.defvjp(_wcos_fwd_rule, _wcos_bwd_rule)
