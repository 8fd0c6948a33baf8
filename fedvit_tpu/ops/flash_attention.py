"""Pallas fused attention — forward + custom-VJP backward.

The driver north star requires the ViT attention to be a Pallas kernel for
both passes. ViT shapes here are short-sequence (N ≤ ~640 tokens: 197 for
ViT-B/16@224, 577 for ViT-L/16@384), so the optimal TPU schedule is NOT a
long-sequence flash loop: the whole (N, N) score tile fits in VMEM. The
performance problem at these shapes is *grid overhead*, not memory: one
(batch, head) pair per grid cell means ~1.5k cells of ~8 MFLOP each, and
per-cell fixed costs dominate (measured ~5 TFLOPS). The kernel therefore
processes a GROUP of flattened (batch·head) pairs per cell with batched
`dot_general`s — fewer, fatter cells that keep the MXU pipelined, with the
score tile still VMEM-resident (never written to HBM).

The backward recomputes the score tile and its row statistics from q, k —
no attention residuals are persisted at all (the memory cost of the op is
exactly its q/k/v/o tensors) — and emits dQ, dK, dV in one kernel.

Biased attention (Swin relative-position bias) currently routes through the
XLA path (ops/attention.py) so the bias table stays differentiable; a
bias-accumulating Pallas backward is a planned optimization.

Layout contract (matching ops/attention.py): q, k, v are (B, N, H, D).
Sequence is padded to a multiple of 128 lanes; (batch·head) is padded to a
multiple of the group size; padded keys are masked with -inf.
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


def _group_sizes(n_pad: int, d_pad: int):
    """Pick (batch·head) group sizes for fwd/bwd under a ~10 MB VMEM budget.

    fwd live set ≈ G·(3·N·D·in + N·N·4·2 + N·D·4); bwd ≈ ~2× that."""
    cell = n_pad * n_pad * 4 * 2 + 4 * n_pad * d_pad * 4
    budget = 10 * 1024 * 1024
    g_fwd = max(1, min(16, budget // cell))
    g_bwd = max(1, min(8, (budget // 2) // cell))
    return g_fwd, g_bwd


def _interpret_flag(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Kernels — refs are (G, N_pad, D_pad) blocks of the flattened (B·H) axis
# ---------------------------------------------------------------------------

_BATCHED_QKT = (((2,), (2,)), ((0,), (0,)))   # (G,N,D)·(G,M,D) → (G,N,M)
_BATCHED_PV = (((2,), (1,)), ((0,), (0,)))    # (G,N,M)·(G,M,D) → (G,N,D)
_BATCHED_PTDO = (((1,), (1,)), ((0,), (0,)))  # (G,N,M)ᵀ·(G,N,D) → (G,M,D)


def _scores(q_ref, k_ref, scale, n_real):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    g, n_pad, _ = q.shape
    s = jax.lax.dot_general(q, k, _BATCHED_QKT,
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (g, n_pad, n_pad), 2)
    return jnp.where(col < n_real, s, -1e30)


def _fwd_kernel(n_real, scale, q_ref, k_ref, v_ref, o_ref):
    s = _scores(q_ref, k_ref, scale, n_real)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:], _BATCHED_PV,
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(n_real, scale, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    s = _scores(q_ref, k_ref, scale, n_real)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    dv = jax.lax.dot_general(p, do, _BATCHED_PTDO,
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _BATCHED_QKT,
                             preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row)
    dq = jax.lax.dot_general(ds, k_ref[:].astype(jnp.float32), _BATCHED_PV,
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q_ref[:].astype(jnp.float32), _BATCHED_PTDO,
                             preferred_element_type=jnp.float32) * scale

    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

def _flatten_bh(t: jnp.ndarray, n_pad: int, d_pad: int, g: int) -> jnp.ndarray:
    """(B, N, H, D) → (BH_pad, N_pad, D_pad), BH_pad multiple of g."""
    b, n, h, d = t.shape
    x = t.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    x = _pad_axis(_pad_axis(x, n_pad, 1), d_pad, 2)
    return _pad_axis(x, _round_up(b * h, g), 0)


def _block_spec(g: int, n_pad: int, d_pad: int):
    return pl.BlockSpec((g, n_pad, d_pad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention: q, k, v (B, N, H, D) → (B, N, H, D)."""
    out, _ = _fwd_rule(q, k, v, interpret)
    return out


def _fwd_rule(q, k, v, interpret):
    b, n, h, d = q.shape
    n_pad = _round_up(n)
    d_pad = _round_up(d, 64)
    g, _ = _group_sizes(n_pad, d_pad)
    bh_pad = _round_up(b * h, g)
    scale = 1.0 / float(np.sqrt(d))

    qt, kt, vt = (_flatten_bh(t, n_pad, d_pad, g) for t in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n, scale),
        grid=(bh_pad // g,),
        in_specs=[_block_spec(g, n_pad, d_pad)] * 3,
        out_specs=_block_spec(g, n_pad, d_pad),
        out_shape=jax.ShapeDtypeStruct((bh_pad, n_pad, d_pad), q.dtype),
        interpret=_interpret_flag(interpret),
    )(qt, kt, vt)

    o = out[:b * h, :n, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return o, (q, k, v)


def _bwd_rule(interpret, res, grad_out):
    q, k, v = res
    b, n, h, d = q.shape
    n_pad = _round_up(n)
    d_pad = _round_up(d, 64)
    _, g = _group_sizes(n_pad, d_pad)
    bh_pad = _round_up(b * h, g)
    scale = 1.0 / float(np.sqrt(d))

    qt, kt, vt = (_flatten_bh(t, n_pad, d_pad, g) for t in (q, k, v))
    gt = _flatten_bh(grad_out, n_pad, d_pad, g)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, n, scale),
        grid=(bh_pad // g,),
        in_specs=[_block_spec(g, n_pad, d_pad)] * 4,
        out_specs=[_block_spec(g, n_pad, d_pad)] * 3,
        out_shape=[jax.ShapeDtypeStruct((bh_pad, n_pad, d_pad), q.dtype)] * 3,
        interpret=_interpret_flag(interpret),
    )(qt, kt, vt, gt)

    def unflatten(x):
        return x[:b * h, :n, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)

    return unflatten(dq), unflatten(dk), unflatten(dv)


flash_attention.defvjp(_fwd_rule, _bwd_rule)
