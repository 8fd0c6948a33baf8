"""Barrel-shifter row/column shifts — the geometry engine for on-device
augmentation.

Every RandAugment geometric op (shear, translate, rotation via the Paeth
3-shear decomposition) reduces to per-row/per-column 1-D shifts. On this TPU
all gather formulations are pathologically slow (~100 ms per
(32,384,384,3) shift: vmapped point gather, take_along_axis, one-hot —
XLA lowers each to an elementwise gather). The fast primitive that IS
available: static rolls. Each shift s ∈ [−W, W] is decomposed into its
binary expansion over a zero-padded (2·W) axis — ⌈log2(2W)⌉ static rolls
with per-row bit selects.

Round 1 ran that decomposition in XLA: ~10 roll+select passes over the
whole batch in HBM (~3.5 GB of traffic per pass at training shapes —
measured ~130 ms/step of pure rolls/selects inside the augmentation
program). On TPU one sample fits VMEM, so the Pallas kernels below run the
SAME binary decomposition on a VMEM-resident value: ONE HBM read and ONE
write per shift, with the ~10 roll+select passes at VMEM bandwidth. The
channel dim is folded into lanes (pixel roll = C-lane roll), keeping the
block minor-two dims (H, W·C) well tiled.

out[b, y, x] = img[b, y, x + shift[b, y]]   (nearest, zero fill)

The XLA formulation is kept as `_row_shift_xla` / `_col_shift_xla` — the
CPU path and the fallback for images too large for VMEM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_shift_xla(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, C); shift (B, H) float → rounded int shift per row."""
    b, h, w, c = img.shape
    wp = 2 * w
    bits = max(1, math.ceil(math.log2(wp)))
    x = jnp.pad(img, ((0, 0), (0, 0), (0, wp - w), (0, 0)))

    s = jnp.clip(jnp.round(shift), -w, w).astype(jnp.int32)
    t = jnp.mod(s, wp)                      # left-roll amount in [0, wp)

    for bit in range(bits):
        amount = 1 << bit
        take = ((t >> bit) & 1).astype(bool)[:, :, None, None]
        rolled = jnp.roll(x, -amount, axis=2)
        x = jnp.where(take, rolled, x)
    return x[:, :, :w, :]


def _col_shift_xla(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, C); shift (B, W) → out[b,y,x] = img[b, y+s[b,x], x]."""
    b, h, w, c = img.shape
    hp = 2 * h
    bits = max(1, math.ceil(math.log2(hp)))
    x = jnp.pad(img, ((0, 0), (0, hp - h), (0, 0), (0, 0)))

    s = jnp.clip(jnp.round(shift), -h, h).astype(jnp.int32)
    t = jnp.mod(s, hp)

    for bit in range(bits):
        amount = 1 << bit
        take = ((t >> bit) & 1).astype(bool)[:, None, :, None]
        rolled = jnp.roll(x, -amount, axis=1)
        x = jnp.where(take, rolled, x)
    return x[:, :h, :, :]


# ---------------------------------------------------------------------------
# Pallas kernels — one sample per grid cell, rolls on the VMEM value
# ---------------------------------------------------------------------------

def _row_shift_kernel(w, c, img_ref, t_ref, o_ref):
    h = img_ref.shape[1]
    wp = 2 * w
    bits = max(1, math.ceil(math.log2(wp)))
    x0 = img_ref[0]
    x = jnp.concatenate(
        [x0, jnp.zeros((x0.shape[0], (wp - w) * c), x0.dtype)], axis=1)
    t = t_ref[0, 0]                                 # (H,) int32
    for bit in range(bits):
        take = ((t >> bit) & 1)[:, None]            # int32 (minor-dim insert
        rolled = jnp.roll(x, -((1 << bit) * c), axis=1)   # on bool unsupported)
        x = jnp.where(take != 0, rolled, x)
    o_ref[0] = x[:, :w * c]


def _col_shift_kernel(h, c, img_ref, t_ref, o_ref):
    wc = img_ref.shape[2]
    hp = 2 * h
    bits = max(1, math.ceil(math.log2(hp)))
    x0 = img_ref[0]
    x = jnp.concatenate(
        [x0, jnp.zeros((hp - h, x0.shape[1]), x0.dtype)], axis=0)
    tl = t_ref[0]                                   # (1, W·C) int32 — the
    # per-pixel roll amounts pre-expanded across channel lanes by the caller
    for bit in range(bits):
        take = (tl >> bit) & 1
        rolled = jnp.roll(x, -(1 << bit), axis=0)
        x = jnp.where(take != 0, rolled, x)
    o_ref[0] = x[:h]


def _shift_amount(shift: jnp.ndarray, extent: int) -> jnp.ndarray:
    s = jnp.clip(jnp.round(shift), -extent, extent).astype(jnp.int32)
    return jnp.mod(s, 2 * extent)


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# the padded VMEM value (plus a rolled temporary) must fit comfortably
_VMEM_SAMPLE_BUDGET = 24 * 1024 * 1024


def _pick_impl(impl: Optional[str], padded_bytes: int) -> str:
    if impl is not None:
        return impl
    if _on_tpu() and 3 * padded_bytes <= _VMEM_SAMPLE_BUDGET:
        return "pallas"
    return "xla"


def _shift_call(kernel, img, t, tlen):
    b, h, w, c = img.shape
    flat = img.reshape(b, h, w * c)
    t = t.reshape(b, 1, tlen)
    kwargs = {}
    if _on_tpu():
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, tlen), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), img.dtype),
        interpret=not _on_tpu(),
        **kwargs,
    )(flat, t)
    return out.reshape(b, h, w, c)


def row_shift(img: jnp.ndarray, shift: jnp.ndarray,
              impl: Optional[str] = None) -> jnp.ndarray:
    """img (B, H, W, C); shift (B, H) float → rounded int shift per row."""
    b, h, w, c = img.shape
    if _pick_impl(impl, 2 * w * c * h * img.dtype.itemsize) == "xla":
        return _row_shift_xla(img, shift)
    t = _shift_amount(shift, w)
    return _shift_call(functools.partial(_row_shift_kernel, w, c),
                       img, t, h)


def col_shift(img: jnp.ndarray, shift: jnp.ndarray,
              impl: Optional[str] = None) -> jnp.ndarray:
    """img (B, H, W, C); shift (B, W) → out[b,y,x] = img[b, y+s[b,x], x]."""
    b, h, w, c = img.shape
    if _pick_impl(impl, 2 * w * c * h * img.dtype.itemsize) == "xla":
        return _col_shift_xla(img, shift)
    t = _shift_amount(shift, h)
    # expand pixel roll amounts across channel lanes host/XLA-side (tiny)
    t = jnp.repeat(t, c, axis=1, total_repeat_length=w * c)
    return _shift_call(functools.partial(_col_shift_kernel, h, c),
                       img, t, w * c)
