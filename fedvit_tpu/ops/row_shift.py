"""Barrel-shifter row/column shifts — the geometry engine for on-device
augmentation.

Every RandAugment geometric op (shear, translate, rotation via the Paeth
3-shear decomposition) reduces to per-row/per-column 1-D shifts. On this TPU
all gather formulations are pathologically slow (~100 ms per
(32,384,384,3) shift: vmapped point gather, take_along_axis, one-hot —
XLA lowers each to an elementwise gather), and Mosaic cannot do dynamic
lane-offset slices inside a Pallas kernel. The fast primitive that IS
available: static rolls. So each shift s ∈ [−W, W] is decomposed into its
binary expansion over a zero-padded (2·W) axis — ⌈log2(2W)⌉ static
`jnp.roll`s with per-row bit selects. Pure data movement, ~0.5 GB per pass,
runs at HBM speed.

out[b, y, x] = img[b, y, x + shift[b, y]]   (nearest, zero fill)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def row_shift(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
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


def col_shift(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
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
