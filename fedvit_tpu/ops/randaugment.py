"""RandAugment — batched, jittable port of torchvision's op space.

Parity target: torchvision.transforms.RandAugment (used by the reference at
data.py:32-36,103-107,143-144 with num_ops=3, magnitude=12). Op space and
magnitude laws follow torchvision's `_augmentation_space` (num_bins=31):

  Identity, ShearX/Y (±0..0.3), TranslateX/Y (±0..150/331·size px),
  Rotate (±0..30°), Brightness/Color/Contrast/Sharpness (1 ± 0..0.9),
  Posterize (8→4 bits), Solarize (255→0 threshold), AutoContrast, Equalize

Geometry ops use NEAREST + zero fill (torchvision defaults). Per-sample op
choice/magnitude-sign (vmap over the batch, lax.switch over ops).
Images are float32 [0,1] NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fedvit_tpu.ops.image import (adjust_brightness, adjust_contrast,
                                  adjust_saturation, grayscale)

NUM_BINS = 31
NUM_OPS = 14


# ---------------------------------------------------------------------------
# Single-image affine sampling (inverse map, nearest, zero fill)
# ---------------------------------------------------------------------------

def _affine_nearest(img: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """img (H,W,C); inv 2x3 inverse matrix mapping output (x,y,1) → input."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    src_x = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2] + cx
    src_y = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2] + cy
    ix = jnp.round(src_x).astype(jnp.int32)
    iy = jnp.round(src_y).astype(jnp.int32)
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    return jnp.where(inb[..., None], img[iy, ix], 0.0)


def _shear_x(img, mag):
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    inv = inv.at[0, 1].set(mag)
    return _affine_nearest(img, inv)


def _shear_y(img, mag):
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    inv = inv.at[1, 0].set(mag)
    return _affine_nearest(img, inv)


def _translate_x(img, px):
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    inv = inv.at[0, 2].set(-px)
    return _affine_nearest(img, inv)


def _translate_y(img, px):
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    inv = inv.at[1, 2].set(-px)
    return _affine_nearest(img, inv)


def _rotate(img, deg):
    th = jnp.deg2rad(deg)
    c, s = jnp.cos(th), jnp.sin(th)
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    inv = inv.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    return _affine_nearest(img, inv)


# ---------------------------------------------------------------------------
# Photometric single-image ops
# ---------------------------------------------------------------------------

def _sharpness(img, factor):
    """torchvision adjust_sharpness: blend with 3x3 smoothed (border kept)."""
    h, w, c = img.shape
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    x = img.transpose(2, 0, 1)[:, None]          # (C,1,H,W)
    k = kernel[None, None]
    sm = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME")[:, 0]
    sm = sm.transpose(1, 2, 0)
    # keep original border pixels (torchvision semantics)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1))[..., None]
    sm = jnp.where(interior, sm, img)
    return jnp.clip(factor * img + (1.0 - factor) * sm, 0.0, 1.0)


def _posterize(img, bits):
    v = jnp.round(img * 255.0).astype(jnp.int32)
    shift = 8 - bits.astype(jnp.int32)
    v = (v >> shift) << shift
    return v.astype(jnp.float32) / 255.0


def _solarize(img, threshold255):
    t = threshold255 / 255.0
    return jnp.where(img >= t, 1.0 - img, img)


def _autocontrast(img, _):
    mn = img.min(axis=(0, 1), keepdims=True)
    mx = img.max(axis=(0, 1), keepdims=True)
    scale = jnp.where(mx > mn, 1.0 / (mx - mn), 1.0)
    out = jnp.where(mx > mn, (img - mn) * scale, img)
    return jnp.clip(out, 0.0, 1.0)


def _equalize(img, _):
    """Per-channel histogram equalization (torchvision `_scale_channel`)."""
    def chan(x):
        v = jnp.clip(jnp.floor(x * 255.0), 0, 255).astype(jnp.int32)
        hist = jax.ops.segment_sum(jnp.ones_like(v.reshape(-1), jnp.float32),
                                   v.reshape(-1), num_segments=256)
        nz = hist > 0
        last_nz = 255 - jnp.argmax(nz[::-1])
        step = jnp.floor((hist.sum() - hist[last_nz]) / 255.0)
        cum = jnp.cumsum(hist)
        lut = jnp.floor((cum + jnp.floor(step / 2.0)) /
                        jnp.where(step == 0, 1.0, step))
        lut = jnp.clip(jnp.concatenate([jnp.zeros(1), lut[:-1]]), 0, 255)
        out = lut[v] / 255.0
        return jnp.where(step == 0, x, out)

    return jnp.stack([chan(img[..., i]) for i in range(img.shape[-1])],
                     axis=-1)


# ---------------------------------------------------------------------------
# RandAugment driver
# ---------------------------------------------------------------------------

def _magnitudes(magnitude: int, size: int):
    """Per-op unsigned magnitude at the given bin (torchvision laws)."""
    frac = magnitude / (NUM_BINS - 1)
    return {
        "shear": 0.3 * frac,
        "translate": (150.0 / 331.0) * size * frac,
        "rotate": 30.0 * frac,
        "enhance": 0.9 * frac,
        "posterize": 8 - round(frac * 4),
        "solarize": 255.0 * (1.0 - frac),
    }


def randaugment(key: jax.Array, img: jnp.ndarray, num_ops: int = 3,
                magnitude: int = 12) -> jnp.ndarray:
    """Apply RandAugment to a batch (B,H,W,C) of [0,1] floats.

    Channels beyond RGB (e.g. a mask stacked as 4th channel) must NOT be
    passed here — the reference applies RandAugment to the image only
    (data.py:143-144)."""
    size = img.shape[2]
    mags = _magnitudes(magnitude, size)

    def op_branches(x, signed_mag_unit):
        s = signed_mag_unit  # ±1
        return [
            lambda im: im,                                           # Identity
            lambda im: _shear_x(im, s * mags["shear"]),
            lambda im: _shear_y(im, s * mags["shear"]),
            lambda im: _translate_x(im, s * mags["translate"]),
            lambda im: _translate_y(im, s * mags["translate"]),
            lambda im: _rotate(im, s * mags["rotate"]),
            lambda im: jnp.clip(im * (1.0 + s * mags["enhance"]), 0, 1),  # Brightness
            lambda im: _color1(im, 1.0 + s * mags["enhance"]),            # Color
            lambda im: _contrast1(im, 1.0 + s * mags["enhance"]),         # Contrast
            lambda im: _sharpness(im, 1.0 + s * mags["enhance"]),
            lambda im: _posterize(im, jnp.asarray(mags["posterize"])),
            lambda im: _solarize(im, jnp.asarray(mags["solarize"])),
            lambda im: _autocontrast(im, None),
            lambda im: _equalize(im, None),
        ]

    def per_sample(k, im):
        for i in range(num_ops):
            k, k_op, k_sign = jax.random.split(k, 3)
            op_idx = jax.random.randint(k_op, (), 0, NUM_OPS)
            sign = jnp.where(jax.random.bernoulli(k_sign, 0.5), 1.0, -1.0)
            im = jax.lax.switch(op_idx, op_branches(im, sign), im)
        return im

    keys = jax.random.split(key, img.shape[0])
    return jax.vmap(per_sample)(keys, img)


def _color1(im, factor):
    gray = grayscale(im)
    return jnp.clip(factor * im + (1 - factor) * gray, 0.0, 1.0)


def _contrast1(im, factor):
    mean = grayscale(im).mean()
    return jnp.clip(factor * im + (1 - factor) * mean, 0.0, 1.0)
