"""Batched on-device image ops — the torchvision replacement.

Parity targets (all /root/reference/data.py):
  * TrainTransform  (:82-155): RandomResizedCrop(scale .7-1, ratio .9-1.1,
    bicubic; nearest for masks) → p=.5 HFlip → p=.5 VFlip → uniform ±30°
    rotation (nearest, zero fill) → ColorJitter (image only) → RandAugment
    (image only) → normalize (ImageNet stats; mask → (x−.5)/.5)
  * EvalTransform   (:162-182): resize to 1.14·size (bicubic) → CenterCrop
  * TTADataset      (:241-336): 8 deterministic views

Design: NHWC float32 in [0, 1], every op batched and jittable, randomness
from explicit PRNG keys (one key → whole batch, per-sample keys inside).
Geometry ops take/return an optional mask that shares the sampled params
(crop/flip/rotation), exactly like the reference's paired transform.

The reference does these per-sample on CPU workers with PIL; here they run
fused on device. Parity is distributional (same parameter laws) + numeric
closeness per op against PIL/torchvision oracles in tests/test_ops_image.py;
bitwise PIL equality is not a goal (SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fedvit_tpu.data.constants import IMAGENET_MEAN, IMAGENET_STD

# ---------------------------------------------------------------------------
# Basics
# ---------------------------------------------------------------------------


def to_float(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] → float32 [0,1] (no-op for floats)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


def normalize(img: jnp.ndarray,
              mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """Channel-wise (x−mean)/std (reference data.py:150)."""
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def normalize_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(x − .5)/.5 (reference data.py:153-154)."""
    return (mask - 0.5) / 0.5


def resize(img: jnp.ndarray, size: Tuple[int, int],
           method: str = "cubic", antialias: bool = True) -> jnp.ndarray:
    """Batched resize; method "cubic" (bicubic) or "nearest"."""
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, size[0], size[1], c), method=method,
                            antialias=antialias)


def center_crop(img: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = img.shape[1], img.shape[2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[:, top:top + size, left:left + size, :]


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    return img[:, :, ::-1, :]


def vflip(img: jnp.ndarray) -> jnp.ndarray:
    return img[:, ::-1, :, :]


def rot90k(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rotate by k·90° counter-clockwise (matches PIL/TF.rotate(90k))."""
    return jnp.rot90(img, k=k, axes=(1, 2))


# ---------------------------------------------------------------------------
# Per-sample crop-and-resize (the RandomResizedCrop engine)
# ---------------------------------------------------------------------------

def crop_and_resize(img: jnp.ndarray, boxes: jnp.ndarray, out_size: int,
                    method: str = "cubic", antialias: bool = True
                    ) -> jnp.ndarray:
    """Crop per-sample boxes (i, j, h, w) and resize to (out_size, out_size).

    Implemented with jax.image.scale_and_translate per sample (vmap): output
    coord o maps to input (o + 0.5)/s + start − 0.5 with s = out/box_extent —
    the same continuous mapping torchvision's resized_crop uses.
    """
    height, width = img.shape[1], img.shape[2]
    if method == "nearest":
        # scale_and_translate has no nearest mode — gather indices directly
        # (src = floor((o + 0.5)·extent/out) + start, the PIL convention)
        def one_nearest(im, box):
            i, j, h, w = box[0], box[1], box[2], box[3]
            o = jnp.arange(out_size, dtype=jnp.float32) + 0.5
            ys = jnp.clip(jnp.floor(o * h / out_size + i).astype(jnp.int32),
                          0, height - 1)
            xs = jnp.clip(jnp.floor(o * w / out_size + j).astype(jnp.int32),
                          0, width - 1)
            return im[ys][:, xs]

        return jax.vmap(one_nearest)(img, boxes.astype(jnp.float32))

    def one(im, box):
        i, j, h, w = box[0], box[1], box[2], box[3]
        scale = jnp.array([out_size / h, out_size / w], jnp.float32)
        translation = -jnp.array([i, j], jnp.float32) * scale
        return jax.image.scale_and_translate(
            im, (out_size, out_size, im.shape[-1]), (0, 1),
            scale, translation, method=method, antialias=antialias)

    return jax.vmap(one)(img, boxes.astype(jnp.float32))


def random_resized_crop_params(
        key: jax.Array, batch: int, height: int, width: int,
        scale: Tuple[float, float] = (0.7, 1.0),
        ratio: Tuple[float, float] = (0.9, 1.1)) -> jnp.ndarray:
    """Sample (B, 4) float boxes (i, j, h, w) with torchvision's algorithm
    (10 attempts then center fallback; RandomResizedCrop.get_params)."""
    area = float(height * width)
    log_ratio = (jnp.log(ratio[0]), jnp.log(ratio[1]))

    def per_sample(k):
        ks = jax.random.split(k, 4)
        target_area = area * jax.random.uniform(
            ks[0], (10,), minval=scale[0], maxval=scale[1])
        aspect = jnp.exp(jax.random.uniform(
            ks[1], (10,), minval=log_ratio[0], maxval=log_ratio[1]))
        w = jnp.round(jnp.sqrt(target_area * aspect))
        h = jnp.round(jnp.sqrt(target_area / aspect))
        valid = (w > 0) & (w <= width) & (h > 0) & (h <= height)
        # first valid attempt (argmax of bool picks first True)
        idx = jnp.argmax(valid)
        any_valid = valid.any()
        w_sel, h_sel = w[idx], h[idx]
        u_i = jax.random.uniform(ks[2])
        u_j = jax.random.uniform(ks[3])
        # randint(0, H - h + 1) expressed continuously
        i_sel = jnp.floor(u_i * (height - h_sel + 1.0))
        j_sel = jnp.floor(u_j * (width - w_sel + 1.0))

        # fallback: clamp aspect, center crop (torchvision fallback branch)
        in_ratio = width / height
        w_fb = jnp.where(in_ratio < ratio[0], float(width),
                         jnp.where(in_ratio > ratio[1],
                                   jnp.round(height * ratio[1]), float(width)))
        h_fb = jnp.where(in_ratio < ratio[0], jnp.round(width / ratio[0]),
                         jnp.where(in_ratio > ratio[1], float(height),
                                   float(height)))
        i_fb = jnp.round((height - h_fb) / 2.0)
        j_fb = jnp.round((width - w_fb) / 2.0)

        i = jnp.where(any_valid, i_sel, i_fb)
        j = jnp.where(any_valid, j_sel, j_fb)
        h_out = jnp.where(any_valid, h_sel, h_fb)
        w_out = jnp.where(any_valid, w_sel, w_fb)
        return jnp.stack([i, j, h_out, w_out])

    return jax.vmap(per_sample)(jax.random.split(key, batch))


def random_resized_crop(key: jax.Array, img: jnp.ndarray, out_size: int,
                        scale=(0.7, 1.0), ratio=(0.9, 1.1),
                        mask: Optional[jnp.ndarray] = None):
    """Paired RandomResizedCrop: bicubic for image, nearest for mask, shared
    boxes (reference data.py:111-117)."""
    b, h, w = img.shape[0], img.shape[1], img.shape[2]
    boxes = random_resized_crop_params(key, b, h, w, scale, ratio)
    out = crop_and_resize(img, boxes, out_size, "cubic")
    out = jnp.clip(out, 0.0, 1.0)   # bicubic can overshoot
    m_out = None
    if mask is not None:
        m_out = crop_and_resize(mask, boxes, out_size, "nearest",
                                antialias=False)
    return out, m_out


# ---------------------------------------------------------------------------
# Arbitrary-angle rotation (nearest, zero-fill — TF.rotate defaults)
# ---------------------------------------------------------------------------

def rotate(img: jnp.ndarray, angles_deg: jnp.ndarray,
           method: str = "nearest") -> jnp.ndarray:
    """Rotate each sample by its own angle (degrees, CCW like PIL), about the
    image center, zero fill. method: "nearest" | "bilinear".

    The nearest path uses the Paeth 3-shear decomposition over barrel-shift
    passes (ops/row_shift.py) — batched gathers are ~100 ms per 32×384² on
    this TPU while static rolls run at HBM speed; 3-shear differs from the
    direct nearest map on ~2-3%% of pixels (one-pixel rounding at edges)."""
    b, h, w, c = img.shape
    if method == "nearest":
        from fedvit_tpu.ops.row_shift import col_shift, row_shift
        th = jnp.deg2rad(angles_deg.astype(jnp.float32))
        a = -jnp.tan(th / 2.0)
        s = jnp.sin(th)
        pad = h // 3
        big = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        hb, wb = h + 2 * pad, w + 2 * pad
        yy = (jax.lax.broadcasted_iota(jnp.float32, (b, hb), 1)
              - (hb - 1) / 2.0)
        xx = (jax.lax.broadcasted_iota(jnp.float32, (b, wb), 1)
              - (wb - 1) / 2.0)
        big = row_shift(big, a[:, None] * yy)
        big = col_shift(big, s[:, None] * xx)
        big = row_shift(big, a[:, None] * yy)
        return big[:, pad:pad + h, pad:pad + w, :]
    theta = jnp.deg2rad(angles_deg.astype(jnp.float32))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx

    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    # inverse mapping (output → input), PIL rotates CCW
    src_x = cos * xx[None] - sin * yy[None] + cx
    src_y = sin * xx[None] + cos * yy[None] + cy

    # bilinear (exact inverse-map; used where sub-pixel quality matters —
    # note: batched gathers are slow on TPU, prefer nearest in hot paths)
    x0 = jnp.floor(src_x); y0 = jnp.floor(src_y)
    dx = src_x - x0; dy = src_y - y0
    out = jnp.zeros_like(img)
    for oy, ox, wgt in ((0, 0, (1 - dy) * (1 - dx)), (0, 1, (1 - dy) * dx),
                        (1, 0, dy * (1 - dx)), (1, 1, dy * dx)):
        xi = (x0 + ox).astype(jnp.int32)
        yi = (y0 + oy).astype(jnp.int32)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1); yi = jnp.clip(yi, 0, h - 1)
        vals = jax.vmap(lambda im, y, x: im[y, x])(img, yi, xi)
        out = out + vals * (wgt * inb)[..., None]
    return out


# ---------------------------------------------------------------------------
# Photometric ops (torchvision functional semantics, [0,1] floats)
# ---------------------------------------------------------------------------

_GRAY_W = jnp.array([0.2989, 0.587, 0.114], jnp.float32)  # ITU-R 601-2 (PIL "L")


def grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(…,3) → (…,1), PIL/torchvision luma weights. Extra channels ignored."""
    return (img[..., :3] * _GRAY_W).sum(-1, keepdims=True)


def adjust_brightness(img: jnp.ndarray, factor) -> jnp.ndarray:
    factor = jnp.asarray(factor, img.dtype)
    return jnp.clip(img * _bshape(factor, img), 0.0, 1.0)


def adjust_contrast(img: jnp.ndarray, factor) -> jnp.ndarray:
    """Blend with the mean of the grayscale image (torchvision semantics:
    mean over the whole image of rgb_to_grayscale)."""
    factor = _bshape(jnp.asarray(factor, img.dtype), img)
    mean = grayscale(img).mean(axis=(1, 2, 3), keepdims=True)
    return jnp.clip(factor * img + (1 - factor) * mean, 0.0, 1.0)


def adjust_saturation(img: jnp.ndarray, factor) -> jnp.ndarray:
    factor = _bshape(jnp.asarray(factor, img.dtype), img)
    gray = grayscale(img)
    return jnp.clip(factor * img + (1 - factor) * gray, 0.0, 1.0)


def adjust_hue(img: jnp.ndarray, factor) -> jnp.ndarray:
    """Hue shift by `factor` (in turns, [-0.5, 0.5]) via HSV round-trip."""
    factor = jnp.asarray(factor, img.dtype)
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0:1] + _bshape(factor, img)) % 1.0
    return hsv_to_rgb(jnp.concatenate([h, hsv[..., 1:]], axis=-1))


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, ((g - b) / safe) % 6.0,
                  jnp.where(mx == g, (b - r) / safe + 2.0,
                            (r - g) / safe + 4.0)) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _bshape(factor: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-batch factor to image rank."""
    if factor.ndim == 0:
        return factor
    return factor.reshape((-1,) + (1,) * (img.ndim - 1))


def color_jitter(key: jax.Array, img: jnp.ndarray,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2, hue: float = 0.0) -> jnp.ndarray:
    """torchvision ColorJitter: per-sample factors AND per-sample op order.

    The reference applies ColorJitter per item inside DataLoader workers, so
    every sample draws its own op permutation (torchvision samples a new
    order each __call__). Each of the n ordering steps computes all n
    candidate ops and selects per sample — n² cheap elementwise passes keep
    the whole thing one fused XLA program (no gathers).

    Reference config: brightness/contrast/saturation 0.2, hue 0
    (config.yaml:113-117)."""
    b = img.shape[0]
    k_f, k_o = jax.random.split(key)
    kb, kc, ks, kh = jax.random.split(k_f, 4)

    def factors(k, x):
        return jax.random.uniform(k, (b,), minval=max(0.0, 1 - x),
                                  maxval=1 + x) if x > 0 else jnp.ones((b,))

    fb = factors(kb, brightness)
    fc = factors(kc, contrast)
    fs = factors(ks, saturation)
    fh = (jax.random.uniform(kh, (b,), minval=-hue, maxval=hue)
          if hue > 0 else jnp.zeros((b,)))

    ops = [lambda x: adjust_brightness(x, fb),
           lambda x: adjust_contrast(x, fc),
           lambda x: adjust_saturation(x, fs)]
    if hue > 0:
        ops.append(lambda x: adjust_hue(x, fh))
    n = len(ops)

    # (b, n) independent random orders — one permutation per sample
    order = jnp.argsort(jax.random.uniform(k_o, (b, n)), axis=-1)

    sel_shape = (-1,) + (1,) * (img.ndim - 1)
    for step in range(n):
        which = order[:, step].reshape(sel_shape)
        out = img
        for i, op in enumerate(ops):
            out = jnp.where(which == i, op(img), out)
        img = out
    return img


# ---------------------------------------------------------------------------
# Composite transforms (reference TrainTransform / EvalTransform / TTA)
# ---------------------------------------------------------------------------

def train_transform(key: jax.Array, img: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    out_size: int = 384,
                    scale=(0.7, 1.0), ratio=(0.9, 1.1),
                    do_hflip: bool = True, do_vflip: bool = True,
                    rotation: float = 30.0,
                    cj=(0.2, 0.2, 0.2, 0.0),
                    randaugment_n: int = 3, randaugment_m: int = 12,
                    apply_normalize: bool = True):
    """The full reference TrainTransform (data.py:82-155), batched on device.

    img in [0,1] NHWC; mask (optional) NHW1 in [0,1] shares geometry params.
    Returns (img', mask') — normalized (ImageNet / (x−.5)/.5) when
    apply_normalize."""
    b = img.shape[0]
    k_crop, k_hf, k_vf, k_rot, k_cj, k_ra = jax.random.split(key, 6)

    img, mask = random_resized_crop(k_crop, img, out_size, scale, ratio, mask)

    if do_hflip:
        flip = jax.random.bernoulli(k_hf, 0.5, (b,))
        sel = flip.reshape(-1, 1, 1, 1)
        img = jnp.where(sel, hflip(img), img)
        if mask is not None:
            mask = jnp.where(sel, hflip(mask), mask)
    if do_vflip:
        flip = jax.random.bernoulli(k_vf, 0.5, (b,))
        sel = flip.reshape(-1, 1, 1, 1)
        img = jnp.where(sel, vflip(img), img)
        if mask is not None:
            mask = jnp.where(sel, vflip(mask), mask)

    if rotation > 0:
        angles = jax.random.uniform(k_rot, (b,), minval=-rotation,
                                    maxval=rotation)
        if mask is not None:
            # one 4-channel rotate instead of two (img + mask share angles
            # AND the nearest method, so packing channels is exact)
            packed = rotate(jnp.concatenate([img, mask], axis=-1), angles,
                            method="nearest")
            img, mask = packed[..., :3], packed[..., 3:]
        else:
            img = rotate(img, angles, method="nearest")

    if any(x > 0 for x in cj):
        img = color_jitter(k_cj, img, *cj)

    if randaugment_n > 0:
        from fedvit_tpu.ops.randaugment import randaugment
        img = randaugment(k_ra, img, num_ops=randaugment_n,
                          magnitude=randaugment_m)

    if apply_normalize:
        img = normalize(img)
        if mask is not None:
            mask = normalize_mask(mask)
    return img, mask


def eval_transform(img: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                   out_size: int = 384, apply_normalize: bool = True):
    """Resize to 1.14·size (bicubic / nearest for mask) → CenterCrop(size)
    → normalize (reference data.py:162-182)."""
    rs = int(out_size * 1.14)
    img = jnp.clip(resize(img, (rs, rs), "cubic"), 0.0, 1.0)
    img = center_crop(img, out_size)
    if mask is not None:
        mask = resize(mask, (rs, rs), "nearest", antialias=False)
        mask = center_crop(mask, out_size)
    if apply_normalize:
        img = normalize(img)
        if mask is not None:
            mask = normalize_mask(mask)
    return img, mask


def tta_views(img: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
              out_size: int = 384):
    """8 deterministic TTA views (reference data.py:241-336), stacked on a
    new axis 1: original, hflip, vflip, rot90, rot180, rot270,
    brightness ×1.15, ×0.85. Views are built from the raw image, then each
    goes through eval_transform — matching the reference order.

    Returns (B, 8, S, S, C) [, (B, 8, S, S, 1)]."""
    views = []
    mviews = [] if mask is not None else None

    def add(v_img, v_mask):
        i, m = eval_transform(v_img, v_mask, out_size)
        views.append(i)
        if mviews is not None:
            mviews.append(m)

    add(img, mask)
    add(hflip(img), hflip(mask) if mask is not None else None)
    add(vflip(img), vflip(mask) if mask is not None else None)
    for k in (1, 2, 3):
        add(rot90k(img, k), rot90k(mask, k) if mask is not None else None)
    add(adjust_brightness(img, 1.15), mask)
    add(adjust_brightness(img, 0.85), mask)

    out = jnp.stack(views, axis=1)
    m_out = jnp.stack(mviews, axis=1) if mviews is not None else None
    return out, m_out


def tta_views_named(img: jnp.ndarray, names, out_size: int = 384
                    ) -> jnp.ndarray:
    """Old-gen configurable TTA list (reference data_old.py:208-304):
    resize to 1.14·size first, then per view: original/hflip/vflip are
    center-cropped; crop_tl / crop_br / crop_center are corner crops of the
    resized image. Returns (B, len(names), S, S, C), normalized."""
    rs = int(out_size * 1.14)
    big = jnp.clip(resize(img, (rs, rs), "cubic"), 0.0, 1.0)
    center = center_crop(big, out_size)
    views = []
    for name in names:
        if name == "hflip":
            v = hflip(center)
        elif name == "vflip":
            v = vflip(center)
        elif name == "crop_tl":
            v = big[:, :out_size, :out_size, :]
        elif name == "crop_br":
            v = big[:, -out_size:, -out_size:, :]
        else:  # original / crop_center / unknown → center crop
            v = center
        views.append(normalize(v))
    return jnp.stack(views, axis=1)
