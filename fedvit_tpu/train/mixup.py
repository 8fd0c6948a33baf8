"""MixUp / CutMix — RNG-keyed, jittable batch transforms (NHWC).

Parity targets: /root/reference/utils.py:112-164. The reference mutates
tensors on-device per batch with numpy RNG on the host; here everything is a
pure function of a PRNG key so it fuses into the jitted train step (no
host↔device sync per batch).

Note on the reference's `_rand_bbox` (utils.py:129-136): it reads
W,H = size[2],size[3] which for NCHW are actually (H,W); self-consistent only
because crops are square. We implement the intended square-image behavior;
the λ area-correction (utils.py:146) is reproduced exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup(key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray,
          alpha: float = 0.4) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convex combination with a permuted batch (utils.py:112-120).

    Returns (mixed, labels_a, labels_b, lam)."""
    k_lam, k_perm = jax.random.split(key)
    if alpha > 0:
        lam = jax.random.beta(k_lam, alpha, alpha)
    else:
        lam = jnp.float32(1.0)
    idx = jax.random.permutation(k_perm, images.shape[0])
    lam_b = lam.astype(images.dtype)
    mixed = lam_b * images + (1.0 - lam_b) * images[idx]
    return mixed, labels, labels[idx], lam


def _rand_bbox(key: jax.Array, h: int, w: int, lam: jnp.ndarray):
    """Square-image bbox sampling (utils.py:129-136 semantics)."""
    cut = jnp.sqrt(1.0 - lam)
    ch = (h * cut).astype(jnp.int32)
    cw = (w * cut).astype(jnp.int32)
    k1, k2 = jax.random.split(key)
    cy = jax.random.randint(k1, (), 0, h)
    cx = jax.random.randint(k2, (), 0, w)
    y1 = jnp.clip(cy - ch // 2, 0, h)
    y2 = jnp.clip(cy + ch // 2, 0, h)
    x1 = jnp.clip(cx - cw // 2, 0, w)
    x2 = jnp.clip(cx + cw // 2, 0, w)
    return y1, x1, y2, x2


def cutmix(key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray,
           alpha: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Box-paste mix with area-corrected λ (utils.py:138-147). NHWC input."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_lam, k_perm, k_box = jax.random.split(key, 3)
    lam0 = jax.random.beta(k_lam, alpha, alpha)
    idx = jax.random.permutation(k_perm, b)
    y1, x1, y2, x2 = _rand_bbox(k_box, h, w, lam0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))
    box = box[None, :, :, None]
    mixed = jnp.where(box, images[idx], images)
    area = ((y2 - y1) * (x2 - x1)).astype(jnp.float32)
    lam = 1.0 - area / float(h * w)
    return mixed, labels, labels[idx], lam


def make_mix_fn(aug_cfg):
    """Build the batch-mix fn from an AugmentationConfig: returns
    mix(key, images, labels) -> (mixed, labels_a, labels_b, lam).
    Mirrors the reference's mixer construction (train.py:116-124)."""
    mixup_on = aug_cfg.mixup.enabled and aug_cfg.mixup.alpha > 0
    cutmix_on = aug_cfg.cutmix.enabled and aug_cfg.cutmix.prob > 0
    if mixup_on and cutmix_on:
        return lambda k, x, y: mixup_cutmix(
            k, x, y, aug_cfg.mixup.alpha, aug_cfg.cutmix.alpha,
            aug_cfg.cutmix.prob)
    if mixup_on:
        return lambda k, x, y: mixup(k, x, y, aug_cfg.mixup.alpha)
    if cutmix_on:
        return lambda k, x, y: mixup_cutmix(
            k, x, y, 0.0, aug_cfg.cutmix.alpha, aug_cfg.cutmix.prob)
    return None


def mixup_cutmix(key: jax.Array, images: jnp.ndarray, labels: jnp.ndarray,
                 mixup_alpha: float = 0.4, cutmix_alpha: float = 1.0,
                 cutmix_prob: float = 0.7):
    """Randomly choose CutMix (w.p. cutmix_prob) else MixUp (utils.py:150-160).

    Returns (mixed, labels_a, labels_b, lam)."""
    k_choice, k_apply = jax.random.split(key)
    use_cutmix = jax.random.uniform(k_choice) < cutmix_prob
    return jax.lax.cond(
        use_cutmix,
        lambda k: cutmix(k, images, labels, cutmix_alpha),
        lambda k: mixup(k, images, labels, mixup_alpha),
        k_apply,
    )
