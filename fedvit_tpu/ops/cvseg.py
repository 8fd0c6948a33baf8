"""Batched on-device classical lesion segmentation.

Device-resident re-implementation of the reference's offline OpenCV pipeline
(/root/reference/precompute_masks.py:35-93):

  resize → RGB→LAB L channel → GaussianBlur(σ=5) → Otsu (inverted) →
  circular ROI (r = 0.45·min(h,w)) → morph close×3 / open×2 (7×7 ellipse) →
  largest connected component (fallback: centered ellipse) → dilate×1

The reference fans this out over a ProcessPoolExecutor of CPU workers
(precompute_masks.py:152-161); here the whole pipeline is one jittable
function over a batch, so masks can be generated inline in the input
pipeline or by the precompute CLI. Each stage is validated against the cv2
oracle in tests/test_cvseg.py.

Connected components use min-label propagation with pointer jumping
(shape-static, O(log diameter) sweeps) — the jit-compatible formulation of
cv2.connectedComponentsWithStats for this binary-mask use case.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# cv2.getStructuringElement(MORPH_ELLIPSE, (7,7)) — hardcoded oracle output.
# Kept as numpy (not jnp) so importing this module inside a jit trace can
# never capture a tracer in module state.
ELLIPSE_7x7 = np.array(
    [[0, 0, 0, 1, 0, 0, 0],
     [0, 1, 1, 1, 1, 1, 0],
     [1, 1, 1, 1, 1, 1, 1],
     [1, 1, 1, 1, 1, 1, 1],
     [1, 1, 1, 1, 1, 1, 1],
     [0, 1, 1, 1, 1, 1, 0],
     [0, 0, 0, 1, 0, 0, 0]], dtype=np.float32)


# ---------------------------------------------------------------------------
# Color: RGB → LAB L channel (OpenCV formula, L scaled to [0, 255])
# ---------------------------------------------------------------------------

def rgb_to_lab_l(rgb: jnp.ndarray) -> jnp.ndarray:
    """rgb (…,3) in [0,1] → L channel in [0, 255] (cv2.COLOR_BGR2LAB scale)."""
    rgb = rgb.astype(jnp.float32)
    lin = jnp.where(rgb > 0.04045,
                    ((rgb + 0.055) / 1.055) ** 2.4,
                    rgb / 12.92)
    y = (0.212671 * lin[..., 0] + 0.715160 * lin[..., 1]
         + 0.072169 * lin[..., 2])
    fy = jnp.where(y > 0.008856, jnp.cbrt(y), 7.787 * y + 16.0 / 116.0)
    l = 116.0 * fy - 16.0
    return l * (255.0 / 100.0)


# ---------------------------------------------------------------------------
# Gaussian blur (σ=5, ksize auto → 41 for float input, reflect-101 border)
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(sigma: float, ksize: int) -> jnp.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return jnp.asarray(k / k.sum(), jnp.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float = 5.0,
                  ksize: int = 41) -> jnp.ndarray:
    """Separable blur on (B, H, W); cv2 BORDER_DEFAULT = reflect-101."""
    k = _gaussian_kernel1d(sigma, ksize)
    pad = ksize // 2

    def blur_axis(x, axis):
        xp = jnp.pad(x, [(0, 0) if a != axis else (pad, pad)
                         for a in range(x.ndim)], mode="reflect")
        xp = jnp.moveaxis(xp, axis, -1)
        shape = xp.shape
        xp = xp.reshape(-1, 1, shape[-1])
        out = jax.lax.conv_general_dilated(
            xp, k.reshape(1, 1, ksize), (1,), "VALID")
        return jnp.moveaxis(out.reshape(shape[:-1] + (-1,)), -1, axis)

    return blur_axis(blur_axis(img, 1), 2)


# ---------------------------------------------------------------------------
# Otsu threshold (inverted binary), 256-bin uint8 histogram
# ---------------------------------------------------------------------------

def otsu_threshold(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """gray_u8 (H, W) int32 in [0,255] → scalar Otsu threshold (cv2: first
    argmax of between-class variance)."""
    hist = jax.ops.segment_sum(
        jnp.ones_like(gray_u8.reshape(-1), jnp.float32),
        gray_u8.reshape(-1), num_segments=256)
    total = hist.sum()
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)
    w1 = total - w0
    sum0 = jnp.cumsum(hist * bins)
    mu_total = sum0[-1]
    mu0 = sum0 / jnp.where(w0 == 0, 1.0, w0)
    mu1 = (mu_total - sum0) / jnp.where(w1 == 0, 1.0, w1)
    var_b = w0 * w1 * (mu0 - mu1) ** 2
    var_b = jnp.where((w0 == 0) | (w1 == 0), -1.0, var_b)
    return jnp.argmax(var_b).astype(jnp.int32)


def otsu_binary_inv(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """THRESH_BINARY_INV + THRESH_OTSU: src > t → 0 else 1 (bool fg)."""
    t = otsu_threshold(gray_u8)
    return gray_u8 <= t


# ---------------------------------------------------------------------------
# Morphology (binary, arbitrary SE via convolution counts)
# ---------------------------------------------------------------------------

def _conv2d_same_zero(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """(H, W) float SAME conv with zero border."""
    return jax.lax.conv_general_dilated(
        x[None, None], kernel[None, None],
        (1, 1), "SAME")[0, 0]


def dilate(binary: jnp.ndarray, se: jnp.ndarray = ELLIPSE_7x7,
           iterations: int = 1) -> jnp.ndarray:
    """Binary dilation; border acts as background (cv2 default border value
    makes the border a no-op for dilation)."""
    x = binary.astype(jnp.float32)
    for _ in range(iterations):
        x = (_conv2d_same_zero(x, se) > 0.5).astype(jnp.float32)
    return x > 0.5


def erode(binary: jnp.ndarray, se: jnp.ndarray = ELLIPSE_7x7,
          iterations: int = 1) -> jnp.ndarray:
    """Binary erosion; border acts as foreground (cv2 default)."""
    inv = 1.0 - binary.astype(jnp.float32)
    for _ in range(iterations):
        inv = (_conv2d_same_zero(inv, se) > 0.5).astype(jnp.float32)
    return inv < 0.5


def morph_close(binary, se=ELLIPSE_7x7, iterations: int = 1):
    """cv2 morphologyEx(CLOSE, iterations=n) = dilate×n then erode×n."""
    return erode(dilate(binary, se, iterations), se, iterations)


def morph_open(binary, se=ELLIPSE_7x7, iterations: int = 1):
    """cv2 morphologyEx(OPEN, iterations=n) = erode×n then dilate×n."""
    return dilate(erode(binary, se, iterations), se, iterations)


# ---------------------------------------------------------------------------
# Connected components (8-connectivity) + largest-component selection
# ---------------------------------------------------------------------------

def _min_pool_3x3(x: jnp.ndarray, big: float) -> jnp.ndarray:
    return -jax.lax.reduce_window(
        -x, -big, jax.lax.max, (3, 3), (1, 1), "SAME")


def connected_components(binary: jnp.ndarray,
                         max_iters: int = 64) -> jnp.ndarray:
    """Label 8-connected components of a (H, W) bool mask.

    Returns int32 labels: background = -1, components labeled by the flat
    index of their root pixel. Min-label propagation + pointer jumping:
    each sweep halves the remaining label distance, so 64 iterations cover
    any mask up to astronomically large diameters (2^64-pixel chains); a
    while_loop exits early on convergence.
    """
    h, w = binary.shape
    big = jnp.float32(h * w)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    fg = binary
    lab = jnp.where(fg, idx.astype(jnp.float32), big)

    def body(state):
        lab, _, it = state
        new = _min_pool_3x3(lab, float(h * w))
        new = jnp.where(fg, new, big)
        # pointer jumping: label ← label of my label's pixel
        flat = new.reshape(-1).astype(jnp.int32)
        safe = jnp.clip(flat, 0, h * w - 1)
        jumped = jnp.where(flat < h * w,
                           new.reshape(-1)[safe],
                           big).reshape(h, w)
        jumped = jnp.where(fg, jnp.minimum(new, jumped), big)
        changed = jnp.any(jumped != lab)
        return jumped, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lab, _, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True),
                                                jnp.int32(0)))
    return jnp.where(fg, lab.astype(jnp.int32), -1)


def largest_component(binary: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep only the largest 8-connected component.

    Returns (mask bool, any_fg bool scalar)."""
    h, w = binary.shape
    labels = connected_components(binary)
    flat = labels.reshape(-1)
    ones = jnp.where(flat >= 0, 1.0, 0.0)
    areas = jax.ops.segment_sum(ones, jnp.clip(flat, 0, h * w - 1),
                                num_segments=h * w)
    best = jnp.argmax(areas)
    any_fg = binary.any()
    return (labels == best) & any_fg, any_fg


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def _circle_mask(h: int, w: int) -> jnp.ndarray:
    cy, cx = h // 2, w // 2
    r = int(min(h, w) * 0.45)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) - cx
    return (yy * yy + xx * xx) <= r * r


def _fallback_ellipse(h: int, w: int) -> jnp.ndarray:
    cy, cx = h // 2, w // 2
    ay, ax = h // 3, w // 3
    yy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy) / ay
    xx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx) / ax
    return (yy * yy + xx * xx) <= 1.0


def segment_lesion(rgb: jnp.ndarray) -> jnp.ndarray:
    """Full classical-CV lesion segmentation for ONE (H, W, 3) [0,1] image
    (already resized to the target size). Returns (H, W) bool mask.

    Exact stage order of reference precompute_masks.py:35-93.
    """
    h, w = rgb.shape[0], rgb.shape[1]
    l_ch = rgb_to_lab_l(rgb)                               # float [0,255]
    blurred = gaussian_blur(l_ch[None], 5.0)[0]
    gray_u8 = jnp.clip(blurred, 0, 255).astype(jnp.int32)  # astype trunc
    binary = otsu_binary_inv(gray_u8)
    binary = binary & _circle_mask(h, w)
    binary = morph_close(binary, ELLIPSE_7x7, 3)
    binary = morph_open(binary, ELLIPSE_7x7, 2)
    largest, any_fg = largest_component(binary)
    mask = jnp.where(any_fg, largest, _fallback_ellipse(h, w))
    mask = dilate(mask, ELLIPSE_7x7, 1)
    return mask


@partial(jax.jit, static_argnames=("target_size",))
def segment_lesion_batch(rgb: jnp.ndarray, target_size: int = 224
                         ) -> jnp.ndarray:
    """Batched pipeline: (B, H, W, 3) [0,1] → (B, S, S, 1) float32 {0,1}.

    Resize uses area-style downscaling (cv2.INTER_AREA ≈ antialiased linear)."""
    b = rgb.shape[0]
    if rgb.shape[1] != target_size or rgb.shape[2] != target_size:
        rgb = jax.image.resize(rgb, (b, target_size, target_size, 3),
                               method="linear", antialias=True)
    masks = jax.vmap(segment_lesion)(rgb)
    return masks.astype(jnp.float32)[..., None]
