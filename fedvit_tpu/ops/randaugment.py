"""RandAugment — batched, jittable port of torchvision's op space.

Parity target: torchvision.transforms.RandAugment (used by the reference at
data.py:32-36,103-107,143-144 with num_ops=3, magnitude=12). Op space and
magnitude laws follow torchvision's `_augmentation_space` (num_bins=31):

  Identity, ShearX/Y (±0..0.3), TranslateX/Y (±0..150/331·size px),
  Rotate (±0..30°), Brightness/Color/Contrast/Sharpness (1 ± 0..0.9),
  Posterize (8→4 bits), Solarize (255→0 threshold), AutoContrast, Equalize

Execution model (TPU-first): torchvision's semantics are per-sample op
choice + per-sample sign, with the magnitude DETERMINISTIC given m. So each
round computes every op once on the WHOLE batch (with per-sample signs) and
per-sample `where`-selects — the distribution is identical to per-sample
dispatch, but there are no vmapped `lax.switch` branches and no scatters
(equalize's histogram is a fused compare-reduce, its LUT a fused
compare-sum), which are pathological on TPU (measured 1.5 s/32 imgs for the
naive per-sample formulation vs ~tens of ms for this one).

Geometry ops use NEAREST + zero fill (torchvision defaults). Images are
float32 [0,1] NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fedvit_tpu.ops.image import (adjust_brightness,
                                  adjust_contrast,
                                  adjust_saturation, grayscale)

NUM_BINS = 31
NUM_OPS = 14


# ---------------------------------------------------------------------------
# Batched geometry via barrel-shifter row/column shifts (ops/row_shift.py).
#
# Gathers are ~100 ms per (32,384,384,3) shift on this TPU in every
# formulation; shears/translations ARE one-axis shifts and rotation is the
# Paeth 3-shear decomposition, so everything runs on static rolls instead.
# The full geometric family is ONE parametrized 3-pass chain
# (x-shift → y-shift → x-shift), used by the driver with per-sample pass
# parameters so each round pays for the chain exactly once.
# ---------------------------------------------------------------------------

from fedvit_tpu.ops.row_shift import col_shift as shift_cols  # noqa: E402
from fedvit_tpu.ops.row_shift import row_shift as shift_rows  # noqa: E402


def _row_coords(b, h):
    return jax.lax.broadcasted_iota(jnp.float32, (b, h), 1) - (h - 1) / 2.0


def geometric_chain(img: jnp.ndarray,
                    m1: jnp.ndarray, t1: jnp.ndarray,
                    m2: jnp.ndarray, t2: jnp.ndarray,
                    m3: jnp.ndarray,
                    pad: int) -> jnp.ndarray:
    """x-shift(m1·(y−cy) + t1) → y-shift(m2·(x−cx) + t2) → x-shift(m3·(y−cy))
    on a canvas padded by `pad` (so rotation's intermediate shears don't clip
    content that returns inside). All params per-sample (B,)."""
    b, h, w, c = img.shape
    big = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hb, wb = h + 2 * pad, w + 2 * pad
    yy = _row_coords(b, hb)
    xx = _row_coords(b, wb)
    big = shift_rows(big, m1[:, None] * yy + t1[:, None])
    big = shift_cols(big, m2[:, None] * xx + t2[:, None])
    big = shift_rows(big, m3[:, None] * yy)
    return big[:, pad:pad + h, pad:pad + w, :]


def _zeros(b):
    return jnp.zeros((b,), jnp.float32)


def shear_x(img, mag):
    """Inverse-map src_x = x + mag·(y−cy) — torchvision ShearX. mag: (B,)."""
    b, h = img.shape[0], img.shape[1]
    return shift_rows(img, mag[:, None] * _row_coords(b, h))


def shear_y(img, mag):
    b, w = img.shape[0], img.shape[2]
    return shift_cols(img, mag[:, None] * _row_coords(b, w))


def translate_x(img, px):
    b, h = img.shape[0], img.shape[1]
    return shift_rows(img, jnp.broadcast_to(-px[:, None], (b, h)))


def translate_y(img, px):
    b, w = img.shape[0], img.shape[2]
    return shift_cols(img, jnp.broadcast_to(-px[:, None], (b, w)))


def rotate_deg(img, deg):
    """Per-sample rotation by the Paeth 3-shear decomposition: inverse-map
    factors a = −tan(θ/2) on the x-passes, sin θ on the y-pass."""
    b = img.shape[0]
    th = jnp.deg2rad(deg)
    a = -jnp.tan(th / 2.0)
    s = jnp.sin(th)
    pad = img.shape[1] // 3
    return geometric_chain(img, a, _zeros(b), s, _zeros(b), a, pad)


# ---------------------------------------------------------------------------
# Batched photometric ops (factor: (B,))
# ---------------------------------------------------------------------------

def _bc(f, img):
    return f.reshape((-1,) + (1,) * (img.ndim - 1))


# photometric ops shared with ColorJitter (ops/image.py — one source of
# truth for the torchvision blending semantics)
brightness = adjust_brightness
color = adjust_saturation
contrast = adjust_contrast


def sharpness(img, factor):
    """torchvision adjust_sharpness: blend with 3x3 smoothed, borders kept."""
    b, h, w, c = img.shape
    kernel = (jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0)
    x = img.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    sm = jax.lax.conv_general_dilated(x, kernel[None, None], (1, 1), "SAME")
    sm = sm.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = ((yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1))[..., None]
    sm = jnp.where(interior, sm, img)
    f = _bc(factor, img)
    return jnp.clip(f * img + (1.0 - f) * sm, 0.0, 1.0)


def posterize(img, bits: int):
    v = jnp.round(img * 255.0).astype(jnp.int32)
    shift = 8 - int(bits)
    v = (v >> shift) << shift
    return v.astype(jnp.float32) / 255.0


def solarize(img, threshold255: float):
    t = threshold255 / 255.0
    return jnp.where(img >= t, 1.0 - img, img)


def autocontrast(img, _=None):
    mn = img.min(axis=(1, 2), keepdims=True)
    mx = img.max(axis=(1, 2), keepdims=True)
    scale = jnp.where(mx > mn, 1.0 / jnp.where(mx > mn, mx - mn, 1.0), 1.0)
    out = jnp.where(mx > mn, (img - mn) * scale, img)
    return jnp.clip(out, 0.0, 1.0)


def _equalize_xla(img):
    """Per-(sample, channel) histogram equalization, scatter-free (XLA).

    torchvision `_scale_channel` math; the 256-bin histogram is a fused
    compare-reduce over pixels and the LUT application a fused compare-sum
    over bins (no gathers/scatters — both are TPU-pathological batched)."""
    b, h, w, c = img.shape
    v = jnp.clip(jnp.floor(img * 255.0), 0, 255).astype(jnp.int32)
    v_flat = v.transpose(0, 3, 1, 2).reshape(b, c, h * w)     # (B, C, P)
    bins = jnp.arange(256, dtype=jnp.int32)
    # hist (B, C, 256): reduce over pixels of broadcast compare (fused)
    hist = (v_flat[:, :, :, None] == bins).sum(axis=2).astype(jnp.float32)

    nz = hist > 0
    last_nz = 255 - jnp.argmax(nz[..., ::-1], axis=-1)        # (B, C)
    total = jnp.float32(h * w)
    last_val = jnp.take_along_axis(hist, last_nz[..., None], axis=-1)[..., 0]
    step = jnp.floor((total - last_val) / 255.0)              # (B, C)
    cum = jnp.cumsum(hist, axis=-1)
    step_safe = jnp.where(step == 0, 1.0, step)[..., None]
    lut = jnp.floor((cum + jnp.floor(step[..., None] / 2.0)) / step_safe)
    lut = jnp.clip(
        jnp.concatenate([jnp.zeros_like(lut[..., :1]), lut[..., :-1]],
                        axis=-1), 0, 255)                     # (B, C, 256)
    # apply LUT: out[p] = Σ_k [v[p]==k]·lut[k]  (fused, no gather)
    out_flat = ((v_flat[:, :, :, None] == bins) *
                lut[:, :, None, :]).sum(axis=-1)
    out = out_flat.reshape(b, c, h, w).transpose(0, 2, 3, 1) / 255.0
    return jnp.where(_bc_steps(step, img), img, out)


def _bc_steps(step, img):
    """(B, C) step==0 mask broadcast to (B, H, W, C)."""
    return (step == 0)[:, None, None, :]


# ---------------------------------------------------------------------------
# Pallas equalize — the 256-bin histogram and LUT application decomposed
# into 16×16 two-level one-hots contracted on the MXU, all VMEM-resident.
# The XLA compare-reduce formulation above runs the 256-way compare on the
# VPU over every pixel TWICE (~100 ms/batch at 192×224² — the single
# largest cost in the whole augmentation program); here each pass is two
# 16-wide compares plus batched (P, 16)·(16, 16) dots.
# ---------------------------------------------------------------------------

def _eq_kernel(total, chunk, v_ref, o_ref, s_ref):
    """All values stay 2-D: Mosaic rejects rank-1 vectors and mis-lays-out
    3-D one-hots with tiny minor dims. Per (sample, channel) row: one-hots
    are (16, L) built by broadcasting against a column iota, both histogram
    and LUT application are plain (16, L)·(L, 16)-shaped MXU matmuls."""
    g = v_ref.shape[0]
    i16c = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    r16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    c16 = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    tri_incl = jnp.where(c16 <= r16, 1.0, 0.0)   # L[k, j] = [j ≤ k]
    tri_strict = jnp.where(c16 < r16, 1.0, 0.0)  # T[m, i] = [i < m]
    idx2 = r16 * 16 + c16

    for row in range(g):
        def one_hots(sl):
            vc = v_ref[row:row + 1, sl]          # (1, L)
            return (jnp.where((vc >> 4) == i16c, 1.0, 0.0),   # (16, L)
                    jnp.where((vc & 15) == i16c, 1.0, 0.0))

        hist2 = jnp.zeros((16, 16), jnp.float32)
        for s in range(0, total, chunk):
            hi_oh, lo_oh = one_hots(slice(s, min(s + chunk, total)))
            hist2 = hist2 + jax.lax.dot_general(
                hi_oh, lo_oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # torchvision _scale_channel LUT math on (16, 16) = 256 bins,
        # flattened index k = 16·i + j (hi-major)
        rowcum = jnp.dot(hist2, tri_incl.T,
                         preferred_element_type=jnp.float32)
        prefix = jnp.dot(tri_strict,
                         hist2.sum(axis=1, keepdims=True),
                         preferred_element_type=jnp.float32)  # (16, 1)
        cumex = rowcum - hist2 + prefix
        nz = hist2 > 0
        last_nz = jnp.max(jnp.where(nz, idx2, -1), axis=(0, 1),
                          keepdims=True)                      # (1, 1)
        last_val = jnp.sum(jnp.where(idx2 == last_nz, hist2, 0.0),
                           axis=(0, 1), keepdims=True)        # (1, 1)
        step = jnp.floor((jnp.float32(total) - last_val) / 255.0)
        step_safe = jnp.where(step == 0, 1.0, step)
        lut2 = jnp.clip(jnp.floor(
            (cumex + jnp.floor(step / 2.0)) / step_safe), 0, 255)

        s_ref[row:row + 1, :] = step
        for s in range(0, total, chunk):
            sl = slice(s, min(s + chunk, total))
            hi_oh, lo_oh = one_hots(sl)
            mixed = jax.lax.dot_general(
                lut2, lo_oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (16, L)
            o_ref[row:row + 1, sl] = jnp.sum(hi_oh * mixed, axis=0,
                                             keepdims=True)


def equalize(img, _=None, impl=None):
    """Per-(sample, channel) histogram equalization (torchvision math).

    TPU: one Pallas kernel per 8 (sample, channel) rows — see _eq_kernel.
    CPU: the XLA compare-reduce formulation (impl="pallas" forces the
    kernel in interpret mode for tests). The TPU kernel's MXU-accumulated
    cumulative histogram can flip floor() by one LUT step on boundary
    pixels (≤ 1/255 deviation vs the exact XLA path)."""
    import jax as _jax
    try:
        on_tpu = _jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    b, h, w, c = img.shape
    bc = b * c
    if impl is None:
        impl = "pallas" if on_tpu else "xla"
    if impl == "xla":
        return _equalize_xla(img)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = h * w
    v = jnp.clip(jnp.floor(img * 255.0), 0, 255).astype(jnp.int32)
    v = v.transpose(0, 3, 1, 2).reshape(bc, p)
    # Mosaic requires the sublane block to be a multiple of 8 or the full
    # dim — pad the (sample, channel) row axis up to ×8 (e.g. bc=12 at
    # batch 4 RGB) and slice the pad back off; padded rows cost one extra
    # grid step at most and their outputs are discarded.
    g = 8
    bc_pad = -bc % g
    if bc_pad:
        v = jnp.concatenate(
            [v, jnp.zeros((bc_pad, p), jnp.int32)], axis=0)
    bcp = bc + bc_pad
    out, step = pl.pallas_call(
        lambda v_ref, o_ref, s_ref: _eq_kernel(p, 8192, v_ref, o_ref, s_ref),
        grid=(bcp // g,),
        in_specs=[pl.BlockSpec((g, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((g, p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((g, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((bcp, p), jnp.float32),
                   jax.ShapeDtypeStruct((bcp, 1), jnp.float32)],
        interpret=not on_tpu,
        **({} if not on_tpu else
           {"compiler_params": pltpu.CompilerParams(
               vmem_limit_bytes=64 * 1024 * 1024)}),
    )(v)
    out = out[:bc].reshape(b, c, h, w).transpose(0, 2, 3, 1) / 255.0
    step = step[:bc]
    passthrough = (step.reshape(b, c) == 0)[:, None, None, :]
    return jnp.where(passthrough, img, out.astype(img.dtype))


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _magnitudes(magnitude: int, size: int):
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
    """Apply RandAugment to a batch (B, H, W, C) of [0,1] floats.

    Channels beyond RGB (e.g. a packed mask) must NOT be passed here — the
    reference applies RandAugment to the image only (data.py:143-144)."""
    b = img.shape[0]
    size = img.shape[2]
    mags = _magnitudes(magnitude, size)

    import math
    rot_pad = max(8, int(math.tan(math.radians(mags["rotate"]) / 2)
                         * (size / 2)) + 2)

    for _ in range(num_ops):
        key, k_op, k_sign = jax.random.split(key, 3)
        op_idx = jax.random.randint(k_op, (b,), 0, NUM_OPS)
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0)
        enh = 1.0 + sign * mags["enhance"]

        # ---- ONE geometric chain covers ops 1..5 (identity for others) ----
        theta = jnp.deg2rad(sign * mags["rotate"])
        a_rot = -jnp.tan(theta / 2.0)
        s_rot = jnp.sin(theta)
        is_rot = op_idx == 5
        m1 = jnp.where(op_idx == 1, sign * mags["shear"],
                       jnp.where(is_rot, a_rot, 0.0))
        t1 = jnp.where(op_idx == 3, -sign * mags["translate"], 0.0)
        m2 = jnp.where(op_idx == 2, sign * mags["shear"],
                       jnp.where(is_rot, s_rot, 0.0))
        t2 = jnp.where(op_idx == 4, -sign * mags["translate"], 0.0)
        m3 = jnp.where(is_rot, a_rot, 0.0)
        geo = geometric_chain(img, m1, t1, m2, t2, m3, rot_pad)

        sel = op_idx.reshape(-1, 1, 1, 1)
        out = jnp.where((sel >= 1) & (sel <= 5), geo, img)
        for o, cand in (
            (6, brightness(img, enh)),
            (7, color(img, enh)),
            (8, contrast(img, enh)),
            (9, sharpness(img, enh)),
            (10, posterize(img, mags["posterize"])),
            (11, solarize(img, mags["solarize"])),
            (12, autocontrast(img)),
            (13, equalize(img)),
        ):
            out = jnp.where(sel == o, cand, out)
        img = out
    return img


# Backwards-compatible aliases used by tests (single-image semantics work
# on batches too since all ops are batched).
def _posterize(im, bits):
    return posterize(im[None] if im.ndim == 3 else im, int(bits))[0] \
        if im.ndim == 3 else posterize(im, int(bits))


def _solarize(im, t):
    x = im[None] if im.ndim == 3 else im
    r = solarize(x, float(t))
    return r[0] if im.ndim == 3 else r


def _autocontrast(im, _=None):
    x = im[None] if im.ndim == 3 else im
    r = autocontrast(x)
    return r[0] if im.ndim == 3 else r


def _equalize(im, _=None):
    x = im[None] if im.ndim == 3 else im
    r = equalize(x)
    return r[0] if im.ndim == 3 else r


def _sharpness(im, f):
    x = im[None] if im.ndim == 3 else im
    ff = jnp.full((x.shape[0],), f, jnp.float32)
    r = sharpness(x, ff)
    return r[0] if im.ndim == 3 else r
