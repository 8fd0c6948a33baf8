"""On-device image ops vs PIL oracles.

The reference augments via torchvision/PIL on CPU workers; parity here is
numeric closeness per op (bitwise PIL equality is a non-goal — SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from fedvit_tpu.ops import image as I
from fedvit_tpu.ops.randaugment import (_autocontrast, _equalize, _posterize,
                                        _sharpness, _solarize, randaugment)


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(0)
    # smooth-ish image (random noise is the worst case for resample parity)
    base = rng.uniform(0, 1, size=(2, 8, 12, 3))
    img = np.stack([np.kron(b, np.ones((6, 6, 1))) for b in base])
    img = img[:, :48, :64]  # (2, 48, 64, 3)
    return img.astype(np.float32)


def to_pil(a):
    return Image.fromarray((a * 255).round().astype(np.uint8))


def from_pil(p):
    return np.asarray(p).astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# Exact ops
# ---------------------------------------------------------------------------

def test_flips_rot90_exact(rgb):
    x = jnp.array(rgb)
    assert np.allclose(I.hflip(x), rgb[:, :, ::-1])
    assert np.allclose(I.vflip(x), rgb[:, ::-1])
    assert np.allclose(I.rot90k(x, 1), np.rot90(rgb, 1, axes=(1, 2)))
    # PIL rotate(90) == np.rot90 CCW on square images
    sq = rgb[:, :48, :48]
    pil = from_pil(to_pil(sq[0]).rotate(90))
    assert np.allclose(np.asarray(I.rot90k(jnp.array(sq), 1))[0], pil,
                       atol=1 / 255)


def test_normalize_math(rgb):
    out = np.asarray(I.normalize(jnp.array(rgb)))
    ref = (rgb - np.array(I.IMAGENET_MEAN)) / np.array(I.IMAGENET_STD)
    assert np.allclose(out, ref, atol=1e-6)
    m = np.asarray(I.normalize_mask(jnp.array(rgb[..., :1])))
    assert np.allclose(m, (rgb[..., :1] - 0.5) / 0.5)


def test_center_crop(rgb):
    out = np.asarray(I.center_crop(jnp.array(rgb), 32))
    assert out.shape == (2, 32, 32, 3)
    assert np.allclose(out, rgb[:, 8:40, 16:48])


# ---------------------------------------------------------------------------
# Resampling vs PIL
# ---------------------------------------------------------------------------

def test_resize_bicubic_close_to_pil(rgb):
    ours = np.asarray(I.resize(jnp.array(rgb), (24, 32), "cubic"))
    for i in range(2):
        ref = from_pil(to_pil(rgb[i]).resize((32, 24), Image.BICUBIC))
        assert np.abs(ours[i] - ref).mean() < 0.02


def test_crop_and_resize_matches_pil_crop_resize(rgb):
    box = jnp.array([[8.0, 10.0, 32.0, 40.0], [0.0, 0.0, 48.0, 64.0]])
    ours = np.asarray(I.crop_and_resize(jnp.array(rgb), box, 24, "cubic"))
    for i, (t, l, h, w) in enumerate([(8, 10, 32, 40), (0, 0, 48, 64)]):
        ref = from_pil(to_pil(rgb[i]).resize(
            (24, 24), Image.BICUBIC, box=(l, t, l + w, t + h)))
        assert np.abs(np.clip(ours[i], 0, 1) - ref).mean() < 0.02, i


def test_random_resized_crop_properties(rgb):
    out, _ = I.random_resized_crop(jax.random.key(0), jnp.array(rgb), 32)
    assert out.shape == (2, 32, 32, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # params respect scale/ratio laws
    boxes = I.random_resized_crop_params(jax.random.key(1), 500, 48, 64,
                                         (0.7, 1.0), (0.9, 1.1))
    b = np.asarray(boxes)
    areas = b[:, 2] * b[:, 3] / (48 * 64)
    ratios = b[:, 3] / b[:, 2]
    assert (areas > 0.6).all() and (areas <= 1.05).all()
    assert (ratios > 0.85).all() and (ratios < 1.2).all()
    assert (b[:, 0] >= 0).all() and (b[:, 0] + b[:, 2] <= 48 + 1e-3).all()
    assert (b[:, 1] >= 0).all() and (b[:, 1] + b[:, 3] <= 64 + 1e-3).all()


def test_paired_crop_mask_nearest(rgb):
    mask = (rgb[..., :1] > 0.5).astype(np.float32)
    out, m = I.random_resized_crop(jax.random.key(2), jnp.array(rgb), 32,
                                   mask=jnp.array(mask))
    vals = np.unique(np.asarray(m))
    assert set(vals.tolist()) <= {0.0, 1.0}, "nearest must preserve binarity"


# ---------------------------------------------------------------------------
# Rotation vs PIL (nearest, zero fill)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("angle", [15.0, -22.5])
def test_rotate_matches_pil(rgb, angle):
    sq = rgb[:, :48, :48]
    ours = np.asarray(I.rotate(jnp.array(sq), jnp.array([angle, angle])))
    for i in range(2):
        ref = from_pil(to_pil(sq[i]).rotate(angle, Image.NEAREST))
        mismatch = (np.abs(ours[i] - ref).max(-1) > 0.05).mean()
        assert mismatch < 0.08, f"angle {angle}: {mismatch:.3f} pixels differ"


# ---------------------------------------------------------------------------
# Photometric vs PIL
# ---------------------------------------------------------------------------

def test_brightness_matches_pil(rgb):
    for f in (0.85, 1.15):
        ours = np.asarray(I.adjust_brightness(jnp.array(rgb[0:1]), f))[0]
        ref = from_pil(ImageEnhance.Brightness(to_pil(rgb[0])).enhance(f))
        assert np.abs(ours - ref).max() < 2 / 255


def test_saturation_close_to_pil(rgb):
    for f in (0.8, 1.2):
        ours = np.asarray(I.adjust_saturation(jnp.array(rgb[0:1]), f))[0]
        ref = from_pil(ImageEnhance.Color(to_pil(rgb[0])).enhance(f))
        assert np.abs(ours - ref).mean() < 0.01


def test_contrast_close_to_pil(rgb):
    for f in (0.8, 1.2):
        ours = np.asarray(I.adjust_contrast(jnp.array(rgb[0:1]), f))[0]
        ref = from_pil(ImageEnhance.Contrast(to_pil(rgb[0])).enhance(f))
        assert np.abs(ours - ref).mean() < 0.01


def test_color_jitter_smoke(rgb):
    out = I.color_jitter(jax.random.key(0), jnp.array(rgb), 0.2, 0.2, 0.2, 0.0)
    assert out.shape == rgb.shape
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    assert not np.allclose(out, rgb)


def test_hue_roundtrip(rgb):
    out = I.adjust_hue(jnp.array(rgb), 0.0)
    assert np.abs(np.asarray(out) - rgb).max() < 1e-4


# ---------------------------------------------------------------------------
# RandAugment sub-ops vs PIL
# ---------------------------------------------------------------------------

def test_posterize_matches_pil(rgb):
    ours = np.asarray(_posterize(jnp.array(rgb[0]), jnp.asarray(4)))
    ref = from_pil(ImageOps.posterize(to_pil(rgb[0]), 4))
    assert np.abs(ours - ref).max() < 1 / 255


def test_solarize_matches_pil(rgb):
    ours = np.asarray(_solarize(jnp.array(rgb[0]), jnp.asarray(128.0)))
    ref = from_pil(ImageOps.solarize(to_pil(rgb[0]), 128))
    assert np.abs(ours - ref).max() < 2 / 255


def test_autocontrast_matches_pil(rgb):
    ours = np.asarray(_autocontrast(jnp.array(rgb[0]), None))
    ref = from_pil(ImageOps.autocontrast(to_pil(rgb[0])))
    assert np.abs(ours - ref).mean() < 0.02


def test_equalize_matches_pil(rgb):
    ours = np.asarray(_equalize(jnp.array(rgb[0]), None))
    ref = from_pil(ImageOps.equalize(to_pil(rgb[0])))
    assert np.abs(ours - ref).mean() < 0.02


def test_sharpness_close_to_pil(rgb):
    ours = np.asarray(_sharpness(jnp.array(rgb[0]), 1.9))
    ref = from_pil(ImageEnhance.Sharpness(to_pil(rgb[0])).enhance(1.9))
    assert np.abs(ours - ref).mean() < 0.02


def test_randaugment_smoke(rgb):
    x = jnp.array(rgb)
    fn = jax.jit(lambda k: randaugment(k, x, num_ops=3, magnitude=12))
    outs = [np.asarray(fn(jax.random.key(i))) for i in range(3)]
    for o in outs:
        assert o.shape == rgb.shape
        assert np.isfinite(o).all()
        assert o.min() >= 0 and o.max() <= 1
    assert not np.allclose(outs[0], outs[1])  # different keys differ


# ---------------------------------------------------------------------------
# Composite transforms
# ---------------------------------------------------------------------------

def test_eval_transform_shapes(rgb):
    img, mask = I.eval_transform(jnp.array(rgb), jnp.array(rgb[..., :1]),
                                 out_size=32)
    assert img.shape == (2, 32, 32, 3)
    assert mask.shape == (2, 32, 32, 1)


def test_train_transform_full(rgb):
    mask = (rgb[..., :1] > 0.5).astype(np.float32)
    img, m = I.train_transform(jax.random.key(0), jnp.array(rgb),
                               jnp.array(mask), out_size=32,
                               randaugment_n=2, randaugment_m=9)
    assert img.shape == (2, 32, 32, 3) and m.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(img)).all()
    # mask normalized to ±1
    vals = np.unique(np.asarray(m))
    assert set(np.round(vals, 5).tolist()) <= {-1.0, 1.0}
    # deterministic given the key
    img2, _ = I.train_transform(jax.random.key(0), jnp.array(rgb),
                                jnp.array(mask), out_size=32,
                                randaugment_n=2, randaugment_m=9)
    assert np.allclose(img, img2)


def test_tta_views(rgb):
    sq = jnp.array(rgb[:, :48, :48])
    views, _ = I.tta_views(sq, out_size=32)
    assert views.shape == (2, 8, 32, 32, 3)
    # view 0 == plain eval transform
    ev, _ = I.eval_transform(sq, out_size=32)
    assert np.allclose(views[:, 0], ev, atol=1e-5)
    # hflip view == eval(hflip(img))
    ev_h, _ = I.eval_transform(I.hflip(sq), out_size=32)
    assert np.allclose(views[:, 1], ev_h, atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas augmentation kernels vs their XLA reference formulations
# ---------------------------------------------------------------------------

def test_pallas_row_col_shift_match_xla():
    import numpy as np
    import jax.numpy as jnp
    from fedvit_tpu.ops.row_shift import (row_shift, col_shift,
                                          _row_shift_xla, _col_shift_xla)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(3, 16, 24, 3)), jnp.float32)
    sh = jnp.asarray(rng.uniform(-20, 20, size=(3, 16)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(row_shift(img, sh, impl="pallas")),
        np.asarray(_row_shift_xla(img, sh)))
    sc = jnp.asarray(rng.uniform(-12, 12, size=(3, 24)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(col_shift(img, sc, impl="pallas")),
        np.asarray(_col_shift_xla(img, sc)))


def test_pallas_equalize_matches_xla():
    import numpy as np
    import jax.numpy as jnp
    from fedvit_tpu.ops.randaugment import equalize, _equalize_xla
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(2, 24, 20, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(equalize(img, impl="pallas")),
                                  np.asarray(_equalize_xla(img)))
    flat = jnp.full((2, 24, 20, 3), 0.5, jnp.float32)   # step==0 passthrough
    np.testing.assert_array_equal(np.asarray(equalize(flat, impl="pallas")),
                                  np.asarray(_equalize_xla(flat)))
