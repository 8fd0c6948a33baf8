"""On-device classical segmentation vs the cv2 oracle (the reference's
actual implementation, precompute_masks.py:35-93)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from fedvit_tpu.ops import cvseg as S


def synth_lesion(size=96, seed=0):
    """Skin-like bright background + dark elliptical lesion."""
    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), [0.85, 0.65, 0.55], np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = size // 2 + rng.integers(-8, 8), size // 2 + rng.integers(-8, 8)
    ay, ax = size // 5 + rng.integers(0, 6), size // 6 + rng.integers(0, 6)
    inside = ((yy - cy) / ay) ** 2 + ((xx - cx) / ax) ** 2 <= 1.0
    img[inside] = [0.35, 0.2, 0.25]
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def to_u8_bgr(rgb):
    return (rgb[..., ::-1] * 255).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# Stage oracles
# ---------------------------------------------------------------------------

def test_lab_l_matches_cv2():
    rgb = synth_lesion()
    ours = np.asarray(S.rgb_to_lab_l(jnp.array(rgb)))
    ref = cv2.cvtColor(to_u8_bgr(rgb), cv2.COLOR_BGR2LAB)[..., 0].astype(np.float32)
    assert np.abs(ours - ref).mean() < 1.0
    assert np.abs(ours - ref).max() < 3.0


def test_gaussian_blur_matches_cv2():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    ours = np.asarray(S.gaussian_blur(jnp.array(x)[None], 5.0))[0]
    ref = cv2.GaussianBlur(x, (0, 0), sigmaX=5)
    assert np.abs(ours - ref).max() < 0.05


def test_otsu_matches_cv2():
    rng = np.random.default_rng(2)
    # bimodal image
    x = np.concatenate([rng.normal(60, 15, 2000), rng.normal(180, 20, 3000)])
    x = np.clip(x, 0, 255).astype(np.uint8).reshape(50, 100)
    t_ref, bin_ref = cv2.threshold(x, 0, 255,
                                   cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
    t_ours = int(S.otsu_threshold(jnp.array(x.astype(np.int32))))
    assert abs(t_ours - t_ref) <= 1, (t_ours, t_ref)
    ours = np.asarray(S.otsu_binary_inv(jnp.array(x.astype(np.int32))))
    agree = (ours == (bin_ref > 0)).mean()
    assert agree > 0.999


def test_morphology_matches_cv2():
    rng = np.random.default_rng(3)
    binary = (rng.uniform(size=(64, 64)) > 0.6).astype(np.uint8) * 255
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
    bj = jnp.array(binary > 0)

    ref_d = cv2.dilate(binary, k, iterations=1) > 0
    assert (np.asarray(S.dilate(bj)) == ref_d).all()

    ref_e = cv2.erode(binary, k, iterations=1) > 0
    assert (np.asarray(S.erode(bj)) == ref_e).all()

    ref_c = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, k, iterations=3) > 0
    assert (np.asarray(S.morph_close(bj, iterations=3)) == ref_c).all()

    ref_o = cv2.morphologyEx(binary, cv2.MORPH_OPEN, k, iterations=2) > 0
    assert (np.asarray(S.morph_open(bj, iterations=2)) == ref_o).all()


def test_largest_component_matches_cv2():
    img = np.zeros((60, 80), np.uint8)
    cv2.circle(img, (20, 20), 8, 255, -1)
    cv2.circle(img, (60, 40), 14, 255, -1)   # largest
    cv2.rectangle(img, (5, 50), (12, 57), 255, -1)
    ours, any_fg = S.largest_component(jnp.array(img > 0))
    n, labels, stats, _ = cv2.connectedComponentsWithStats(img, connectivity=8)
    largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
    ref = labels == largest
    assert bool(any_fg)
    assert (np.asarray(ours) == ref).all()


def test_largest_component_diagonal_connectivity():
    # 8-connectivity joins diagonal pixels (4-connectivity would not)
    img = np.zeros((10, 10), bool)
    img[2, 2] = img[3, 3] = img[4, 4] = True
    img[8, 8] = True
    ours, _ = S.largest_component(jnp.array(img))
    assert np.asarray(ours).sum() == 3


def test_empty_mask_fallback():
    rgb = np.full((64, 64, 3), 0.5, np.float32)  # uniform — otsu+roi may zero out
    mask = np.asarray(S.segment_lesion(jnp.array(rgb)))
    assert mask.any(), "fallback ellipse must fire on empty foreground"


# ---------------------------------------------------------------------------
# Full-pipeline parity vs the reference cv2 implementation
# ---------------------------------------------------------------------------

def _reference_segment_lesion(image_bgr, target_size):
    """Transcription of reference precompute_masks.py:35-93 (oracle)."""
    img = cv2.resize(image_bgr, (target_size, target_size),
                     interpolation=cv2.INTER_AREA)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
    l_ch = lab[:, :, 0].astype(np.float32)
    blurred = cv2.GaussianBlur(l_ch, (0, 0), sigmaX=5).astype(np.uint8)
    _, binary = cv2.threshold(blurred, 0, 255,
                              cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
    h, w = binary.shape
    cx, cy = w // 2, h // 2
    radius = int(min(h, w) * 0.45)
    circle = np.zeros_like(binary)
    cv2.circle(circle, (cx, cy), radius, 255, thickness=-1)
    binary = cv2.bitwise_and(binary, circle)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
    binary = cv2.morphologyEx(binary, cv2.MORPH_CLOSE, kernel, iterations=3)
    binary = cv2.morphologyEx(binary, cv2.MORPH_OPEN, kernel, iterations=2)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(binary, connectivity=8)
    if n > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        binary = np.where(labels == largest, 255, 0).astype(np.uint8)
    else:
        binary = np.zeros((h, w), np.uint8)
        cv2.ellipse(binary, (cx, cy), (w // 3, h // 3), 0, 0, 360, 255, -1)
    binary = cv2.dilate(binary, kernel, iterations=1)
    return binary > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_pipeline_iou_vs_reference(seed):
    rgb = synth_lesion(size=96, seed=seed)
    ours = np.asarray(S.segment_lesion_batch(jnp.array(rgb)[None], 96))[0, ..., 0] > 0.5
    ref = _reference_segment_lesion(to_u8_bgr(rgb), 96)
    inter = (ours & ref).sum()
    union = (ours | ref).sum()
    iou = inter / max(union, 1)
    assert iou > 0.93, f"IoU {iou:.3f} vs cv2 reference"


def test_batch_shapes_and_jit():
    rgbs = np.stack([synth_lesion(96, s) for s in range(2)])
    out = S.segment_lesion_batch(jnp.array(rgbs), 64)
    assert out.shape == (2, 64, 64, 1)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
