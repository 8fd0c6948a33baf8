"""Scheduler curve, EMA math, MixUp/CutMix behavior — golden/property tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fedvit_tpu.train.ema import ema_init, ema_update
from fedvit_tpu.train.mixup import cutmix, mixup, mixup_cutmix
from fedvit_tpu.train.schedule import lr_curve, make_epoch_schedule, warmup_cosine_lr


# ---------------------------------------------------------------------------
# Scheduler — exact parity with reference utils.py:179-185
# ---------------------------------------------------------------------------

def _reference_lr(epoch, base, warmup, total, min_lr):
    import math
    if epoch < warmup:
        return base * epoch / max(1, warmup)
    progress = (epoch - warmup) / max(1, total - warmup)
    cos = 0.5 * (1 + math.cos(math.pi * progress))
    return min_lr + (base - min_lr) * cos


def test_lr_curve_matches_reference():
    base, warmup, total, min_lr = 1e-4, 5, 80, 1e-6
    ours = lr_curve(base, warmup, total, min_lr)
    ref = np.array([_reference_lr(e, base, warmup, total, min_lr) for e in range(total)])
    assert np.allclose(ours, ref, rtol=1e-6)


def test_lr_warmup_starts_at_zero():
    assert float(warmup_cosine_lr(0, 1e-4, 5, 80, 1e-6)) == 0.0


def test_epoch_schedule_step_granularity():
    sched = make_epoch_schedule(1e-4, 2, 10, 1e-6, steps_per_epoch=7)
    # constant within an epoch
    assert float(sched(0)) == float(sched(6))
    assert float(sched(7)) != float(sched(6))
    assert abs(float(sched(7)) - _reference_lr(1, 1e-4, 2, 10, 1e-6)) < 1e-10


# ---------------------------------------------------------------------------
# EMA — s = d·s + (1−d)·p (reference utils.py:81)
# ---------------------------------------------------------------------------

def test_ema_math():
    params = {"w": jnp.ones((3,)) * 2.0, "b": jnp.zeros((2,))}
    shadow = ema_init(params)
    new_params = {"w": jnp.ones((3,)) * 4.0, "b": jnp.ones((2,))}
    shadow = ema_update(shadow, new_params, 0.9)
    assert np.allclose(shadow["w"], 0.9 * 2.0 + 0.1 * 4.0)
    assert np.allclose(shadow["b"], 0.1)


def test_ema_converges_to_params():
    shadow = {"w": jnp.zeros(4)}
    params = {"w": jnp.ones(4)}
    for _ in range(2000):
        shadow = ema_update(shadow, params, 0.99)
    assert np.allclose(shadow["w"], 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# MixUp / CutMix
# ---------------------------------------------------------------------------

def _batch(b=8, h=32, w=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, 8, size=(b,)).astype(np.int32)
    return jnp.array(imgs), jnp.array(labels)


def test_mixup_convex_combination():
    imgs, labels = _batch()
    mixed, la, lb, lam = mixup(jax.random.key(0), imgs, labels, alpha=0.4)
    assert mixed.shape == imgs.shape
    l = float(lam)
    assert 0.0 <= l <= 1.0
    # mixed values bounded by min/max of inputs
    assert float(mixed.max()) <= float(imgs.max()) + 1e-6
    assert float(mixed.min()) >= float(imgs.min()) - 1e-6
    assert (np.asarray(la) == np.asarray(labels)).all()


def test_mixup_alpha_zero_identity():
    imgs, labels = _batch()
    mixed, la, lb, lam = mixup(jax.random.key(1), imgs, labels, alpha=0.0)
    assert float(lam) == 1.0
    assert np.allclose(mixed, imgs)


def test_cutmix_box_and_lambda():
    imgs, labels = _batch()
    mixed, la, lb, lam = cutmix(jax.random.key(2), imgs, labels, alpha=1.0)
    # λ equals 1 − pasted-area fraction ⇒ fraction of changed pixels ≤ 1−λ
    changed = np.asarray((mixed != imgs).any(axis=-1)).mean()
    assert changed <= (1 - float(lam)) + 1e-6
    assert mixed.shape == imgs.shape


def test_mixup_cutmix_combinator_jits():
    imgs, labels = _batch()
    fn = jax.jit(lambda k: mixup_cutmix(k, imgs, labels, 0.4, 1.0, 0.7))
    for i in range(4):
        mixed, la, lb, lam = fn(jax.random.key(i))
        assert np.isfinite(np.asarray(mixed)).all()
        assert 0.0 <= float(lam) <= 1.0


def test_cutmix_lambda_statistics():
    # over many draws, mean λ should be far from degenerate
    imgs, labels = _batch(b=4, h=16, w=16)
    lams = []
    for i in range(50):
        _, _, _, lam = cutmix(jax.random.key(i), imgs, labels, alpha=1.0)
        lams.append(float(lam))
    assert 0.2 < np.mean(lams) < 0.95
