"""Loss parity — golden values against a torch re-derivation of the
reference math (/root/reference/losses.py:41-67, train_old call sites)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.train.losses import (
    asymmetric_focal_loss, bce_dice_loss, build_loss, cross_entropy_loss,
    focal_loss, joint_loss, mixup_criterion,
)


def _torch_asymmetric(logits, targets, gamma_neg=4.0, gamma_pos=1.0,
                      clip=0.05, eps=1e-8):
    """Direct transcription of the reference forward (losses.py:41-67)."""
    logits = torch.tensor(logits)
    targets = torch.tensor(targets)
    probs = torch.softmax(logits, dim=1)
    one_hot = F.one_hot(targets, logits.shape[1]).float()
    p_pos = probs.clamp(min=eps)
    p_neg = probs.clamp(max=1.0 - eps)
    if clip > 0:
        p_neg = (p_neg - clip).clamp(min=eps)
    loss_pos = one_hot * torch.log(p_pos)
    loss_neg = (1.0 - one_hot) * torch.log(1.0 - p_neg)
    w_pos = (1.0 - probs).clamp(min=0.0) ** gamma_pos
    w_neg = probs.clamp(min=0.0) ** gamma_neg
    return float((-(w_pos * loss_pos + w_neg * loss_neg)).sum(dim=1).mean())


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(16, 8)).astype(np.float32) * 3.0
    targets = rng.integers(0, 8, size=(16,)).astype(np.int32)
    return logits, targets


def test_asymmetric_matches_reference_math(batch):
    logits, targets = batch
    ours = float(asymmetric_focal_loss(jnp.array(logits), jnp.array(targets)))
    ref = _torch_asymmetric(logits, targets.astype(np.int64))
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_asymmetric_param_sweep(batch):
    logits, targets = batch
    for gn, gp, clip in [(2.0, 0.0, 0.0), (4.0, 1.0, 0.05), (1.0, 2.0, 0.2)]:
        ours = float(asymmetric_focal_loss(
            jnp.array(logits), jnp.array(targets), gn, gp, clip))
        ref = _torch_asymmetric(logits, targets.astype(np.int64), gn, gp, clip)
        assert abs(ours - ref) < 1e-5


def test_asymmetric_positive_scalar(batch):
    logits, targets = batch
    v = asymmetric_focal_loss(jnp.array(logits), jnp.array(targets))
    assert v.shape == () and float(v) > 0


def test_cross_entropy_matches_torch(batch):
    logits, targets = batch
    ours = float(cross_entropy_loss(jnp.array(logits), jnp.array(targets)))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(targets.astype(np.int64))))
    assert abs(ours - ref) < 1e-5


def test_weighted_smoothed_ce_matches_torch(batch):
    logits, targets = batch
    w = np.linspace(0.5, 2.0, 8).astype(np.float32)
    ours = float(cross_entropy_loss(jnp.array(logits), jnp.array(targets),
                                    class_weights=jnp.array(w), label_smoothing=0.1))
    ref = float(F.cross_entropy(torch.tensor(logits),
                                torch.tensor(targets.astype(np.int64)),
                                weight=torch.tensor(w), label_smoothing=0.1))
    assert abs(ours - ref) < 1e-5


def test_focal_reduces_to_ce_at_gamma0(batch):
    logits, targets = batch
    f0 = float(focal_loss(jnp.array(logits), jnp.array(targets), gamma=0.0))
    ce = float(cross_entropy_loss(jnp.array(logits), jnp.array(targets)))
    assert abs(f0 - ce) < 1e-6


def test_bce_dice_basics():
    rng = np.random.default_rng(1)
    seg_logits = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    seg_targets = (rng.uniform(size=(2, 16, 16, 1)) > 0.5).astype(np.float32)
    v = float(bce_dice_loss(jnp.array(seg_logits), jnp.array(seg_targets)))
    assert v > 0
    # perfect prediction → loss near 0
    perfect = (seg_targets * 2 - 1) * 50.0
    v2 = float(bce_dice_loss(jnp.array(perfect), jnp.array(seg_targets)))
    assert v2 < 0.05


def test_joint_loss_weights_seg(batch):
    logits, targets = batch
    rng = np.random.default_rng(2)
    seg_logits = rng.normal(size=(16, 8, 8, 1)).astype(np.float32)
    seg_targets = (rng.uniform(size=(16, 8, 8, 1)) > 0.5).astype(np.float32)
    base = float(cross_entropy_loss(jnp.array(logits), jnp.array(targets)))
    j = float(joint_loss(cross_entropy_loss, jnp.array(logits), jnp.array(targets),
                         jnp.array(seg_logits), jnp.array(seg_targets), seg_weight=0.3))
    seg = float(bce_dice_loss(jnp.array(seg_logits), jnp.array(seg_targets)))
    assert abs(j - (base + 0.3 * seg)) < 1e-6


def test_mixup_criterion(batch):
    logits, targets = batch
    tb = np.roll(targets, 1)
    lam = 0.3
    v = float(mixup_criterion(cross_entropy_loss, jnp.array(logits),
                              jnp.array(targets), jnp.array(tb), lam))
    a = float(cross_entropy_loss(jnp.array(logits), jnp.array(targets)))
    b = float(cross_entropy_loss(jnp.array(logits), jnp.array(tb)))
    assert abs(v - (lam * a + (1 - lam) * b)) < 1e-6


def test_build_loss_factory(batch):
    logits, targets = batch
    cfg = from_dict({"loss": {"type": "asymmetric",
                              "asymmetric": {"gamma_neg": 4, "gamma_pos": 1, "clip": 0.05}}})
    fn = build_loss(cfg)
    ours = float(fn(jnp.array(logits), jnp.array(targets)))
    ref = _torch_asymmetric(logits, targets.astype(np.int64))
    assert abs(ours - ref) < 1e-5

    cfg_ce = from_dict({"loss": {"type": "ce", "label_smoothing": 0.1}})
    assert float(build_loss(cfg_ce)(jnp.array(logits), jnp.array(targets))) > 0


def test_loss_is_jittable_and_differentiable(batch):
    logits, targets = batch
    g = jax.grad(lambda l: asymmetric_focal_loss(l, jnp.array(targets)))(jnp.array(logits))
    assert np.isfinite(np.asarray(g)).all()
    jf = jax.jit(asymmetric_focal_loss)
    assert np.isfinite(float(jf(jnp.array(logits), jnp.array(targets))))
