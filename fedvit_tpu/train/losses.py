"""Loss functions — pure jittable functions on (logits, integer targets).

Covers the whole reference loss surface:
  * AsymmetricFocalLoss — exact math of /root/reference/losses.py:41-67
  * focal / cross-entropy with optional class weights + label smoothing —
    old-gen `build_classification_loss` behavior (reference train_old.py:382-390,
    config_old.yaml loss block; original file overwritten, reconstructed from
    call sites per SURVEY.md §2.2 O7)
  * BCE-Dice segmentation loss + JointLoss (cls + λ·seg) — reference
    train_old.py:392-396 / :131-147 call sites
  * mixup_criterion — λ-weighted two-target combination (utils.py:163-164)

Every loss is a function ``loss(logits, targets) -> scalar`` so it composes
with jax.grad / vmap / shard_map without object state.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fedvit_tpu.core.config import Config, LossConfig

LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# Asymmetric focal loss (current generation)
# ---------------------------------------------------------------------------

def asymmetric_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Asymmetric focal loss for single-label multi-class classification.

    Exact parity with /root/reference/losses.py:41-67:
      probs = softmax(logits)
      p_pos = clamp(probs, min=eps); p_neg = clamp(probs, max=1-eps)
      p_neg = clamp(p_neg - clip, min=eps)               (if clip > 0)
      loss  = -[(1-p)^γ+ · y · log p_pos
                + p^γ- · (1-y) · log(1-p_neg)]
      reduce: sum over classes, mean over batch.

    logits : (B, C) float; targets : (B,) int32.
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)

    p_pos = jnp.clip(probs, min=eps)
    p_neg = jnp.clip(probs, max=1.0 - eps)
    if clip > 0:
        p_neg = jnp.clip(p_neg - clip, min=eps)

    loss_pos = one_hot * jnp.log(p_pos)
    loss_neg = (1.0 - one_hot) * jnp.log(1.0 - p_neg)

    w_pos = jnp.clip(1.0 - probs, min=0.0) ** gamma_pos
    w_neg = jnp.clip(probs, min=0.0) ** gamma_neg

    loss = -(w_pos * loss_pos + w_neg * loss_neg)
    return loss.sum(axis=-1).mean()


# ---------------------------------------------------------------------------
# Cross-entropy family (old generation)
# ---------------------------------------------------------------------------

def cross_entropy_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """(Optionally weighted / label-smoothed) softmax cross-entropy.

    Matches torch.nn.CrossEntropyLoss semantics exactly, including the
    interaction of class weights with label smoothing (the smoothing term is
    weighted per *class* w_j, the NLL term per *target* w_y, and the mean is
    normalized by Σ_i w_{y_i}).
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    eps = label_smoothing
    if class_weights is None:
        q = one_hot * (1.0 - eps) + eps / num_classes if eps > 0 else one_hot
        return -(q * log_probs).sum(axis=-1).mean()
    w_y = class_weights[targets]
    nll = -(one_hot * log_probs).sum(axis=-1) * w_y
    if eps > 0:
        smooth = -(log_probs * class_weights[None, :]).sum(axis=-1) / num_classes
        per_sample = (1.0 - eps) * nll + eps * smooth
    else:
        per_sample = nll
    return per_sample.sum() / jnp.clip(w_y.sum(), min=1e-12)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-class focal loss: mean over batch of (1-p_t)^γ · CE_t."""
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    log_pt = (one_hot * log_probs).sum(axis=-1)
    pt = jnp.exp(log_pt)
    per_sample = -((1.0 - pt) ** gamma) * log_pt
    if class_weights is not None:
        w = class_weights[targets]
        return (per_sample * w).sum() / jnp.clip(w.sum(), min=1e-12)
    return per_sample.mean()


# ---------------------------------------------------------------------------
# Segmentation losses (old generation joint training)
# ---------------------------------------------------------------------------

def bce_dice_loss(
    seg_logits: jnp.ndarray,
    seg_targets: jnp.ndarray,
    bce_weight: float = 0.5,
    smooth: float = 1.0,
) -> jnp.ndarray:
    """Binary cross-entropy (with logits) + Dice loss on a predicted mask.

    seg_logits / seg_targets: (B, H, W, 1) float; targets in [0, 1].
    """
    seg_logits = seg_logits.astype(jnp.float32)
    seg_targets = seg_targets.astype(jnp.float32)
    # numerically stable BCE-with-logits
    bce = jnp.maximum(seg_logits, 0) - seg_logits * seg_targets + jnp.log1p(
        jnp.exp(-jnp.abs(seg_logits)))
    bce = bce.mean()
    probs = jax.nn.sigmoid(seg_logits)
    axes = tuple(range(1, seg_logits.ndim))
    inter = (probs * seg_targets).sum(axis=axes)
    union = probs.sum(axis=axes) + seg_targets.sum(axis=axes)
    dice = 1.0 - ((2.0 * inter + smooth) / (union + smooth)).mean()
    return bce_weight * bce + (1.0 - bce_weight) * dice


def joint_loss(
    cls_loss_fn: LossFn,
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    seg_logits: Optional[jnp.ndarray] = None,
    seg_targets: Optional[jnp.ndarray] = None,
    seg_weight: float = 0.3,
) -> jnp.ndarray:
    """cls + λ·seg joint objective (reference train_old.py:392-396)."""
    loss = cls_loss_fn(logits, targets)
    if seg_logits is not None and seg_targets is not None and seg_weight > 0:
        loss = loss + seg_weight * bce_dice_loss(seg_logits, seg_targets)
    return loss


# ---------------------------------------------------------------------------
# MixUp criterion
# ---------------------------------------------------------------------------

def mixup_criterion(
    criterion: LossFn,
    logits: jnp.ndarray,
    targets_a: jnp.ndarray,
    targets_b: jnp.ndarray,
    lam: jnp.ndarray,
) -> jnp.ndarray:
    """λ-weighted two-target loss (reference utils.py:163-164)."""
    return lam * criterion(logits, targets_a) + (1.0 - lam) * criterion(logits, targets_b)


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

def build_loss(cfg: Config, class_weights: Optional[jnp.ndarray] = None) -> LossFn:
    """Build the classification loss from config (reference losses.py:74-82 +
    old-gen selectable types)."""
    lc: LossConfig = cfg.loss
    weights = class_weights if lc.class_weights else None
    if lc.type == "asymmetric":
        return partial(
            asymmetric_focal_loss,
            gamma_neg=lc.asymmetric.gamma_neg,
            gamma_pos=lc.asymmetric.gamma_pos,
            clip=lc.asymmetric.clip,
        )
    if lc.type == "focal":
        return partial(focal_loss, gamma=lc.focal_gamma, class_weights=weights)
    if lc.type == "ce":
        return partial(cross_entropy_loss, class_weights=weights,
                       label_smoothing=lc.label_smoothing)
    raise ValueError(f"Unknown loss type: {lc.type}")
