"""Jitted train / eval steps.

The reference's hot loop (train.py:95-168) does per-batch host work: H2D
copies, host-RNG MixUp, `loss.item()` syncs, a GradScaler, and an EMA sweep
in Python. Here one `train_step` is a single compiled program:

  * gradient accumulation = `lax.scan` over (accum, micro, ...) — parity with
    reference accumulation boundaries (train.py:155-162)
  * MixUp/CutMix drawn from the state's PRNG per micro-batch, fused into the
    step (utils.py:150-160 semantics)
  * global-norm clip + AdamW/LLRD update + EMA, all inside the same program
  * no GradScaler: bf16 on TPU has fp32 exponent range (AMP ≡ compute dtype)

Batch layout: {"image": (B, H, W, C), "label": (B,), "metadata": (B, 13)?}
with B = accum_steps · micro_batch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from fedvit_tpu.core.config import Config
from fedvit_tpu.train.ema import ema_update
from fedvit_tpu.train.losses import (LossFn, bce_dice_loss,
                                     mixup_criterion)
from fedvit_tpu.train.mixup import mixup, mixup_cutmix
from fedvit_tpu.train.state import TrainState


def default_donate() -> bool:
    """Whether the train step should donate its input state by default.

    Donation aliases the old state's buffers into the new state, halving
    peak param/opt-state HBM — ON by default. The experimental axon
    tunnel used to reject donated multi-step execution (and poison the
    process afterwards), but it registers as backend "tpu" and donation
    now runs clean through it (round-3 bench: full 4-candidate donated
    sweep, bs=256 newly fits). The "axon" backend-name guard stays as
    belt-and-braces for a build that does register under that name;
    FEDVIT_DONATE=1/0 overrides in either direction (kill switch)."""
    import os

    env = os.environ.get("FEDVIT_DONATE")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "axon"


def make_train_step(cfg: Config, loss_fn: LossFn,
                    donate: Optional[bool] = None,
                    augment: Optional[Callable] = None) -> Callable:
    """Build the jitted train step for a config.

    donate=None resolves via `default_donate()` (donate everywhere except
    the axon tunnel backend). Callers that retain and reuse an OLD state
    object after stepping must pass donate=False explicitly.

    augment: optional (batch, rng) → batch device-augmentation fn (from
    data.pipeline.make_device_augment) FUSED into the step: the batch then
    arrives as the raw uint8 canvas and the augment key derives from
    state.rng in-program. One dispatch per step instead of two, and no
    host-side fold_in — measured on the axon tunnel, a host-materialized
    per-step key costs ~120 ms of serialized dispatch at bs=192."""
    if donate is None:
        donate = default_donate()
    t = cfg.training
    aug = cfg.augmentation
    accum = max(1, t.gradient_accumulation_steps)
    ema_decay = t.ema.decay
    ema_enabled = t.ema.enabled
    use_meta = cfg.model.metadata.enabled

    mixup_on = aug.mixup.enabled and aug.mixup.alpha > 0
    cutmix_on = aug.cutmix.enabled and aug.cutmix.prob > 0
    mix_mode = (
        "both" if (mixup_on and cutmix_on) else
        "mixup" if mixup_on else
        "cutmix" if cutmix_on else "none")

    # old-gen JointLoss (reference train_old.py:392-396): the mask rides the
    # 4th canvas channel through the paired augmentation as a TARGET (the
    # model consumes only the RGB channels — models/isic.py mask_as_target);
    # the augment normalizes the mask channel to (x−.5)/.5, inverted here
    # so BCE-Dice sees [0, 1] targets. Mix (mixup/cutmix) blends the target
    # channel with the same λ as the image — the seg objective stays
    # consistent with the mixed input.
    seg_w = (float(cfg.loss.seg_weight)
             if cfg.model.segmentation.enabled
             and cfg.data.use_segmentation_mask else 0.0)

    def _apply_mix(rng, images, labels):
        if mix_mode == "both":
            return mixup_cutmix(rng, images, labels, aug.mixup.alpha,
                                aug.cutmix.alpha, aug.cutmix.prob)
        if mix_mode == "mixup":
            return mixup(rng, images, labels, aug.mixup.alpha)
        if mix_mode == "cutmix":
            return mixup_cutmix(rng, images, labels, 0.0, aug.cutmix.alpha,
                                aug.cutmix.prob)
        return images, labels, labels, jnp.float32(1.0)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if augment is not None:
            new_rng, aug_rng = jax.random.split(state.rng)
            batch = augment(batch, aug_rng)
            state = state.replace(rng=new_rng)
        images = batch["image"]
        labels = batch["label"]
        metadata = batch.get("metadata") if use_meta else None
        has_meta = metadata is not None
        b = images.shape[0]
        micro = b // accum
        assert micro * accum == b, (
            f"batch {b} not divisible by accumulation steps {accum}")

        def micro_loss(params, batch_stats, mb_images, mb_labels, mb_meta, rng):
            rng_mix, rng_drop = jax.random.split(rng)
            mb_images, la, lb, lam = _apply_mix(rng_mix, mb_images, mb_labels)
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                mb_images, mb_meta if has_meta else None,
                deterministic=False, rngs={"dropout": rng_drop},
                mutable=["batch_stats"])
            logits = out["logits"]
            if mix_mode == "none":
                loss = loss_fn(logits, mb_labels)
            else:
                loss = mixup_criterion(loss_fn, logits, la, lb, lam)
            if seg_w > 0.0:
                seg_target = mb_images[..., 3:4] * 0.5 + 0.5
                loss = loss + seg_w * bce_dice_loss(out["seg_mask"],
                                                    seg_target)
            return loss, mutated.get("batch_stats", batch_stats)

        new_rng, step_rng = jax.random.split(state.rng)
        micro_rngs = jax.random.split(step_rng, accum)

        imgs_r = images.reshape((accum, micro) + images.shape[1:])
        labels_r = labels.reshape((accum, micro))
        meta_r = (metadata.reshape((accum, micro) + metadata.shape[1:])
                  if has_meta else jnp.zeros((accum, micro, 0), images.dtype))

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        if accum == 1:
            # fast path: no accumulation buffer — saves two full-gradient
            # HBM passes (zero-init + add) and the 1/accum scale pass
            (loss, new_bstats), grads = grad_fn(
                state.params, state.batch_stats, imgs_r[0], labels_r[0],
                meta_r[0], micro_rngs[0])
        else:
            def scan_body(carry, xs):
                grads_acc, loss_acc, bstats = carry
                mb_imgs, mb_labels, mb_meta, mb_rng = xs
                (loss, new_bstats), grads = grad_fn(
                    state.params, bstats, mb_imgs, mb_labels, mb_meta, mb_rng)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, new_bstats), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss_sum, new_bstats), _ = jax.lax.scan(
                scan_body,
                (zero_grads, jnp.float32(0.0), state.batch_stats),
                (imgs_r, labels_r, meta_r, micro_rngs))

            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss_sum * inv

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if ema_enabled and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, ema_decay)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            rng=new_rng,
        )
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, cfg: Config,
                   loss_fn: Optional[LossFn] = None,
                   augment: Optional[Callable] = None) -> Callable:
    """Jitted eval step: (params, batch_stats, batch) → (logits, loss).

    The caller chooses params (EMA shadow for validation — the reference's
    apply_shadow dance, train.py:289-295). Pass `loss_fn=None` for
    logits-only inference (e.g. TTA). With `augment` (the deterministic
    eval transform from make_device_augment), the batch arrives as the raw
    uint8 canvas and resize/crop/normalize fuse into the same program."""
    use_meta = cfg.model.metadata.enabled

    @jax.jit
    def eval_step(params, batch_stats, batch):
        if augment is not None:
            batch = augment(batch, jax.random.key(0))   # deterministic
        metadata = batch.get("metadata") if use_meta else None
        out = apply_fn({"params": params, "batch_stats": batch_stats},
                       batch["image"], metadata, deterministic=True)
        logits = out["logits"]
        loss = (jnp.float32(0.0) if loss_fn is None
                else loss_fn(logits, batch["label"]))
        return logits, loss

    return eval_step
