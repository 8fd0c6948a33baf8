"""Optimizer — AdamW with layer-wise LR decay (LLRD) and warmup-cosine.

Parity targets:
  * LLRD group structure: /root/reference/model.py:228-270 —
    patch_embed at lr·d^(n+1), stage/block i at lr·d^(n−i), final norm at
    base lr, head (classifier + metadata branch) at 10× base lr.
    The reference builds torch param groups; here the same structure is a
    per-leaf LR-scale pytree multiplied into the updates (one optax chain,
    no group bookkeeping).
  * ViT embeddings (cls_token / pos_embed) take the patch_embed (lowest)
    scale — the old-gen ViT LLRD semantics (model_old.py:435-505); the
    current-gen reference silently DROPS them from the optimizer for ViT
    backbones (a latent bug we do not reproduce).
  * AdamW + weight_decay: torch.optim.AdamW semantics (decay scaled by the
    group lr), reference train.py:261.
  * grad clip by global norm before the step (train.py:156-157).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from fedvit_tpu.core.config import Config
from fedvit_tpu.train.schedule import make_epoch_schedule


def _backbone_depth(flat_keys) -> int:
    """Number of transformer blocks/stages in the backbone param tree."""
    idx = set()
    for path in flat_keys:
        if len(path) >= 2 and path[0] == "backbone":
            name = path[1]
            if name.startswith(("blocks_", "layers_")):
                idx.add(int(name.split("_")[-1]))
    return (max(idx) + 1) if idx else 0


def llrd_scale_tree(params: Any, decay: float = 0.75,
                    head_mult: float = 10.0) -> Any:
    """Per-leaf LR multiplier pytree implementing the reference LLRD.

    backbone/patch_embed (+ cls_token/pos_embed): d^(n+1)
    backbone/{blocks|layers}_i                  : d^(n−i)
    backbone/norm (+ other backbone norms)      : 1.0
    everything else (head, metadata, fusion, …) : head_mult
    """
    flat = traverse_util.flatten_dict(params)
    n = _backbone_depth(flat.keys())

    def scale_for(path) -> float:
        if path[0] != "backbone":
            return head_mult
        if len(path) == 1:
            return decay ** (n + 1)
        name = path[1]
        if name in ("patch_embed", "patch_norm", "cls_token", "pos_embed",
                    "absolute_pos_embed"):
            # patch_norm is Swin's patch-embed LayerNorm — lives inside
            # backbone.patch_embed in the reference/timm and takes the lowest
            # LLRD scale (reference model.py:249-252)
            return decay ** (n + 1)
        if name.startswith(("blocks_", "layers_")):
            i = int(name.split("_")[-1])
            return decay ** (n - i)
        return 1.0  # final norm & any trailing backbone params: base LR

    scales = {path: jnp.asarray(scale_for(path), jnp.float32)
              for path in flat.keys()}
    return traverse_util.unflatten_dict(scales)


def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply updates leafwise by a static scale pytree."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg: Config,
    params: Any,
    steps_per_epoch: int,
    total_epochs: Optional[int] = None,
    base_lr: Optional[float] = None,
) -> Tuple[optax.GradientTransformation, Any]:
    """Full training transform: clip → adam → weight-decay → LLRD → −lr(t).

    Returns (tx, schedule_fn). One optimizer step == one *effective* batch
    (gradient accumulation happens inside the train step).
    """
    t = cfg.training
    opt = t.optimizer
    lr = base_lr if base_lr is not None else opt.lr
    epochs = total_epochs if total_epochs is not None else t.epochs

    schedule = make_epoch_schedule(
        lr, t.scheduler.warmup_epochs, epochs, t.scheduler.min_lr,
        steps_per_epoch)

    chain = []
    if t.grad_clip and t.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(t.grad_clip))
    chain.append(optax.scale_by_adam(
        b1=opt.b1, b2=opt.b2, eps=opt.eps,
        mu_dtype=jnp.dtype(opt.mu_dtype)))
    if opt.weight_decay:
        chain.append(optax.add_decayed_weights(opt.weight_decay))
    # the reference ALWAYS builds LLRD groups with the head at 10× base LR
    # and only sets decay_rate=1.0 when LLRD is "disabled"
    # (reference train.py:255-262, model.py:264-268) — mirror that here
    decay_rate = t.llrd.decay_rate if t.llrd.enabled else 1.0
    chain.append(scale_by_tree(llrd_scale_tree(
        params, decay_rate, t.llrd.head_lr_mult)))
    chain.append(optax.scale_by_schedule(lambda s: -schedule(s)))

    return optax.chain(*chain), schedule


def head_only_mask(params: Any) -> Any:
    """Boolean pytree: True for non-backbone leaves. Used by the old-gen
    stage-1 frozen-backbone phase (train_old.py:433-498)."""
    flat = traverse_util.flatten_dict(params)
    mask = {p: (p[0] != "backbone") for p in flat}
    return traverse_util.unflatten_dict(mask)


def build_head_optimizer(cfg: Config, params: Any, lr: float
                         ) -> optax.GradientTransformation:
    """Stage-1 optimizer: plain AdamW on head params, backbone frozen."""
    opt = cfg.training.optimizer
    head_mask = head_only_mask(params)
    backbone_mask = jax.tree.map(lambda m: not m, head_mask)
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.training.grad_clip or 1.0),
        optax.scale_by_adam(b1=opt.b1, b2=opt.b2, eps=opt.eps),
        optax.add_decayed_weights(opt.weight_decay),
        optax.scale(-lr),
    )
    return optax.chain(
        optax.masked(optax.set_to_zero(), backbone_mask),  # freeze backbone
        optax.masked(inner, head_mask),
    )
