"""LR schedule — linear warmup + cosine decay with per-EPOCH stepping.

Exact parity with the reference scheduler (/root/reference/utils.py:171-185):
the reference steps the scheduler once per epoch (train.py:297), so the LR is
piecewise-constant within an epoch:

    epoch e < warmup : lr = base · e / max(1, warmup)          (epoch 0 → 0)
    else             : p  = (e - warmup) / max(1, total - warmup)
                       lr = min_lr + (base - min_lr) · ½(1 + cos(π·p))

We express it as a function of the *optimizer step* with a static
steps_per_epoch so it can live inside a jitted update (epoch = step // spe).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def warmup_cosine_lr(epoch, base_lr: float, warmup_epochs: int,
                     total_epochs: int, min_lr: float = 1e-6):
    """LR at integer `epoch` (traced or concrete)."""
    epoch = jnp.asarray(epoch, dtype=jnp.float32)
    warm = base_lr * epoch / max(1, warmup_epochs)
    progress = (epoch - warmup_epochs) / max(1, total_epochs - warmup_epochs)
    cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    decay = min_lr + (base_lr - min_lr) * cos
    return jnp.where(epoch < warmup_epochs, warm, decay)


def make_epoch_schedule(base_lr: float, warmup_epochs: int, total_epochs: int,
                        min_lr: float, steps_per_epoch: int):
    """optax-style schedule: step -> lr, with per-epoch granularity."""
    spe = max(1, int(steps_per_epoch))

    def schedule(step):
        epoch = jnp.asarray(step, dtype=jnp.int32) // spe
        return warmup_cosine_lr(epoch, base_lr, warmup_epochs, total_epochs, min_lr)

    return schedule


def lr_curve(base_lr: float, warmup_epochs: int, total_epochs: int,
             min_lr: float) -> np.ndarray:
    """Host-side per-epoch LR curve, for logging/tests."""
    return np.array([
        float(warmup_cosine_lr(e, base_lr, warmup_epochs, total_epochs, min_lr))
        for e in range(total_epochs)
    ])
