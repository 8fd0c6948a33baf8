"""Exponential moving average of parameters — as a pytree in the train state.

Parity target: the reference's EMA class (/root/reference/utils.py:50-105)
keeps a shadow dict and mutates model weights in place for validation
(`apply_shadow`/`restore`). In JAX the shadow is just another immutable
pytree carried in the train state; "apply_shadow" is simply evaluating with
`state.ema_params` — no backup/restore dance needed.

Math parity: s ← d·s + (1−d)·p after every optimizer step (utils.py:81).
"""

from __future__ import annotations

from typing import Any

import jax


def ema_init(params: Any) -> Any:
    """Clone params as the initial shadow (reference utils.py:71-74).

    A REAL copy, not an aliased tree: with buffer donation on the train
    step (step.default_donate), params and shadow sharing buffers would
    donate the same buffer twice and abort the first step."""
    return jax.tree.map(lambda p: p.copy() if hasattr(p, "copy") else p,
                        params)


def ema_update(shadow: Any, params: Any, decay: float) -> Any:
    """s = d·s + (1−d)·p, leafwise (reference utils.py:77-83)."""
    return jax.tree.map(lambda s, p: s * decay + p * (1.0 - decay), shadow, params)
