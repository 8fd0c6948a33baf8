"""TrainState — the complete training state as one pytree.

Replaces the reference's scattered mutable objects (model, optimizer,
scheduler, GradScaler, EMA; train.py:245-276) with a single immutable
struct that jit / shard_map / checkpointing all operate on. No GradScaler
is needed: TPU bf16 has fp32 range, so "AMP" is just bfloat16 compute.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct

from fedvit_tpu.train.ema import ema_init


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any]          # None disables EMA
    rng: jax.Array
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx, rng,
               ema_enabled: bool = True) -> "TrainState":
        import jax.numpy as jnp
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=ema_init(params) if ema_enabled else None,
            rng=rng,
            apply_fn=apply_fn,
            tx=tx,
        )

    def eval_params(self) -> Any:
        """Parameters to evaluate with — EMA shadow if enabled (the
        reference's apply_shadow/validate/restore dance, train.py:289-295)."""
        return self.ema_params if self.ema_params is not None else self.params
