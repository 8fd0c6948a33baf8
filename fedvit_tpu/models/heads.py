"""Classification heads.

* ClassifierHead — current gen (reference model.py:139-145):
  Linear(in → hidden) → GELU → Dropout(0.5) → Linear(hidden → classes),
  trunc-normal(0.02) weights, zero bias (model.py:168-173).
* Old-gen variant adds LayerNorm after GELU (model_old.py:215-221) via
  `layer_norm=True`.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fedvit_tpu.ops.activations import gelu

from fedvit_tpu.models.layers import trunc_normal_init


class ClassifierHead(nn.Module):
    num_classes: int = 8
    hidden_dim: int = 512
    dropout: float = 0.5
    layer_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros, name="fc1")(x)
        x = gelu(x)
        if self.layer_norm:
            x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     kernel_init=trunc_normal_init,
                     bias_init=nn.initializers.zeros, name="fc2")(x)
        return x.astype(jnp.float32)
