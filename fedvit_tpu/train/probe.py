"""Auto batch-size probe — TPU port of reference utils.py:325-350.

The reference grows the batch from 8 by +2 up to 64, forwarding synthetic
(bs, 4, 384, 384) + (bs, 13) under autocast and backing off on CUDA OOM.
Here the probe compiles + runs the forward at each size and backs off on
XLA RESOURCE_EXHAUSTED. (On TPU, HBM exhaustion surfaces at compile/alloc
time, so one forward per size is a faithful probe.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fedvit_tpu.core.config import Config


def auto_batch_size(cfg: Config, model=None, variables=None,
                    start: int = 8, step: int = 2, limit: int = 64,
                    log=print) -> int:
    from fedvit_tpu.models import build_model

    if model is None:
        model = build_model(cfg)
    size = cfg.model.image_size
    in_ch = cfg.in_channels
    meta_dim = cfg.model.metadata.input_dim
    rng = jax.random.key(0)
    if variables is None:
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, size, size, in_ch)), jnp.zeros((2, meta_dim)))

    bs = start
    last_ok = max(step, 1)
    while bs <= limit:
        try:
            x = jnp.zeros((bs, size, size, in_ch))
            m = jnp.zeros((bs, meta_dim))
            out = jax.jit(lambda v, a, b: model.apply(v, a, b)["logits"])(
                variables, x, m)
            jax.block_until_ready(out)
            log(f"[AutoBS] batch_size {bs} OK")
            last_ok = bs
            bs += step
        except Exception as e:  # RESOURCE_EXHAUSTED / XlaRuntimeError
            if "RESOURCE_EXHAUSTED" in str(e) or "Resource" in str(e) \
                    or "memory" in str(e).lower():
                break
            raise
    log(f"[AutoBS] Using batch_size = {last_ok}")
    return last_ok
