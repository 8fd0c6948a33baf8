"""Time + trace the device-side train augmentation program in isolation.

    python tools/aug_trace.py [batch_size] [image_size]

The full pipeline runs augment as its own jitted program ahead of the train
step (train/loop.py aug_step); at ViT-B bs=128 it costs ~31% on top of the
step (bench.py pipeline: 1232 img/s step-only vs 891 augment+step). This
tool times the augment program alone and captures a 3-dispatch profiler
trace to /tmp/aug_xprof for tools/trace_report.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from fedvit_tpu.core.config import from_dict
from fedvit_tpu.data.pipeline import canvas_size, make_device_augment

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 192
size = int(sys.argv[2]) if len(sys.argv) > 2 else 224

cfg = from_dict({
    "model": {"backbone": "vit_base_patch16_224", "image_size": size,
              "compute_dtype": "bfloat16", "metadata": {"enabled": True}},
    "data": {"use_segmentation_mask": True},
    "training": {"batch_size": bs},
    "augmentation": {"mixup": {"enabled": True, "alpha": 0.4},
                     "cutmix": {"enabled": True, "alpha": 1.0, "prob": 0.7}},
})
canvas = canvas_size(size)
augment = make_device_augment(cfg, train=True)


@jax.jit
def aug_step(batch, base_key, i):
    return augment(batch, jax.random.fold_in(base_key, i))


r = np.random.default_rng(0)
batch = {"image": jnp.asarray(r.integers(0, 256, (bs, canvas, canvas, 4)),
                              jnp.uint8),
         "label": jnp.asarray(r.integers(0, 8, (bs,)), jnp.int32),
         "metadata": jnp.asarray(r.uniform(size=(bs, 13)), jnp.float32)}
key = jax.device_put(jax.random.key(7))

out = aug_step(batch, key, np.int32(0))
jax.block_until_ready(out)
N = 30
t0 = time.perf_counter()
for i in range(N):
    out = aug_step(batch, key, np.int32(i))
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / N
print(f"augment: {dt*1e3:.2f} ms/batch at bs={bs} "
      f"({dt/bs*1e3:.3f} ms/img, {bs/dt:.0f} img/s)", flush=True)

with jax.profiler.trace("/tmp/aug_xprof"):
    for i in range(3):
        out = aug_step(batch, key, np.int32(i))
    jax.block_until_ready(out)
print("trace captured -> /tmp/aug_xprof", flush=True)
