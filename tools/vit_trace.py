"""Capture a TPU trace of a ViT train step (default ViT-B/16@224 bs=192)."""
import time, sys
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from fedvit_tpu.core.config import from_dict
from fedvit_tpu.models import build_model
from fedvit_tpu.train.losses import build_loss
from fedvit_tpu.train.optim import build_optimizer
from fedvit_tpu.train.state import TrainState
from fedvit_tpu.train.step import make_train_step

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 192
backbone = sys.argv[2] if len(sys.argv) > 2 else "vit_base_patch16_224"
size = int(sys.argv[3]) if len(sys.argv) > 3 else 224
impl = sys.argv[4] if len(sys.argv) > 4 else "auto"
cfg = from_dict({
    "model": {"backbone": backbone, "image_size": size,
              "compute_dtype": "bfloat16", "attention_impl": impl,
              "drop_path_rate": 0.1, "metadata": {"enabled": True}},
    "data": {"use_segmentation_mask": True},
    "training": {"batch_size": bs, "gradient_accumulation_steps": 1,
                 "optimizer": {"lr": 1e-4, "mu_dtype": "bfloat16"},
                 "llrd": {"enabled": True, "decay_rate": 0.75},
                 "ema": {"enabled": True, "decay": 0.9995},
                 "grad_clip": 1.0},
    "augmentation": {"mixup": {"enabled": True, "alpha": 0.4},
                     "cutmix": {"enabled": True, "alpha": 1.0, "prob": 0.7}},
    "loss": {"type": "asymmetric"},
})
model = build_model(cfg)
rng = jax.random.key(0)
variables = model.init({"params": rng, "dropout": rng},
                       jnp.zeros((2, size, size, 4)), jnp.zeros((2, 13)))
loss_fn = build_loss(cfg)
tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=100)
state = TrainState.create(model.apply, variables["params"],
                          variables["batch_stats"], tx, jax.random.key(1))
step = make_train_step(cfg, loss_fn)
r = np.random.default_rng(0)
batch = {"image": jnp.asarray(r.uniform(size=(bs, size, size, 4)), jnp.float32),
         "label": jnp.asarray(r.integers(0, 8, size=(bs,)), jnp.int32),
         "metadata": jnp.asarray(r.uniform(size=(bs, 13)), jnp.float32)}
state, m = step(state, batch); print("warm1", float(m["loss"]))
state, m = step(state, batch); print("warm2", float(m["loss"]))

t0 = time.perf_counter()
N = 10
for _ in range(N):
    state, m = step(state, batch)
_ = float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"steady: {dt*1000:.1f} ms/step, {bs/dt:.1f} img/s")

with jax.profiler.trace("/tmp/vit_xprof"):
    for _ in range(3):
        state, m = step(state, batch)
    _ = float(m["loss"])
print("trace captured")
