"""Micro-bench: transformer Mlp fwd+bwd — activation cost and MXU efficiency.

    python tools/mlp_micro.py [B N D H] [acts...]

acts: none relu tanh erf poly (poly = ops.activations.gelu on bf16 — the
degree-7 Φ polynomial the models use in bfloat16 compute).
Defaults: SwinV2-L stage-2 shapes (16, 576, 768, 3072), all acts.
ViT-L/16@384: 16 577 1024 4096.
"""
import time, sys
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

args = sys.argv[1:]
if len(args) >= 4 and args[0].isdigit():
    B, N, D, H = map(int, args[:4])
    acts = args[4:] or ["none", "relu", "tanh", "erf", "poly"]
else:
    B, N, D, H = 16, 576, 768, 3072
    acts = args or ["none", "relu", "tanh", "erf", "poly"]

r = np.random.default_rng(0)
x = jnp.asarray(r.normal(size=(B, N, D)), jnp.bfloat16)
w1 = jnp.asarray(r.normal(size=(D, H)) * 0.02, jnp.float32)
b1 = jnp.zeros((H,), jnp.float32)
w2 = jnp.asarray(r.normal(size=(H, D)) * 0.02, jnp.float32)
b2 = jnp.zeros((D,), jnp.float32)

def make(act):
    def f(w1, b1, w2, b2, x):
        h = (x @ w1.astype(jnp.bfloat16) + b1.astype(jnp.bfloat16))
        if act == "erf":
            h = jax.nn.gelu(h, approximate=False)
        elif act == "tanh":
            h = jax.nn.gelu(h, approximate=True)
        elif act == "relu":
            h = jax.nn.relu(h)
        elif act == "poly":
            from fedvit_tpu.ops.activations import _gelu_poly
            h = _gelu_poly(h).astype(jnp.bfloat16)
        elif act == "fedvit":
            from fedvit_tpu.ops.activations import gelu
            h = gelu(h)
        o = h.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16) + b2.astype(jnp.bfloat16)
        return (o.astype(jnp.float32) ** 2).mean()
    g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))
    return g

for act in acts:
    g = make(act)
    outs = g(w1, b1, w2, b2, x)
    jax.block_until_ready(outs)
    # chain N iterations with data dependence via w1
    def loop(w1):
        acc = w1
        for _ in range(20):
            d = g(acc, b1, w2, b2, x)
            acc = acc + 0.0 * d[0]
        return acc
    lj = jax.jit(loop)
    a = lj(w1); _ = float(jnp.sum(a))
    t0 = time.perf_counter()
    a = lj(w1); _ = float(jnp.sum(a))
    dt = (time.perf_counter() - t0) / 20
    # ideal: fwd 2 dots + bwd 4 dots = 6 * B*N*D*H*2 flops
    fl = 6 * B * N * D * H * 2
    print(f"{act:5s}: {dt*1000:7.3f} ms/iter  ({fl/dt/1e12:.1f} TFLOP/s eff {100*fl/dt/197e12:.0f}%)")
