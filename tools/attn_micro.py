"""Micro-bench: flash-attention kernel batch-group sweep on real shapes.

    python tools/attn_micro.py [B N E H] [qkv|flat]

Sweeps FEDVIT_ATTN_G (forced fwd/bwd batch-group) and times fwd-only and
fwd+bwd steady state. Defaults: ViT-L/16@384 shapes (16, 577, 1024, 16),
packed-qkv path. ViT-B/16@224: 192 197 768 12.
"""
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

args = sys.argv[1:]
if len(args) >= 4:
    B, N, E, H = map(int, args[:4])
    impl = args[4] if len(args) > 4 else "qkv"
else:
    B, N, E, H = 16, 577, 1024, 16
    impl = args[0] if args else "qkv"

r = np.random.default_rng(0)
if impl == "qkv":
    x = jnp.asarray(r.normal(size=(B, N, 3 * E)), jnp.bfloat16)

    def run(xx):
        from fedvit_tpu.ops.flash_attention import flash_attention_qkv
        return flash_attention_qkv(xx, H)
else:
    x = jnp.asarray(r.normal(size=(B, N, E)), jnp.bfloat16)

    def run(xx):
        from fedvit_tpu.ops.flash_attention import flash_attention_flat
        return flash_attention_flat(xx, xx, xx, H)


def bench(fn, *a):
    def loop(z):
        acc = z
        for _ in range(20):
            # scalar chaining: fwd output (B,N,E) differs from the packed
            # qkv input (B,N,3E), so chain through a 0-scaled reduction
            s = jnp.sum(fn(acc, *a).astype(jnp.float32)).astype(z.dtype)
            acc = acc + 0.0 * s
        return acc
    lj = jax.jit(loop)
    o = lj(x); _ = float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    o = lj(x); _ = float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / 20 * 1000


def fwd(z):
    return run(z)


def fwdbwd(z):
    return jax.grad(lambda zz: jnp.sum(run(zz).astype(jnp.float32) ** 2))(z)


groups = [g for g in (0, 1, 2, 4, 8) if g == 0 or B % g == 0]
for fg, bg in itertools.product(groups, groups):
    if (fg, bg) != (0, 0) and (fg == 0 or bg == 0):
        continue   # sweep auto once, then fully-forced combos
    os.environ["FEDVIT_ATTN_G"] = f"{fg},{bg}"
    jax.clear_caches()
    try:
        t_f = bench(fwd)
        t_fb = bench(fwdbwd)
        print(f"g=({fg or 'auto'},{bg or 'auto'}): fwd {t_f:7.3f} ms  "
              f"fwd+bwd {t_fb:7.3f} ms", flush=True)
    except Exception as e:
        print(f"g=({fg},{bg}): FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
os.environ.pop("FEDVIT_ATTN_G", None)
