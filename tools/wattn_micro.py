"""Micro-bench: SwinV2 windowed-attention kernel vs its analytic cap.

    python tools/wattn_micro.py [stage0|stage1|stage2|stage3|all] [variants...]

Times flash_attention_bias_flat forward AND backward at SwinV2-L@384 bs=16
stage shapes and reports % of the analytic d=32 MXU cap: every dot in these
kernels contracts (QKᵀ, dq, dk, ds) or emits (PV, dv) a 32-wide head dim,
so the MXU ceiling is 32/128 = 25% of peak (v5e: 49.25 TFLOP/s bf16).

Variant knobs (env, read at kernel trace time):
  FEDVIT_WATTN_SOFTMAX = max | postdiv   (round-3 experiment; max default)
  FEDVIT_WATTN_HB      = <int>           (head-block override)
Pass variants as extra argv tokens like `hb=8` `softmax=postdiv` to sweep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

STAGES = {   # (windows, batch, N, C, H) at 384², window 24 (12 at stage 3)
    "stage0": (16, 16, 576, 192, 6),
    "stage1": (4, 16, 576, 384, 12),
    "stage2": (1, 16, 576, 768, 24),
    "stage3": (1, 16, 144, 1536, 48),
    "tiny": (2, 2, 64, 64, 2),      # CPU smoke (interpret mode)
}

V5E_PEAK = 197e12
CAP = 0.25 * V5E_PEAK               # d=32 of 128 contraction/output lanes


def run_stage(stage, tag=""):
    w0, b, n, c, h = STAGES[stage]
    r = np.random.default_rng(0)
    d = c // h

    def cosine_rows(scale):
        x = r.normal(size=(w0 * b, n, h, d))
        x = x / np.linalg.norm(x, axis=-1, keepdims=True) * scale
        return jnp.asarray(x.reshape(w0 * b, n, c), jnp.bfloat16)

    q = cosine_rows(10.0)
    k = cosine_rows(1.0)
    v = jnp.asarray(r.normal(size=(w0 * b, n, c)), jnp.bfloat16)
    bias = jnp.asarray(r.uniform(size=(h, n, n)) * 16, jnp.float32)
    mask = jnp.zeros((w0, n, n), jnp.float32)

    import fedvit_tpu.ops.flash_attention as fa
    jax.clear_caches()

    # analytic dot FLOPs: fwd QKᵀ+PV = 2 dots; bwd recompute QKᵀ + dv, dp,
    # dq, dk = 5 dots; each dot = 2·rows·H·N²·d MACs → 2 flops/MAC
    dot = 2 * (w0 * b) * h * n * n * d * 2
    fwd_flops, bwd_flops = 2 * dot, 5 * dot

    def timeit(fn, *args, iters=20):
        lj = jax.jit(fn)
        o = lj(*args)
        _ = jax.tree.map(lambda x: x.block_until_ready(), o)
        t0 = time.perf_counter()
        o = lj(*args)
        _ = jax.tree.map(lambda x: x.block_until_ready(), o)
        return (time.perf_counter() - t0) / iters * 1000

    def fwd_loop(qq):
        acc = qq
        for _ in range(20):
            acc = acc + 0.0 * fa.flash_attention_bias_flat(acc, k, v, bias,
                                                           mask, h)
        return acc

    def full_loop(qq, bb):
        def one(args):
            qx, bx = args
            o = fa.flash_attention_bias_flat(qx, k, v, bx, mask, h)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        acc_q, acc_b = qq, bb
        for _ in range(20):
            gq, gb = jax.grad(one)((acc_q, acc_b))
            acc_q = acc_q + 0.0 * gq
            acc_b = acc_b + 0.0 * gb
        return acc_q, acc_b

    t_fwd = timeit(fwd_loop, q)
    t_full = timeit(full_loop, q, bias)
    t_bwd = t_full - t_fwd
    cap_fwd = fwd_flops / CAP * 1e3
    cap_bwd = bwd_flops / CAP * 1e3
    print(f"{stage}{tag}: fwd {t_fwd:7.3f} ms ({cap_fwd / t_fwd * 100:5.1f}%"
          f" of cap {cap_fwd:.2f})  bwd {t_bwd:7.3f} ms "
          f"({cap_bwd / t_bwd * 100:5.1f}% of cap {cap_bwd:.2f})",
          flush=True)
    return t_fwd, t_bwd


_ENVKEYS = ("FEDVIT_WATTN_HB", "FEDVIT_WATTN_SOFTMAX", "FEDVIT_WATTN_GF",
            "FEDVIT_WATTN_GB", "FEDVIT_WATTN_STATS", "FEDVIT_WATTN_VMEM",
            "FEDVIT_WATTN_DELTA")

AB_VARIANTS = [          # measured back-to-back in ONE process per stage —
    ("base(stats=1)", {}),          # cross-process runs drift ±30%
    ("delta=1", {"FEDVIT_WATTN_DELTA": "1"}),
    ("stats=0", {"FEDVIT_WATTN_STATS": "0"}),
    ("hb=8 vmem=100", {"FEDVIT_WATTN_HB": "8",
                       "FEDVIT_WATTN_VMEM": "100"}),
    # round-5 stage2-focused candidates (h=24 admits hb 12/24; b=16 admits
    # gb 8/16 under a raised scoped window)
    ("hb=12 vmem=100", {"FEDVIT_WATTN_HB": "12",
                        "FEDVIT_WATTN_VMEM": "110"}),
    ("hb=24 vmem=110", {"FEDVIT_WATTN_HB": "24",
                        "FEDVIT_WATTN_VMEM": "110"}),
    ("gb=8 vmem=100", {"FEDVIT_WATTN_GB": "8",
                       "FEDVIT_WATTN_VMEM": "100"}),
    ("softmax=postdiv", {"FEDVIT_WATTN_SOFTMAX": "postdiv"}),
    ("softmax=dotsum", {"FEDVIT_WATTN_SOFTMAX": "dotsum"}),
    ("softmax=dotsum delta=1", {"FEDVIT_WATTN_SOFTMAX": "dotsum",
                                "FEDVIT_WATTN_DELTA": "1"}),
    ("delta=1 gb=8 vmem=100", {"FEDVIT_WATTN_DELTA": "1",
                               "FEDVIT_WATTN_GB": "8",
                               "FEDVIT_WATTN_VMEM": "100"}),
    ("gf=8 gb=8 vmem=100", {"FEDVIT_WATTN_GF": "8", "FEDVIT_WATTN_GB": "8",
                            "FEDVIT_WATTN_VMEM": "100"}),
    ("base(repeat)", {}),           # drift sentinel
]


def run_ab(stages, only=None, interleave=1):
    # exact tag match: substring matching made `only=stats` select both
    # "base(stats=1)" and "stats=0", which defeats the point of an A/B
    variants = ([v for v in AB_VARIANTS if v[0] in only]
                if only else AB_VARIANTS)
    if only and not variants:
        tags = ", ".join(repr(v[0]) for v in AB_VARIANTS)
        print(f"only={only!r} matched no variant; known tags: {tags}",
              flush=True)
        return
    # interleave=N repeats the whole variant list N times (ABAB… rather
    # than AABB…), so slow wall-clock drift cancels out of the comparison
    variants = variants * interleave
    for stage in stages:
        for tag, env in variants:
            for k in _ENVKEYS:
                os.environ.pop(k, None)
            os.environ.update(env)
            try:
                run_stage(stage, f" [{tag}]")
            except Exception as e:
                print(f"{stage} [{tag}]: FAILED — {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:150]}", flush=True)
        for k in _ENVKEYS:
            os.environ.pop(k, None)


def main():
    # sitecustomize imports jax before env vars apply — honor JAX_PLATFORMS
    # here so `JAX_PLATFORMS=cpu python tools/wattn_micro.py tiny` works
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    args = sys.argv[1:]
    if args and args[0] == "ab":
        rest = [a for a in args[1:] if a in STAGES]
        only = [a.split("=", 1)[1].split(",")
                for a in args[1:] if a.startswith("only=")]
        inter = [int(a.split("=", 1)[1])
                 for a in args[1:] if a.startswith("interleave=")]
        return run_ab(rest or [s for s in STAGES if s != "tiny"],
                      only=only[0] if only else None,
                      interleave=inter[0] if inter else 1)
    stages = [a for a in args if a in STAGES or a == "all"]
    knobs = [a for a in args if "=" in a]
    which = (list(s for s in STAGES if s != "tiny")
             if (not stages or stages[0] == "all") else stages)
    for kv in knobs:
        key, val = kv.split("=", 1)
        env = {"hb": "FEDVIT_WATTN_HB", "softmax": "FEDVIT_WATTN_SOFTMAX",
               "gf": "FEDVIT_WATTN_GF", "gb": "FEDVIT_WATTN_GB",
               "stats": "FEDVIT_WATTN_STATS",
               "vmem": "FEDVIT_WATTN_VMEM",
               "delta": "FEDVIT_WATTN_DELTA"}[key]
        os.environ[env] = val
    tag = (" [" + " ".join(knobs) + "]") if knobs else ""
    tot_f = tot_b = 0.0
    for s in which:
        try:
            f, b = run_stage(s, tag)
        except Exception as e:   # e.g. scoped-VMEM OOM for a knob combo
            print(f"{s}{tag}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:150]}", flush=True)
            continue
        # per-step totals: depth × blocks at SwinV2-L (2, 2, 18, 2)
        depth = {"stage0": 2, "stage1": 2, "stage2": 18, "stage3": 2}.get(s, 1)
        tot_f += f * depth
        tot_b += b * depth
    if len(which) > 1:
        print(f"TOTAL (depth-weighted): fwd {tot_f:.1f} ms + bwd {tot_b:.1f} "
              f"ms = {tot_f + tot_b:.1f} ms/step attention", flush=True)


if __name__ == "__main__":
    main()
