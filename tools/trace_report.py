"""Aggregate TPU op time from a jax.profiler perfetto trace.

Usage: python tools/trace_report.py <.../vm.trace.json.gz> [top_n] [steps]

Groups device op events by XLA's own `hlo_category` arg (the authoritative
classification — umbrella module events like jit_train_step carry no
hlo_category and are excluded, so nothing double-counts), rolls them up
into a step-budget table (matmul/conv, Pallas kernels, elementwise, copy,
other), and prints achieved FLOP/s for the categories XLA models flops
for. `steps` (default 3: what tools/*_trace.py capture) divides totals
into per-step numbers. Stdlib only — no tensorboard/xprof dependency.
"""
import gzip
import json
import re
import sys
from collections import defaultdict

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

opener = gzip.open if path.endswith(".gz") else open
with opener(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]


def norm(name: str) -> str:
    n = name.split("/")[-1] if name.startswith("jit_") else name
    n = re.sub(r"\.\d+", "", n)          # fusion.123 -> fusion
    n = re.sub(r"\d+$", "", n)
    return n


ROLLUP = {  # hlo_category -> budget bucket
    "convolution fusion": "matmul/conv",
    "convolution": "matmul/conv",
    "custom-call": "pallas kernels",
    "custom fusion": "pallas kernels",
    "loop fusion": "elementwise fusion",
    "input fusion": "elementwise fusion",
    "output fusion": "elementwise fusion",
    "non-fusion elementwise": "elementwise fusion",
    "reduce": "elementwise fusion",
    "data formatting": "copy/layout",
    "copy-start": "copy/layout",
    "copy-done": "copy/layout",
    "async-start": "copy/layout",
    "async-done": "copy/layout",
    "slice": "copy/layout",
}

per_cat = defaultdict(float)
per_cat_flops = defaultdict(float)
per_group = defaultdict(float)
n_events = 0
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    a = e.get("args") or {}
    cat = a.get("hlo_category")
    if cat is None:                     # umbrella module event / metadata
        continue
    dur = float(a.get("device_duration_ps", e.get("dur", 0) * 1e6)) / 1e9
    per_cat[cat] += dur
    per_cat_flops[cat] += float(a.get("model_flops", 0) or 0)
    per_group[(cat, norm(e.get("name", "?")))] += dur
    total += dur
    n_events += 1

print(f"device-op wall: {total:.1f} ms total / {total/steps:.1f} ms/step "
      f"({n_events} events, {steps} steps)")
print("\n== step budget (rolled up) ==")
rolled = defaultdict(float)
rolled_fl = defaultdict(float)
for c, ms in per_cat.items():
    b = ROLLUP.get(c, "other")
    rolled[b] += ms
    rolled_fl[b] += per_cat_flops[c]
for b, ms in sorted(rolled.items(), key=lambda kv: -kv[1]):
    fl = rolled_fl[b] / (ms / 1e3) / 1e12 if ms else 0.0
    extra = f"  {fl:6.1f} TFLOP/s" if rolled_fl[b] else ""
    print(f"{ms/steps:9.2f} ms/step  {100*ms/max(total,1e-9):5.1f}%  "
          f"{b}{extra}")

print("\n== hlo categories ==")
for c, ms in sorted(per_cat.items(), key=lambda kv: -kv[1]):
    if ms / steps < 0.005:
        continue
    print(f"{ms/steps:9.2f} ms/step  {100*ms/max(total,1e-9):5.1f}%  {c}")

print(f"\n== top {top_n} op groups ==")
for (c, g), ms in sorted(per_group.items(), key=lambda kv: -kv[1])[:top_n]:
    print(f"{ms/steps:9.2f} ms/step  {100*ms/max(total,1e-9):5.1f}%  "
          f"[{c}] {g}")
