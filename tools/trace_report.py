"""Aggregate TPU op time from a jax.profiler perfetto trace.

Usage: python tools/trace_report.py /tmp/swin_xprof/plugins/profile/<run>/vm.trace.json.gz [top_n]

Groups trace events on the TPU op track by a normalized op name (fusion
indices stripped) and prints total/self time per group plus a coarse
category rollup (matmul / pallas / conv / elementwise-fusion / copy / other).
Stdlib only — no tensorboard/xprof dependency on this host.
"""
import gzip
import json
import re
import sys
from collections import defaultdict

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

opener = gzip.open if path.endswith(".gz") else open
with opener(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]

# Map (pid, tid) -> thread/process names from metadata events.
pid_name = {}
tid_name = {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

# TPU op events live on threads named like "XLA Ops" / "TensorFlow Ops" /
# "Steps" under a TPU device process; host threads carry python/runtime noise.
op_tids = set()
for (pid, tid), name in tid_name.items():
    pname = pid_name.get(pid, "")
    if "TPU" in pname or "/device:" in pname or "Axon" in pname:
        if "Ops" in name or "XLA" in name:
            op_tids.add((pid, tid))
if not op_tids:  # fall back: any thread whose name mentions XLA ops
    op_tids = {k for k, v in tid_name.items() if "Ops" in v}

def norm(name: str) -> str:
    n = name.split("/")[-1] if name.startswith("jit_") else name
    n = re.sub(r"\.\d+", "", n)          # fusion.123 -> fusion
    n = re.sub(r"\d+$", "", n)
    return n

def category(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "pallas" in n:
        return "pallas/custom-call"
    if "convolution" in n or "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "copy/layout"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n:
        return "slice/concat/pad"
    if "fusion" in n or "loop" in n or "input" in n or "output" in n:
        return "fusion(elementwise)"
    return "other"

per_name = defaultdict(float)
per_name_count = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X" or (e["pid"], e.get("tid")) not in op_tids:
        continue
    dur = e.get("dur", 0) / 1e3  # us -> ms
    name = e.get("name", "?")
    per_name[name] += dur
    per_name_count[name] += 1
    total += dur

groups = defaultdict(float)
for name, ms in per_name.items():
    groups[norm(name)] += ms

cats = defaultdict(float)
for name, ms in per_name.items():
    cats[category(name)] += ms

print(f"device-op wall on op tracks: {total:.1f} ms total "
      f"({len(per_name)} distinct ops, {sum(per_name_count.values())} events)")
print("\n== categories ==")
for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
    print(f"{ms:10.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {c}")
print(f"\n== top {top_n} op groups ==")
for g, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:top_n]:
    print(f"{ms:10.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {g}")
