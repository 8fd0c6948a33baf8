#!/bin/bash
# Round-3 TPU experiment queue #2 — post-measurement tuning experiments.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache

run() {  # run <tag> <cmd...>
  tag=$1; shift
  echo "[queue2] $(date -u +%H:%M:%S) start $tag" >> /tmp/q2_status.log
  timeout 3600 "$@" > "/tmp/q2_$tag.log" 2>&1
  echo "[queue2] $(date -u +%H:%M:%S) done  $tag rc=$?" >> /tmp/q2_status.log
}

# 1. ViT-B donation A/B at the headline batch (r2 recorded 1154.6 donate=off;
#    r3 bench printed 1118.7 donate=on — same program otherwise)
run vit_nodonate env FEDVIT_DONATE=0 python -u tools/vit_trace.py 192
run vit_donate   env FEDVIT_DONATE=1 python -u tools/vit_trace.py 192

# 2. ViT-L attention batch-group sweep (auto = g(1,1) today)
run attn_vitl python -u tools/attn_micro.py 16 577 1024 16 qkv

# 3. GELU activation tax at ViT-L and Swin stage-2 MLP shapes
run mlp_vitl python -u tools/mlp_micro.py 16 577 1024 4096 none poly tanh erf
run mlp_swin python -u tools/mlp_micro.py 16 576 768 3072 none poly
