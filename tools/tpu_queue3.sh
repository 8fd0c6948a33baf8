#!/bin/bash
# Round-3 TPU experiment queue #3.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache

run() {
  tag=$1; shift
  echo "[queue3] $(date -u +%H:%M:%S) start $tag" >> /tmp/q3_status.log
  timeout 3600 "$@" > "/tmp/q3_$tag.log" 2>&1
  echo "[queue3] $(date -u +%H:%M:%S) done  $tag rc=$?" >> /tmp/q3_status.log
}

# wait for queue2 (pid file) to drain
if [ -f /tmp/q2.pid ]; then
  while kill -0 "$(cat /tmp/q2.pid)" 2>/dev/null; do sleep 20; done
fi

# 1. ViT-L attention batch-group sweep (fixed chaining)
run attn_vitl python -u tools/attn_micro.py 16 577 1024 16 qkv

# 2. windowed softmax postdiv variant, stage0 + stage2 shapes
run wattn_s0 python -u tools/wattn_micro.py stage0
run wattn_s2 python -u tools/wattn_micro.py stage2

# 3. ViT-B MLP shapes: is the bf16 poly GELU a regression vs erf there?
run mlp_vitb python -u tools/mlp_micro.py 192 197 768 3072 none poly erf
