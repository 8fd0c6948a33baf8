#!/bin/bash
# Round-3 TPU queue #4 — full-model runs with the tanh bf16 GELU.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache

run() {
  tag=$1; shift
  echo "[queue4] $(date -u +%H:%M:%S) start $tag" >> /tmp/q4_status.log
  timeout 3600 "$@" > "/tmp/q4_$tag.log" 2>&1
  echo "[queue4] $(date -u +%H:%M:%S) done  $tag rc=$?" >> /tmp/q4_status.log
}

if [ -f /tmp/q3.pid ]; then
  while kill -0 "$(cat /tmp/q3.pid)" 2>/dev/null; do sleep 20; done
fi

run vitl_tanh python -u tools/vit_trace.py 16 vit_large_patch16_384 384
run swin_tanh python -u tools/swin_trace.py 16
run vitb_tanh python -u tools/vit_trace.py 192
run vit_bench python -u bench.py
run swin_bench python -u bench.py swinv2
