#!/bin/bash
# Round-3 TPU queue #5 — in-kernel qkv-bias-gradient A/B (flash_attention_qkvb).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache

run() {
  tag=$1; shift
  echo "[queue5] $(date -u +%H:%M:%S) start $tag" >> /tmp/q5_status.log
  timeout 3600 "$@" > "/tmp/q5_$tag.log" 2>&1
  echo "[queue5] $(date -u +%H:%M:%S) done  $tag rc=$?" >> /tmp/q5_status.log
}

# 1. ViT-B bs=192 with the default (qkvb) composition + trace
run vitb_qkvb python -u tools/vit_trace.py 192

# 2. A/B: same program with the old packed composition (bias in the
#    projection epilogue, XLA dbias reduce)
run vitb_packed python -u tools/vit_trace.py 192 vit_base_patch16_224 224 packed

# 3. ViT-L@384 with qkvb
run vitl_qkvb python -u tools/vit_trace.py 16 vit_large_patch16_384 384

# 4. bench entries (the driver-facing numbers) if the A/B holds
run vit_bench python -u bench.py
run swin_bench python -u bench.py swinv2
