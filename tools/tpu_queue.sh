#!/bin/bash
# TPU measurement queue: run a sequence of independent measurement commands
# under nohup, each bounded by a timeout, each logging to its own file, with
# a status journal. Later stages run even if an earlier one fails.
#
# Usage:
#   tools/tpu_queue.sh <queue-file> [logdir]
#   nohup tools/tpu_queue.sh my_queue.txt /tmp/q &
#
# The queue file has one stage per line:  <tag> <command...>
# Blank lines and lines starting with # are skipped. Example:
#   swin_trace python -u tools/swin_trace.py 16
#   vit_bench  python -u bench.py
#   vitl       python -u bench.py vitl
set -u
cd "$(dirname "$0")/.."

QUEUE_FILE=${1:?usage: tpu_queue.sh <queue-file> [logdir]}
LOGDIR=${2:-/tmp/tpu_queue}
mkdir -p "$LOGDIR"

# persistent compilation cache: cross-process re-runs of the same program
# (trace tool -> bench) skip the multi-minute Mosaic/XLA compile
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

STATUS="$LOGDIR/status.log"
while read -r tag rest; do
  case "$tag" in ''|'#'*) continue;; esac
  echo "[queue] $(date -u +%H:%M:%S) start $tag" >> "$STATUS"
  timeout "${STAGE_TIMEOUT:-3600}" bash -c "$rest" \
    > "$LOGDIR/$tag.log" 2>&1
  echo "[queue] $(date -u +%H:%M:%S) done  $tag rc=$?" >> "$STATUS"
done < "$QUEUE_FILE"
echo "[queue] $(date -u +%H:%M:%S) ALL DONE" >> "$STATUS"
