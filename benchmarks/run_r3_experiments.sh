#!/bin/bash
# Round-3 queued chip experiments (serial — ONE process may hold the TPU).
# Each run gets a generous timeout; results append to /tmp/r3_experiments.log.
# Order: cheapest-signal first; defaults only flip on measured numbers.
cd /root/repo
LOG=/tmp/r3_experiments.log
run() {
  name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) env: $*" >> "$LOG"
  env "$@" timeout 3000 python bench.py >> "$LOG" 2>&1
  echo "--- [$name] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

run baseline-int8kv
run int4kv              BENCH_KV_DTYPE=int4
run int4kv-dotbf16      BENCH_KV_DTYPE=int4 NANOVLLM_DOT_BF16=1
run int8kv-dotbf16      NANOVLLM_DOT_BF16=1
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
