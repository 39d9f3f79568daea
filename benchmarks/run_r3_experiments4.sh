#!/bin/bash
# Round-3 chip queue 4 (serial; tree FROZEN during the run).
# Results -> /tmp/r3_experiments4.log
cd /root/repo
LOG=/tmp/r3_experiments4.log
run() {
  name="$1"; to="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) env: $*" >> "$LOG"
  env "$@" timeout "$to" python bench.py >> "$LOG" 2>&1
  echo "--- [$name] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# Probe first: gmm_int4 is a NEW kernel; the bf16-prefill-dot default also
# changed every prefill program's dots.
echo "=== [probe] $(date -u +%H:%M:%S)" >> "$LOG"
timeout 3000 python benchmarks/probe_kernels_tpu.py >> "$LOG" 2>&1
echo "--- [probe] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

run moe-mini-int4    3600 BENCH_ARCH=moe-mini BENCH_QUANT=int4
run moe-mini-int8    3600 BENCH_ARCH=moe-mini BENCH_QUANT=int8
run headline         3000
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
