#!/bin/bash
# Round-3 chip queue 3 (serial; launch only with the working tree FROZEN —
# runs import the live tree). Results -> /tmp/r3_experiments3.log
cd /root/repo
LOG=/tmp/r3_experiments3.log
run() {
  name="$1"; to="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) env: $*" >> "$LOG"
  env "$@" timeout "$to" python bench.py >> "$LOG" 2>&1
  echo "--- [$name] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# Kernel probe FIRST: the dynamic-window refactor + prefill pair gating
# changed the windowed programs (unwindowed are byte-identical); includes
# the new Gemma-shape sections (Hkv=1, hd=256, runtime window).
echo "=== [probe] $(date -u +%H:%M:%S)" >> "$LOG"
timeout 3000 python benchmarks/probe_kernels_tpu.py >> "$LOG" 2>&1
echo "--- [probe] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"

run baseline-recheck 3000
run prefill-dot-bf16 3000 NANOVLLM_PREFILL_DOT_BF16=1
run grp16            3600 NANOVLLM_GRP=16
run 8b-int4-int4kv   3600 BENCH_ARCH=8b BENCH_QUANT=int4 BENCH_KV_DTYPE=int4 BENCH_HBM_UTIL=0.85
run gemma3-1b        3600 BENCH_ARCH=gemma3-1b
run mistral-7b       3600 BENCH_ARCH=mistral-7b BENCH_HBM_UTIL=0.85
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
