#!/bin/bash
# Round-3 chip experiment queue 2 (serial). Results -> /tmp/r3_experiments2.log
cd /root/repo
LOG=/tmp/r3_experiments2.log
run() {
  name="$1"; to="$2"; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) env: $*" >> "$LOG"
  env "$@" timeout "$to" python bench.py >> "$LOG" 2>&1
  echo "--- [$name] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

# GRP=16: halves per-pair scalar overhead, doubles dot M (32 rows).
run grp16-int8kv 3600 NANOVLLM_GRP=16
# 8B int4 weights: r2 measured 858 tok/s with int8 KV. int4 KV doubles the
# resident batch (capacity-bound config) at the cost of the unpack.
run 8b-int4-int8kv 3600 BENCH_ARCH=8b BENCH_QUANT=int4 BENCH_HBM_UTIL=0.85
run 8b-int4-int4kv 3600 BENCH_ARCH=8b BENCH_QUANT=int4 BENCH_KV_DTYPE=int4 BENCH_HBM_UTIL=0.85
# MoE bench (r2 queue item).
run moe-mini 3600 BENCH_ARCH=moe-mini
# Profiles: where the remaining decode/prefill time goes at bench shapes.
echo "=== [profile-decode] $(date -u +%H:%M:%S)" >> "$LOG"
timeout 1800 python benchmarks/profile_decode_step.py >> "$LOG" 2>&1
echo "--- [profile-decode] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
echo "=== [profile-prefill] $(date -u +%H:%M:%S)" >> "$LOG"
timeout 1800 python benchmarks/profile_prefill_step.py >> "$LOG" 2>&1
echo "--- [profile-prefill] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
