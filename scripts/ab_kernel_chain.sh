#!/usr/bin/env bash
# Round-5 kernel-chain chip A/Bs: the fused-stage block-size sweep
# (nr=16 halo amortization) and the L3/L4 chain extensions, each as an
# isolated process (compile caches make re-runs cheap).  Usage:
#   scripts/ab_kernel_chain.sh [logfile]
# Writes one RESULT line per arm; compare against the shipped default
# (int8) printed first.  ~4 min/arm warm cache, ~8 min cold.
set -u
LOG=${1:-/tmp/ab_kernel_chain.log}
cd "$(dirname "$0")/.."
for v in int8 int8-l1nr16 int8-l2nr16 int8-nr16 int8-l3 int8-l34 \
         int8-pin int8-pin-l34-nr16; do
  echo "=== variant $v $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 900 python perf_probe.py --variant "$v" --top-ops 0 2>>"$LOG" \
    | tee -a "$LOG"
done
echo "=== done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
