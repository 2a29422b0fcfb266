#!/bin/bash
# Tunnel-tolerant kernel-perf probe loop: one experiment per process, long
# timeout, retries; appends to scripts/probe_results.log.
cd "$(dirname "$0")/.."
for exp in int8_bn2048_q1024 bf16_bn4096_q64 int8_bn4096_q64 bf16_bn2048_q1024; do
  if grep -q "^$exp " scripts/probe_results.log 2>/dev/null; then continue; fi
  for attempt in 1 2 3; do
    timeout 900 python scripts/kernel_probe.py "$exp" >/dev/null 2>&1 && break
    sleep 60
  done
done
echo ALL_DONE >> scripts/probe_results.log
