#!/bin/bash
# 10M-distractor quality battery (round-5 verdict #2): runs each arm group
# in its OWN process so peak RSS stays bounded (~75 GB: 10M chunk objects
# ~30 GB + one f32 index + transients) and a crash loses one group, not the
# battery. Results merge into eval_results/distractor_eval_10000000.json.
# CPU-only — safe to run alongside TPU work.
set -u
cd "$(dirname "$0")/.."
N=${DISTRACTOR_N:-10000000}
LOG=${LOG:-/tmp/de10m.log}
for group in base,graph tamper fabrication scaled sparse ivf; do
  echo "=== ARMS=$group $(date +%H:%M:%S) ===" >> "$LOG"
  DISTRACTOR_N=$N ARMS=$group timeout 14400 python scripts/distractor_eval.py >> "$LOG" 2>&1 \
    || echo "=== ARMS=$group FAILED rc=$? ===" >> "$LOG"
done
echo "=== battery done $(date +%H:%M:%S) ===" >> "$LOG"
