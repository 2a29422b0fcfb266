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
# Priority order: recall + conflict-rate arms are the round-5 verdict gates;
# tamper/fabrication/sparse follow; ivf last (k-means at 10M on one core).
for group in base,graph scaled tamper fabrication sparse ivf; do
  echo "=== ARMS=$group $(date +%H:%M:%S) ===" >> "$LOG"
  DISTRACTOR_N=$N ARMS=$group timeout 14400 python scripts/distractor_eval.py >> "$LOG" 2>&1 \
    || echo "=== ARMS=$group FAILED rc=$? ===" >> "$LOG"
done
echo "=== battery done $(date +%H:%M:%S) ===" >> "$LOG"
