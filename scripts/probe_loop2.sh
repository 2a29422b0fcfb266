#!/bin/bash
# Round-2 tunnel-tolerant probe loop.
# Canary-gated: a tiny remote compile must succeed (<90s) before burning a
# long timeout on a real experiment. One experiment per process; appends to
# scripts/probe_results.log; logs tunnel health to scripts/tunnel_health.log.
cd "$(dirname "$0")/.."
EXPS="${PROBE_EXPS:-bf16_bn2048_q64 bf16_bn4096_q64 bf16_bn8192_q64 int8_bn2048_q64 int8_bn4096_q64 bf16_bn2048_q1024 int8_bn2048_q1024}"
DEADLINE=$(( $(date +%s) + ${PROBE_BUDGET_S:-10800} ))

canary() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
assert float(x) > 0
EOF
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  remaining=""
  for exp in $EXPS; do
    grep -q "^$exp " scripts/probe_results.log 2>/dev/null || remaining="$remaining $exp"
  done
  if [ -z "$remaining" ]; then echo "ALL_DONE $(date -Is)" >> scripts/tunnel_health.log; exit 0; fi
  if canary; then
    echo "healthy $(date -Is)" >> scripts/tunnel_health.log
    for exp in $remaining; do
      timeout 1500 python scripts/kernel_probe.py "$exp" >>scripts/tunnel_health.log 2>&1 \
        || { echo "probe_failed $exp $(date -Is)" >> scripts/tunnel_health.log; break; }
    done
  else
    echo "degraded $(date -Is)" >> scripts/tunnel_health.log
    sleep 240
  fi
done
echo "BUDGET_EXHAUSTED $(date -Is)" >> scripts/tunnel_health.log
