#!/bin/sh
# Remaining round-5 TPU steps with a degraded-relay-tolerant probe: the
# 05:30 window showed the relay UP but taking ~3 min for a trivial fetch,
# so the probe timeout is 300 s (vs chain v1's 120 s, which kept failing).
set -u
cd "$(dirname "$0")/.."

probe_long() {
  i=0
  while [ $i -lt 100 ]; do
    if timeout 300 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((8,8))).sum()" >/dev/null 2>&1; then
      return 0
    fi
    i=$((i + 1))
    echo "probe $i failed $(date -u +%H:%M:%S); sleeping 120s" >&2
    sleep 120
  done
  return 1
}

step() {
  name="$1"; shift
  echo "=== $name $(date -u +%H:%M:%S) ===" >&2
  probe_long || { echo "relay still down; skipping $name" >&2; return 1; }
  "$@"
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >&2
}

step dynappo-edit timeout 3600 python scripts/run_paper_table.py \
  --explorers device-dynappo --density-metric edit --starts 5 \
  >/tmp/dynappo_edit.log 2>&1

step robustness1000 timeout 2400 python scripts/bench_sweep.py \
  --landscapes 200 --ss 5 >/tmp/robustness1000.log 2>&1

step bench-fold timeout 3000 python scripts/bench_fold.py \
  >/tmp/bench_fold_v2.log 2>&1

echo "tpu chain2 done $(date -u +%H:%M:%S)" >&2
