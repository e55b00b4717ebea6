#!/bin/sh
# Round-5 TPU follow-ups (VERDICT r4 next #4, #6, and weak #3's stale row).
#
# Waits for the north-star queue process (which holds the single-holder TPU)
# to exit, then runs the three remaining TPU measurements sequentially, each
# behind a relay probe:
#   1. Zuker fold DP throughput (L=50, L=100)         -> /tmp/bench_fold.log
#   2. fused DynaPPO 3MSI with density_metric="edit"  -> /tmp/dynappo_edit.log
#   3. 1000-cell full robustness sweep re-measure      -> /tmp/robustness1000.log
#
#   sh scripts/round5_followups.sh <queue_pid>
set -u
QPID="${1:-}"
cd "$(dirname "$0")/.."

if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi

probe() {
  for i in 1 2 3 4; do
    if timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((8,8))).sum()" >/dev/null 2>&1; then
      return 0
    fi
    echo "probe $i failed; sleeping 90s" >&2
    sleep 90
  done
  return 1
}

probe && timeout 1800 python scripts/bench_fold.py \
  >/tmp/bench_fold.log 2>&1
probe && timeout 3000 python scripts/run_paper_table.py \
  --explorers device-dynappo --density-metric edit --starts 5 \
  >/tmp/dynappo_edit.log 2>&1
probe && timeout 1800 python scripts/bench_sweep.py --landscapes 200 --ss 5 \
  >/tmp/robustness1000.log 2>&1
echo "followups done $(date -u +%H:%M:%S)"
