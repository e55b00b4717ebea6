#!/bin/sh
# Round-5 patient TPU chain: wait out a relay outage, then run every
# remaining TPU measurement in priority order (VERDICT r4 #1 retries,
# #6, weak #3 re-measure, #4 on the optimized fold DP).
#
# The relay can be down for 40+ minutes (CLAUDE.md); probe_long loops a
# cheap fetch probe for up to ~4 h before giving up, and re-probes
# between jobs so one mid-chain outage only delays the remainder.
#
#   sh scripts/round5_tpu_chain.sh
set -u
cd "$(dirname "$0")/.."

probe_long() {
  i=0
  while [ $i -lt 120 ]; do
    if timeout 120 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((8,8))).sum()" >/dev/null 2>&1; then
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

# 1+2. North-star retries for the two families whose 40-cell sweep
# programs crash the TPU worker: small map-mode chunks (8 cells/program;
# their single-run programs are proven stable, chunk 1 is the floor).
step northstar-dqn timeout 3600 python scripts/bench_northstar.py \
  --families dqn --cell-mode map --chunk 8 >>/tmp/northstar.log 2>>/tmp/northstar.log.err
grep -q '"family": "dqn"' /tmp/northstar.log || \
  step northstar-dqn-c1 timeout 3600 python scripts/bench_northstar.py \
    --families dqn --cell-mode map --chunk 1 >>/tmp/northstar.log 2>>/tmp/northstar.log.err
step northstar-mutative timeout 3600 python scripts/bench_northstar.py \
  --families dynappo_mutative --cell-mode map --chunk 8 \
  >>/tmp/northstar.log 2>>/tmp/northstar.log.err
grep -q '"family": "dynappo_mutative"' /tmp/northstar.log || \
  step northstar-mutative-c1 timeout 3600 python scripts/bench_northstar.py \
    --families dynappo_mutative --cell-mode map --chunk 1 \
    >>/tmp/northstar.log 2>>/tmp/northstar.log.err

# 3. Fused DynaPPO 3MSI with the exact-Levenshtein density opt-in.
step dynappo-edit timeout 3000 python scripts/run_paper_table.py \
  --explorers device-dynappo --density-metric edit --starts 5 \
  >/tmp/dynappo_edit.log 2>&1

# 4. Re-measure the 1,000-cell full robustness sweep (stale 546k row).
step robustness1000 timeout 1800 python scripts/bench_sweep.py \
  --landscapes 200 --ss 5 >/tmp/robustness1000.log 2>&1

# 5. Zuker fold DP throughput on the shifted-layout rewrite.
step bench-fold timeout 2400 python scripts/bench_fold.py \
  >/tmp/bench_fold_v2.log 2>&1

echo "tpu chain done $(date -u +%H:%M:%S)" >&2
