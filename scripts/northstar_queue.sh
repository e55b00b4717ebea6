#!/bin/sh
# Round-5 north-star queue: one bench_northstar process per family.
#
# Relay-stall isolation (VERDICT r4 next #1): a TPU-worker restart or
# outage kills at most one family's process; this queue probes the relay
# before each family, retries a failed family once with the lax.map cell
# schedule (the known workaround for vmapped-sweep worker crashes), and
# appends everything to one log that scripts/aggregate_northstar.py folds
# into the BASELINE.md table + NORTHSTAR_r05.json artifact.
#
#   sh scripts/northstar_queue.sh /tmp/northstar.log
set -u
LOG="${1:-/tmp/northstar.log}"
cd "$(dirname "$0")/.."

# dqn + dynappo_mutative vmapped sweeps crash the relay's TPU worker
# (observed at chunks 40 AND 10 while their single-run programs and
# CPU-mesh sweeps are fine) -> start those directly in map mode.
MAP_FAMILIES="dqn dynappo_mutative"

probe() {
  # CLAUDE.md relay-outage gotcha: cheap fetch probe, ~4 tries over ~6 min.
  for i in 1 2 3 4; do
    if timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; np.asarray(jnp.ones((8,8))).sum()" >/dev/null 2>&1; then
      return 0
    fi
    echo "probe $i failed; sleeping 90s" >&2
    sleep 90
  done
  return 1
}

have_summary() {
  # bench_northstar prints the family line then a summary line; the family
  # line is what the aggregator needs.
  grep -q "\"family\": \"$1\"" "$LOG" 2>/dev/null
}

run_family() {
  fam="$1"; mode="$2"
  echo "=== $fam (cell-mode $mode) $(date -u +%H:%M:%S) ===" >&2
  timeout 3000 python scripts/bench_northstar.py \
    --families "$fam" --cell-mode "$mode" >>"$LOG" 2>>"$LOG.err"
}

for fam in random adalead ga cmaes bo gpr_bo cbas dbas ppo dynappo dqn dynappo_mutative; do
  # Resume support: a family already recorded in $LOG (e.g. by a queue run
  # that was interrupted mid-list) is skipped, so relaunching with the same
  # log continues where the previous run stopped.
  if have_summary "$fam"; then
    echo "skip $fam (already in $LOG)" >&2
    continue
  fi
  case " $MAP_FAMILIES " in
    *" $fam "*) mode=map ;;
    *) mode=auto ;;
  esac
  probe || { echo "relay down; aborting queue at $fam" >&2; exit 1; }
  run_family "$fam" "$mode"
  if ! have_summary "$fam"; then
    echo "retrying $fam with cell-mode map" >&2
    probe || exit 1
    run_family "$fam" map
  fi
  have_summary "$fam" || echo "FAMILY FAILED TWICE: $fam" >&2
done
echo "queue done $(date -u +%H:%M:%S)" >&2
