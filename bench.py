"""Benchmark: the standard FLEXS paper config on the default (TPU) backend.

Runs TF-Bind-8 SIX6_REF_R1 + Adalead + NoisyAbstractModel(ss=0.9),
rounds=10, sequences_batch_size=100, model_queries_per_batch=2000 — the
reference paper's headline configuration (BASELINE.md) — and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": "seqs/sec", "vs_baseline": N}

`vs_baseline` compares against the *measured* wall-clock of the actual
reference implementation on this machine (BASELINE_MEASURED.json, produced
by scripts/measure_reference_baseline.py — the reference publishes no
timing numbers of its own).

A full warmup run happens first so compile time (which is amortized away in
any real sweep) is excluded; the measured run reuses every compiled shape.
"""
import json
import os
import time


def run_once(seed: int):
    import flexs_tpu as flexs

    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=0.9, seed=seed
    )
    explorer = flexs.baselines.explorers.Adalead(
        model,
        rounds=10,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        starting_sequence=problem["starts"][0],
        alphabet=flexs.DNAA,
        seed=seed,
    )
    t0 = time.time()
    df, _ = explorer.run(landscape, verbose=False)
    wall = time.time() - t0
    return wall, int(model.cost + landscape.cost), float(df["true_score"].max())


def main():
    # Warmup: compile every shape the run will touch (incl. cache-growth
    # buckets); the measured run then reflects steady-state throughput.
    run_once(seed=0)

    wall, seqs_scored, top = run_once(seed=1)
    seqs_per_sec = seqs_scored / wall

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs_baseline = seqs_per_sec / baseline["seqs_per_sec"]

    print(
        json.dumps(
            {
                "metric": "adalead_nam_tfbind8_10r_seqs_per_sec",
                "value": round(seqs_per_sec, 1),
                "unit": "seqs/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "wall_clock_s": round(wall, 3),
                "top_fitness": round(top, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
