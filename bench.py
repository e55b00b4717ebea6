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

The first run compiles (the persistent compilation cache under .jax_cache/
makes that a once-per-machine cost); the measured runs reuse every
compiled shape, which is the steady-state any sweep amortizes to.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


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


def main():
    run_once(seed=0)  # compile warmup

    walls, tops, seqs = [], [], 0
    for i in range(3):
        wall, seqs_scored, top = run_once(seed=i + 1)
        walls.append(wall)
        tops.append(top)
        seqs = seqs_scored
    wall = sorted(walls)[1]  # median of 3
    seqs_per_sec = seqs / wall

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
                "wall_clock_s": round(wall, 4),
                "top_fitness": round(max(tops), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
