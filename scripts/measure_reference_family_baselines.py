"""Measure per-FAMILY reference wall-clock on the north-star config.

`BASELINE_MEASURED.json` (scripts/measure_reference_baseline.py) records the
reference's throughput for ONE family — Adalead — and `bench_northstar.py`
divides every family's device throughput by that single denominator.  That
is unfair in both directions: the reference's GeneticAlgorithm is far slower
per sequence than its Adalead (per-child `editdistance` novelty scans over
the whole measured+generated set, reference
`baselines/explorers/genetic_algorithm.py:128-155`), and its DQN slower
still (per-step torch Q-training, `baselines/explorers/dqn.py:204-231`).

This script runs the ACTUAL reference explorers in place (same partial-
namespace loader as measure_reference_baseline.py; nothing is copied) on
the same north-star cell config — TF-Bind-8 SIX6_REF_R1 +
NoisyAbstractModel(ss=0.9), rounds=10, batch=100, 2000 model queries/round —
and records per-family seqs/s into BASELINE_FAMILY_MEASURED.json, which
`scripts/aggregate_northstar.py` uses to report a family-fair multiple next
to the Adalead-denominator one.

Only the families whose reference dependencies exist in this environment are
measurable: `ga` (torch multinomial), `dqn` (torch Q-network), and
`cbas`/`dbas` (keras VAE — TensorFlow turns out to import fine here).  PPO
and DynaPPO need TF-Agents and CMAES needs `cma` — those are genuinely
absent, so those families keep the Adalead denominator (documented in the
aggregator output).

Timing base: wall-clock AND `time.process_time()` are both recorded;
`seqs_per_sec` uses process-time when it is smaller, because round-5
measurements run while other CPU jobs hold the single core — process-time
is what wall-clock would be on an idle host (the reference path is
single-core), and a smaller reference time is the CONSERVATIVE choice for
the rebuild's reported multiple.

    python scripts/measure_reference_family_baselines.py --families ga dqn
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from measure_reference_baseline import REFERENCE, _load, load_reference_modules

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BASELINE_FAMILY_MEASURED.json",
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--families", nargs="+", default=["ga", "dqn"],
                    choices=["ga", "dqn", "random", "cbas", "dbas"])
    ap.add_argument("--rounds", type=int, default=10)
    args = ap.parse_args()

    # Builds the partial `flexs` namespace + editdistance/pandas shims.
    tf_binding, nam, _ = load_reference_modules()
    base = os.path.join(REFERENCE, "flexs")

    problem = tf_binding.registry()["SIX6_REF_R1"]
    landscape_cls = tf_binding.TFBinding
    start = problem["starts"][0]

    def make(family):
        landscape = landscape_cls(**problem["params"])
        model = nam.NoisyAbstractModel(landscape, signal_strength=0.9)
        common = dict(
            rounds=args.rounds,
            sequences_batch_size=100,
            model_queries_per_batch=2000,
            starting_sequence=start,
            alphabet="TGCA",
        )
        if family == "ga":
            mod = _load(
                "flexs.baselines.explorers.genetic_algorithm",
                f"{base}/baselines/explorers/genetic_algorithm.py",
            )
            # Same hyperparameters the sweep engine defaults to
            # (flexs_tpu/parallel/sweep.py): Wright-Fisher, pop 100,
            # children 0.2, beta 0.05.
            return landscape, model, mod.GeneticAlgorithm(
                model,
                population_size=100,
                parent_selection_strategy="wright-fisher",
                children_proportion=0.2,
                beta=0.05,
                seed=0,
                **common,
            )
        if family == "dqn":
            mod = _load(
                "flexs.baselines.explorers.dqn",
                f"{base}/baselines/explorers/dqn.py",
            )
            return landscape, model, mod.DQN(model, device="cpu", **common)
        if family in ("cbas", "dbas"):
            # The reference's VAE builds `keras.layers.Input(shape=(dim))`
            # — an int, not a tuple (reference utils/VAE_utils.py:41,66).
            # The keras versions the reference targeted coerced that; the
            # one baked in here raises.  Shim Input to restore the old
            # coercion — a compatibility fix, not a behavior change.
            from tensorflow import keras

            _orig_input = keras.layers.Input

            def _input_compat(shape=None, **kw):
                if isinstance(shape, int):
                    shape = (shape,)
                return _orig_input(shape=shape, **kw)

            keras.layers.Input = _input_compat

            # Same class of fix: the reference passes the pre-2.3 `lr=`
            # alias to Adam (utils/VAE_utils.py), renamed to
            # `learning_rate=` in the keras shipped here.
            _orig_adam = keras.optimizers.Adam

            class _AdamCompat(_orig_adam):
                def __init__(self, *a, lr=None, **kw):
                    if lr is not None:
                        kw["learning_rate"] = lr
                    super().__init__(*a, **kw)

            keras.optimizers.Adam = _AdamCompat
            _load("flexs.utils.VAE_utils", f"{base}/utils/VAE_utils.py")
            mod = _load(
                "flexs.baselines.explorers.cbas_dbas",
                f"{base}/baselines/explorers/cbas_dbas.py",
            )
            # The paper fleet's exact VAE config
            # (reference paper_code/cloud/runner.py:26-37).
            g = mod.VAE(
                seq_length=len(start),
                alphabet="TGCA",
                batch_size=100,
                latent_dim=2,
                intermediate_dim=250,
                epochs=10,
                epsilon_std=1.0,
                beta=1,
                validation_split=0,
                verbose=False,
            )
            return landscape, model, mod.CbAS(
                model, generator=g, algo=family, **common
            )
        mod = _load(
            "flexs.baselines.explorers.random",
            f"{base}/baselines/explorers/random.py",
        )
        return landscape, model, mod.Random(model, seed=0, **common)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    for family in args.families:
        landscape, model, explorer = make(family)
        t0 = time.time()
        c0 = time.process_time()
        df, _ = explorer.run(landscape, verbose=True)
        wall = time.time() - t0
        cpu = time.process_time() - c0
        # Conservative denominator under host contention: process-time is
        # the idle-host wall-clock equivalent for this single-core path,
        # and crediting the reference the SMALLER time shrinks the
        # rebuild's reported multiple (see module docstring).
        base_t = min(wall, cpu)
        seqs = int(model.cost + landscape.cost)
        results[family] = {
            "config": (
                "TF-Bind-8 SIX6_REF_R1 + NoisyAbstractModel ss=0.9, "
                f"rounds={args.rounds}, batch=100, queries/batch=2000"
            ),
            "implementation": "reference samsinai/FLEXS @ /root/reference",
            "hardware": "this machine, single CPU core (reference is CPU-only)",
            "wall_clock_s": wall,
            "process_time_s": cpu,
            "seqs_scored": seqs,
            "seqs_per_sec": seqs / base_t,
            "top_fitness": float(df["true_score"].max()),
        }
        print(json.dumps({family: results[family]}, indent=2), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
