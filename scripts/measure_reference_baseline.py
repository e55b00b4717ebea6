"""Measure the reference FLEXS implementation's wall-clock on this machine.

The reference publishes no wall-clock numbers (BASELINE.md), so the speedup
denominator for bench.py has to be measured: this script runs the actual
reference code (mounted read-only at /root/reference) on the standard paper
config — TF-Bind-8 SIX6_REF_R1, Adalead + NoisyAbstractModel(ss=0.9),
rounds=10, batch=100, 2000 model queries/round — and records sequences
scored per second into BASELINE_MEASURED.json.

The reference package's top-level __init__ imports TensorFlow/TF-Agents/cma
(absent here), so only the modules this config needs are loaded, through a
partial package namespace.  `editdistance` (a C extension, also absent) is
shimmed with a Hamming fast path + pure-Python Levenshtein fallback; the
shim is *favorable* to the reference (the real C extension is slower than
the O(L) Hamming path for the fixed-length sequences this config produces),
so the recorded baseline is, if anything, an overestimate of reference
speed.

No reference code is copied anywhere; it is executed in place.
"""
import importlib.util
import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BASELINE_MEASURED.json")


def _make_editdistance_shim():
    mod = types.ModuleType("editdistance")

    def eval_(a, b):  # noqa: A001 - matches editdistance.eval API
        if len(a) == len(b):
            # Hamming == Levenshtein upper bound; for the fixed-length,
            # substitution-only sequences of this config they coincide.
            return sum(x != y for x, y in zip(a, b))
        # Pure-Python Wagner-Fischer for the general case.
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(cur[-1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    mod.eval = eval_
    return mod


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    """Build a partial `flexs` namespace with only the modules we need."""
    sys.modules["editdistance"] = _make_editdistance_shim()

    # The reference targets pandas < 2 (DataFrame.append); restore it.
    import pandas as pd

    if not hasattr(pd.DataFrame, "append"):
        def _append(self, other, ignore_index=False):
            other_df = other if isinstance(other, pd.DataFrame) else pd.DataFrame(other)
            return pd.concat([self, other_df], ignore_index=ignore_index)

        pd.DataFrame.append = _append

    flexs_pkg = types.ModuleType("flexs")
    flexs_pkg.__path__ = [os.path.join(REFERENCE, "flexs")]
    sys.modules["flexs"] = flexs_pkg

    base = os.path.join(REFERENCE, "flexs")
    flexs_pkg.types = _load("flexs.types", f"{base}/types.py")
    landscape = _load("flexs.landscape", f"{base}/landscape.py")
    flexs_pkg.Landscape = landscape.Landscape
    model = _load("flexs.model", f"{base}/model.py")
    flexs_pkg.Model = model.Model
    flexs_pkg.LandscapeAsModel = model.LandscapeAsModel
    explorer = _load("flexs.explorer", f"{base}/explorer.py")
    flexs_pkg.Explorer = explorer.Explorer

    utils_pkg = types.ModuleType("flexs.utils")
    utils_pkg.__path__ = [f"{base}/utils"]
    sys.modules["flexs.utils"] = utils_pkg
    utils_pkg.sequence_utils = _load(
        "flexs.utils.sequence_utils", f"{base}/utils/sequence_utils.py"
    )

    tf_binding = _load("flexs.landscapes.tf_binding", f"{base}/landscapes/tf_binding.py")
    nam = _load(
        "flexs.baselines.models.noisy_abstract_model",
        f"{base}/baselines/models/noisy_abstract_model.py",
    )
    adalead = _load(
        "flexs.baselines.explorers.adalead", f"{base}/baselines/explorers/adalead.py"
    )
    return tf_binding, nam, adalead


def main():
    rounds = int(os.environ.get("BASELINE_ROUNDS", "10"))
    tf_binding, nam, adalead = load_reference_modules()

    problem = tf_binding.registry()["SIX6_REF_R1"]
    landscape = tf_binding.TFBinding(**problem["params"])
    model = nam.NoisyAbstractModel(landscape, signal_strength=0.9)
    explorer = adalead.Adalead(
        model,
        rounds=rounds,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        starting_sequence=problem["starts"][0],
        alphabet="TGCA",
    )

    t0 = time.time()
    df, _ = explorer.run(landscape, verbose=True)
    wall = time.time() - t0

    seqs_scored = int(model.cost + landscape.cost)
    result = {
        "config": (
            "TF-Bind-8 SIX6_REF_R1 + Adalead + NoisyAbstractModel ss=0.9, "
            f"rounds={rounds}, batch=100, queries/batch=2000"
        ),
        "implementation": "reference samsinai/FLEXS @ /root/reference",
        "hardware": "this machine, single CPU core (reference is CPU-only)",
        "wall_clock_s": wall,
        "seqs_scored": seqs_scored,
        "seqs_per_sec": seqs_scored / wall,
        "rounds": rounds,
        "top_fitness": float(df["true_score"].max()),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
