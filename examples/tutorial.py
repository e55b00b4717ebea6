"""flexs_tpu tutorial — the reference's Tutorial.ipynb as a runnable script.

Walks the same path as the reference tutorial (examples/Tutorial.ipynb):
1. pick a benchmark landscape from a registry,
2. wrap it in surrogate models of varying quality,
3. run explorers against it,
4. evaluate robustness to surrogate noise,
and adds the TPU-native extras: the fused single-dispatch runner and a
mesh-sharded sweep.

Run:  python examples/tutorial.py          (any backend)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flexs_tpu as flexs  # noqa: E402

# ---------------------------------------------------------------------------
# 1. Landscapes come from per-module registries of benchmark problems.
# ---------------------------------------------------------------------------
problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
landscape = flexs.landscapes.TFBinding(**problem["params"])
start = problem["starts"][0]
print(f"TF-Bind-8 SIX6_REF_R1; start {start} scores "
      f"{landscape.get_fitness([start])[0]:.4f}")

# ---------------------------------------------------------------------------
# 2. Models: a tunable-noise wrapper around the truth, or trainable nets.
# ---------------------------------------------------------------------------
noisy = flexs.baselines.models.NoisyAbstractModel(
    landscape, signal_strength=0.9, seed=0
)
cnn = flexs.baselines.models.CNN(
    seq_len=8, num_filters=16, hidden_size=32, alphabet=flexs.DNAA, epochs=5
)
ensemble = flexs.Ensemble([cnn])

# ---------------------------------------------------------------------------
# 3. Explorers drive the propose -> measure -> retrain loop.
# ---------------------------------------------------------------------------
explorer = flexs.baselines.explorers.Adalead(
    noisy,
    rounds=5,
    sequences_batch_size=50,
    model_queries_per_batch=500,
    starting_sequence=start,
    alphabet=flexs.DNAA,
    seed=0,
)
df, metadata = explorer.run(landscape, verbose=False)
print(f"Adalead+NAM: top fitness {df['true_score'].max():.4f} "
      f"after {df['round'].max()} rounds "
      f"({landscape.cost} landscape queries)")

# Any other explorer plugs into the same loop:
cmaes = flexs.baselines.explorers.CMAES(
    flexs.baselines.models.NoisyAbstractModel(landscape, 0.9, seed=1),
    rounds=3,
    sequences_batch_size=20,
    model_queries_per_batch=200,
    starting_sequence=start,
    alphabet=flexs.DNAA,
    seed=0,
)
df_cma, _ = cmaes.run(landscape, verbose=False)
print(f"CMAES: top fitness {df_cma['true_score'].max():.4f}")

# ---------------------------------------------------------------------------
# 4. Evaluators: standardized sweeps over surrogate quality / budgets.
# ---------------------------------------------------------------------------
results = flexs.evaluate.robustness(
    flexs.landscapes.TFBinding(**problem["params"]),
    make_explorer=lambda model, ss: flexs.baselines.explorers.Random(
        model,
        rounds=2,
        sequences_batch_size=20,
        model_queries_per_batch=100,
        starting_sequence=start,
        alphabet=flexs.DNAA,
        seed=0,
    ),
    signal_strengths=[0.5, 1.0],
    verbose=False,
)
for ss, (res_df, _) in results:
    print(f"robustness ss={ss}: top {res_df['true_score'].max():.4f}")

# ---------------------------------------------------------------------------
# 5. TPU-native extras: the fused runner and the sharded sweep.
# ---------------------------------------------------------------------------
from flexs_tpu.runtime import DeviceAdaleadNAM  # noqa: E402

fused = DeviceAdaleadNAM(
    flexs.landscapes.TFBinding(**problem["params"]),
    flexs.DNAA,
    rounds=5,
    sequences_batch_size=50,
    model_queries_per_batch=500,
    starting_sequence=start,
    signal_strength=0.9,
    seed=0,
)
df_fused, _ = fused.run(verbose=False)
print(f"fused device runner: top {df_fused['true_score'].max():.4f} "
      "(entire experiment = one device program)")

# The fused runners also carry TRAINED surrogates in-program: a Flax CNN
# (or ensemble) retrained on the measured set every round — the reference
# paper's empirical-model experiment class, as one device dispatch.
from flexs_tpu.runtime.surrogate import SurrogateSpec  # noqa: E402

fused_cnn = DeviceAdaleadNAM(
    flexs.landscapes.TFBinding(**problem["params"]),
    flexs.DNAA,
    rounds=3,
    sequences_batch_size=20,
    model_queries_per_batch=100,
    starting_sequence=start,
    model="surrogate",  # in-program trained CNN instead of NAM
    surrogate_spec=SurrogateSpec(num_filters=16, hidden_size=32, epochs=5),
    seed=0,
)
df_cnn, _ = fused_cnn.run(verbose=False)
print(f"fused CNN-surrogate runner: top {df_cnn['true_score'].max():.4f}")

import jax  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from flexs_tpu.parallel import run_robustness_sweep  # noqa: E402

mesh = Mesh(np.array(jax.devices()), ("cells",)) if len(jax.devices()) > 1 else None
sweep = run_robustness_sweep(
    landscape_names=["SIX6_REF_R1"],
    starts=flexs.landscapes.tf_binding.STARTS[:2],
    signal_strengths=[0.0, 1.0],
    rounds=3,
    sequences_batch_size=20,
    model_queries_per_batch=100,
    mesh=mesh,
)
print("sweep summary:")
print(sweep[["landscape", "start", "signal_strength", "max_fitness"]].to_string(index=False))

# Every fused algorithm accepts every model mode ("nam"/"perfect"/
# "surrogate") — adalead, random, ga, cmaes, bo, gpr_bo, dqn, ppo, cbas,
# dbas, plus dynappo/dynappo_mutative (whose built-in r²-gated ensemble
# replaces the surrogate mode).  SurrogateSpec(arch=...) picks the
# in-program model family: "cnn"/"mlp"/"gem" (SGD-trained Flax nets),
# "linear" (closed-form OLS), or "gp" — an EXACT Gaussian-process
# posterior whose analytic sigma powers BO/GPR_BO acquisitions (the
# reference's GPR_BO sigma is identically 0).  Pick the explorer with
# `algorithm=` and, for long
# sweeps, make them preemption-safe with `chunk_size` + `checkpoint_dir`
# (each completed chunk is written to disk; rerunning the same sweep
# resumes past it).  The same matrix is exposed on the command line:
#   flexs-tpu-sweep --algorithm cbas --model surrogate \
#       --chunk-size 64 --checkpoint-dir /tmp/my_sweep
import tempfile  # noqa: E402

with tempfile.TemporaryDirectory() as ckpt:
    sweep_kw = dict(
        landscape_names=["SIX6_REF_R1"],
        starts=flexs.landscapes.tf_binding.STARTS[:2],
        signal_strengths=[1.0],
        rounds=2,
        sequences_batch_size=10,
        model_queries_per_batch=50,
        algorithm="ga",
        algorithm_kwargs={"population_size": 20},
        model="perfect",
        chunk_size=1,
        checkpoint_dir=ckpt,
    )
    run_robustness_sweep(**sweep_kw)          # computes + checkpoints
    resumed = run_robustness_sweep(**sweep_kw)  # loads every chunk
print("checkpointed GA sweep (resumed):")
print(resumed[["landscape", "start", "max_fitness"]].to_string(index=False))
