"""Every sweepable fused algorithm sharded over the 8-device CPU mesh.

VERDICT r3 weak #4: shard_map coverage was pinned for Adalead and the
surrogate cells only; a shape/collective regression in the other cell
programs (notably the RL/generative families) would only surface on real
multi-chip hardware.  This module sweeps each of the twelve fused
families (`flexs_tpu/parallel/sweep.py` `_cell_runner`) over the full
8-virtual-device mesh with tiny budgets and checks the per-cell summary
is sane, so every cell program is proven to compile AND execute under
shard_map sharding.

The grid is 8 cells (4 starts x 2 seeds) so each device runs exactly one
cell; budgets are minimal to keep the 1-core CPU host's compile time down.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from flexs_tpu.landscapes import tf_binding
from flexs_tpu.parallel import run_landscape_robustness_sweep
from flexs_tpu.runtime.cbas_runner import VAEConfig

# (algorithm, algorithm_kwargs, model) — kwargs shrink the per-cell
# program to test scale; defaults documented in sweep._cell_runner.
FAMILIES = [
    ("adalead", {}, "nam"),
    ("random", {"batch": 8}, "nam"),
    ("ga", {"population_size": 8, "children_proportion": 0.5}, "nam"),
    ("cmaes", {"population_size": 6, "max_iter": 10}, "nam"),
    ("bo", {"num_chains": 4}, "nam"),
    ("gpr_bo", {}, "nam"),
    ("dqn", {"memory_size": 128, "train_epochs": 2}, "nam"),
    ("ppo", {"train_epochs": 2}, "nam"),
    ("dynappo", {"env_batch_size": 4, "train_epochs": 2}, "nam"),
    (
        "dynappo_mutative",
        {"env_batch_size": 4, "episode_len": 8, "train_epochs": 2},
        "nam",
    ),
    (
        "cbas",
        {
            "vae_cfg": VAEConfig(intermediate_dim=16, epochs=2),
            "cycle_batch_size": 12,
        },
        "nam",
    ),
    (
        "dbas",
        {
            "vae_cfg": VAEConfig(intermediate_dim=16, epochs=2),
            "cycle_batch_size": 12,
        },
        "nam",
    ),
]


@pytest.fixture(scope="module")
def mesh():
    devices = np.asarray(jax.devices()[:8])
    assert devices.size == 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(devices, ("cells",))


@pytest.mark.parametrize(
    "algorithm,kwargs,model", FAMILIES, ids=[f[0] for f in FAMILIES]
)
def test_family_shards_over_mesh(mesh, algorithm, kwargs, model):
    landscape = tf_binding.TFBinding(name="SIX6_REF_R1")
    df = run_landscape_robustness_sweep(
        [landscape],
        "TGCA",
        starts=tf_binding.STARTS[:4],
        signal_strengths=[1.0],
        seeds=[0, 1],
        rounds=2,
        sequences_batch_size=3,
        model_queries_per_batch=12,
        mesh=mesh,
        algorithm=algorithm,
        algorithm_kwargs=kwargs,
        model=model,
    )
    assert len(df) == 8
    assert (df["model_cost"] > 0).all()
    assert np.isfinite(df["max_fitness"]).all()
    assert (df["max_fitness"] >= df["start_fitness"]).all()
    # Distinct starts must actually differ (cells are not aliased).
    assert df["start_fitness"].nunique() > 1
