"""Fused MUTATIVE DynaPPO+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceDynaPPOMutativeNAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 2)
    kw.setdefault("sequences_batch_size", 8)
    kw.setdefault("model_queries_per_batch", 32)
    kw.setdefault("env_batch_size", 4)
    kw.setdefault("episode_len", 6)
    kw.setdefault("train_epochs", 2)
    runner = DeviceDynaPPOMutativeNAM(
        landscape,
        flexs.DNAA,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        signal_strength=kw.pop("signal_strength", 0.9),
        model=kw.pop("model", "perfect"),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_schema_and_annealed_budget(landscape):
    df, meta = _run(landscape)
    assert df["round"].max() == 2
    assert df["sequence"].is_unique
    assert meta["exp_name"].startswith("DeviceDynaPPOMutative")
    # Annealed experiment budget: round 1 proposes B - B/2, the budget
    # then interpolates down (reference dyna_ppo.py:477-481, 515-524).
    r1 = (df["round"] == 1).sum()
    r2 = (df["round"] == 2).sum()
    assert r1 <= 4  # B=8, exp budget 4 at round 1
    assert r2 >= r1  # later rounds propose more


def test_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_density_metric_edit_runs(landscape):
    """density_metric='edit' (exact in-walk Levenshtein) keeps the contract."""
    df, _ = _run(landscape, density_metric="edit")
    assert df["round"].max() == 2
    assert df["sequence"].is_unique
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)
    a, _ = _run(landscape, density_metric="edit", seed=5)
    b, _ = _run(landscape, density_metric="edit", seed=5)
    assert (a["sequence"] == b["sequence"]).all()


def test_mutative_climbs_with_budget(landscape):
    df, _ = _run(
        landscape,
        rounds=3,
        sequences_batch_size=16,
        model_queries_per_batch=64,
        episode_len=8,
        signal_strength=1.0,
    )
    assert df["true_score"].max() > 0.7


def test_seed_determinism(landscape):
    a, _ = _run(landscape, seed=4)
    b, _ = _run(landscape, seed=4)
    assert (a["sequence"] == b["sequence"]).all()


def test_nam_mode_runs(landscape):
    df, _ = _run(landscape, model="nam", signal_strength=0.9)
    assert df["true_score"].max() >= df["true_score"].iloc[0] - 1e-6


def test_mutative_in_generic_sweep(landscape):
    from flexs_tpu.parallel.sweep import run_landscape_robustness_sweep

    df = run_landscape_robustness_sweep(
        [landscape],
        flexs.DNAA,
        starts=[flexs.landscapes.tf_binding.STARTS[0]],
        signal_strengths=[1.0],
        seeds=[0],
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=32,
        algorithm="dynappo_mutative",
        algorithm_kwargs={
            "env_batch_size": 4, "episode_len": 6, "train_epochs": 2,
        },
    )
    assert len(df) == 1
    assert df["max_fitness"].iloc[0] >= df["start_fitness"].iloc[0]
