"""Fused PPO+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DevicePPONAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 2)
    kw.setdefault("sequences_batch_size", 8)
    kw.setdefault("model_queries_per_batch", 50)
    runner = DevicePPONAM(
        landscape,
        flexs.DNAA,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        signal_strength=kw.pop("signal_strength", 0.9),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_schema_and_costs(landscape):
    df, meta = _run(landscape)
    assert df["round"].max() == 2
    assert df["sequence"].is_unique  # proposals novelty-filtered vs measured
    # Budget spent fully; a round may overshoot by one query when a reset
    # and a scored step land in the same loop iteration (host explorer
    # semantics: ppo.py:92-109 checks the budget between queries).
    assert 2 * 50 <= df["model_cost"].max() <= 2 * 51
    assert meta["exp_name"] == "DevicePPO_Agent"


def test_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_ppo_climbs_with_budget(landscape):
    df, _ = _run(
        landscape,
        rounds=3,
        sequences_batch_size=16,
        model_queries_per_batch=100,
        signal_strength=1.0,
    )
    assert df["true_score"].max() > 0.85


def test_seed_determinism(landscape):
    a, _ = _run(landscape, seed=5)
    b, _ = _run(landscape, seed=5)
    assert (a["sequence"] == b["sequence"]).all()


def test_ppo_in_generic_sweep(landscape):
    """PPO plugs into the fused sweep engine."""
    from flexs_tpu.parallel.sweep import run_landscape_robustness_sweep

    df = run_landscape_robustness_sweep(
        [landscape],
        flexs.DNAA,
        starts=[flexs.landscapes.tf_binding.STARTS[0]],
        signal_strengths=[1.0],
        seeds=[0],
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=50,
        algorithm="ppo",
    )
    assert len(df) == 1
    assert df["max_fitness"].iloc[0] >= df["start_fitness"].iloc[0]
    assert 2 * 50 <= df["model_cost"].iloc[0] <= 2 * 51
