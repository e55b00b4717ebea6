"""Fused CMAES+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceCMAESNAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 2)
    kw.setdefault("sequences_batch_size", 5)
    kw.setdefault("model_queries_per_batch", 32)
    kw.setdefault("population_size", 8)
    runner = DeviceCMAESNAM(
        landscape,
        flexs.DNAA,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        signal_strength=kw.pop("signal_strength", 1.0),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_schema_and_rounds(landscape):
    df, meta = _run(landscape)
    assert df["round"].max() == 2
    assert np.isnan(df["model_score"].iloc[0])
    for r in range(1, 3):
        assert 0 < len(df[df["round"] == r]) <= 5
    assert meta["exp_name"].startswith("DeviceCMAES")


def test_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_budget_respected(landscape):
    df, _ = _run(landscape, rounds=1)
    # One round: model cost <= budget (+ at most one extra population).
    assert int(df["model_cost"].iloc[-1]) <= 32 + 8


def test_maximize_climbs(landscape):
    df, _ = _run(
        landscape,
        rounds=4,
        sequences_batch_size=20,
        model_queries_per_batch=200,
        population_size=16,
        maximize=True,
    )
    assert df["true_score"].max() > 0.9


def test_seed_determinism(landscape):
    a, _ = _run(landscape, seed=5)
    b, _ = _run(landscape, seed=5)
    assert (a["sequence"] == b["sequence"]).all()
