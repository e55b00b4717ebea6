"""Fused GeneticAlgorithm+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceGeneticAlgorithmNAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, strategy="wright-fisher", **kw):
    kw.setdefault("rounds", 3)
    kw.setdefault("sequences_batch_size", 5)
    kw.setdefault("model_queries_per_batch", 30)
    runner = DeviceGeneticAlgorithmNAM(
        landscape,
        flexs.DNAA,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        population_size=10,
        parent_selection_strategy=strategy,
        children_proportion=0.5,
        parent_selection_proportion=0.5,
        beta=0.05,
        signal_strength=kw.pop("signal_strength", 0.9),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


@pytest.mark.parametrize("strategy", ["wright-fisher", "top-proportion"])
def test_ga_runner_schema_and_dedup(landscape, strategy):
    df, meta = _run(landscape, strategy)
    assert df["round"].max() == 3
    assert df["sequence"].is_unique
    assert np.isnan(df["model_score"].iloc[0])
    for r in range(1, 4):
        assert 0 < len(df[df["round"] == r]) <= 5


def test_ga_runner_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_ga_runner_climbs(landscape):
    df, _ = _run(
        landscape,
        rounds=5,
        sequences_batch_size=50,
        model_queries_per_batch=500,
        signal_strength=1.0,
    )
    assert df["true_score"].max() > 0.9


def test_ga_runner_seed_determinism(landscape):
    a, _ = _run(landscape, seed=3)
    b, _ = _run(landscape, seed=3)
    assert (a["sequence"] == b["sequence"]).all()


def test_fused_random_runner(landscape):
    from flexs_tpu.runtime import DeviceRandomNAM

    runner = DeviceRandomNAM(
        landscape,
        flexs.DNAA,
        rounds=3,
        sequences_batch_size=5,
        model_queries_per_batch=30,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        batch=8,
        signal_strength=0.9,
        seed=0,
    )
    df, meta = runner.run(verbose=False)
    assert df["round"].max() == 3
    assert df["sequence"].is_unique
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_fused_random_non_elitist(landscape):
    from flexs_tpu.runtime import DeviceRandomNAM

    def run(elitist, seed=0):
        runner = DeviceRandomNAM(
            landscape,
            flexs.DNAA,
            rounds=3,
            sequences_batch_size=5,
            model_queries_per_batch=50,
            starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
            batch=8,
            signal_strength=1.0,
            elitist=elitist,
            seed=seed,
        )
        df, _ = runner.run(verbose=False)
        return df

    uniform = run(False)
    assert 0 < len(uniform[uniform["round"] == 1]) <= 5
    recomputed = landscape._fitness_function(uniform["sequence"].tolist())
    np.testing.assert_allclose(
        uniform["true_score"].to_numpy(), recomputed, atol=1e-6
    )
    # Elitist proposals dominate uniform ones on model score (ss=1:
    # model score == truth), given the same generation budget and seed.
    elitist = run(True)
    assert (
        elitist[elitist["round"] == 1]["model_score"].mean()
        >= uniform[uniform["round"] == 1]["model_score"].mean()
    )
