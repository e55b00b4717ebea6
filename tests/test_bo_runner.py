"""Fused Evo-BO+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceBONAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 3)
    kw.setdefault("sequences_batch_size", 6)
    kw.setdefault("model_queries_per_batch", 60)
    kw.setdefault("num_chains", 3)
    runner = DeviceBONAM(
        landscape,
        flexs.DNAA,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        signal_strength=kw.pop("signal_strength", 0.9),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_bo_runner_schema_and_costs(landscape):
    df, meta = _run(landscape)
    assert df["round"].max() == 3
    assert np.isnan(df["model_score"].iloc[0])
    assert meta["exp_name"] == "DeviceBO_method=EI"
    # 3 chains x 2 steps x 10 candidates = 60 screens per round.
    per_round = df.groupby("round")["model_cost"].max()
    assert per_round.loc[1] == 60
    assert per_round.loc[3] == 180
    for r in range(1, 4):
        assert 0 < len(df[df["round"] == r]) <= 6


def test_bo_runner_round_dedup(landscape):
    df, _ = _run(landscape)
    # Visited-state pools are deduped within a round (samples dict keys).
    for r in range(1, 4):
        seqs = df[df["round"] == r]["sequence"]
        assert seqs.is_unique


def test_bo_runner_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_bo_runner_climbs(landscape):
    df, _ = _run(
        landscape,
        rounds=5,
        sequences_batch_size=20,
        model_queries_per_batch=400,
        num_chains=5,
        signal_strength=1.0,
    )
    assert df["true_score"].max() > 0.9
    assert df["true_score"].max() > df["true_score"].iloc[0]


def test_bo_runner_perfect_model_costs(landscape):
    df, meta = _run(landscape, model="perfect")
    assert meta["model_name"].startswith("LandscapeAsModel=")
    # Perfect-model screens never charge the landscape counter; only the
    # start + proposals do.
    assert df["measurement_cost"].max() == len(df)


def test_bo_runner_seed_determinism(landscape):
    a, _ = _run(landscape, seed=7)
    b, _ = _run(landscape, seed=7)
    assert a["sequence"].tolist() == b["sequence"].tolist()
    c, _ = _run(landscape, seed=8)
    assert a["sequence"].tolist() != c["sequence"].tolist()


def test_bo_in_generic_sweep(landscape):
    from flexs_tpu.parallel.sweep import run_landscape_robustness_sweep

    df = run_landscape_robustness_sweep(
        [landscape],
        flexs.DNAA,
        starts=[flexs.landscapes.tf_binding.STARTS[0]],
        signal_strengths=[0.9, 1.0],
        rounds=2,
        sequences_batch_size=6,
        model_queries_per_batch=60,
        algorithm="bo",
        algorithm_kwargs={"num_chains": 3},
    )
    assert len(df) == 2
    assert (df["max_fitness"] >= df["start_fitness"]).all()
    assert (df["model_cost"] == 120).all()
