"""Tests for the fully-jitted Adalead+NAM device runner.

Checks the fused program against the framework invariants (SURVEY.md §1)
and against the host-loop implementation's results on the same landscape.
"""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceAdaleadNAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


@pytest.fixture(scope="module")
def start():
    return flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]["starts"][0]


def _run(landscape, start, **kw):
    kw.setdefault("rounds", 3)
    kw.setdefault("sequences_batch_size", 5)
    kw.setdefault("model_queries_per_batch", 20)
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.DNAA,
        starting_sequence=start,
        signal_strength=kw.pop("signal_strength", 0.9),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_schema_and_round_structure(landscape, start):
    df, meta = _run(landscape, start)
    assert list(df.columns) == [
        "sequence",
        "model_score",
        "true_score",
        "round",
        "model_cost",
        "measurement_cost",
    ]
    assert df["round"].max() == 3
    # Round 0: only the start, NaN model score.
    r0 = df[df["round"] == 0]
    assert len(r0) == 1 and r0["sequence"].iloc[0] == start
    assert np.isnan(r0["model_score"].iloc[0])
    for r in range(1, 4):
        assert 0 < len(df[df["round"] == r]) <= 5


def test_no_sequence_measured_twice(landscape, start):
    df, _ = _run(landscape, start)
    assert df["sequence"].is_unique


def test_costs_monotone_and_budgeted(landscape, start):
    df, _ = _run(landscape, start)
    per_round = df.groupby("round")["model_cost"].first()
    assert per_round.is_monotonic_increasing
    # Each round uses at most budget + one extra root batch of queries.
    deltas = np.diff(per_round.to_numpy())
    assert (deltas <= 20 + 5).all()


def test_true_scores_match_landscape(landscape, start):
    df, _ = _run(landscape, start)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_ss1_model_scores_are_truth(landscape, start):
    # With signal_strength=1 the NAM is exact: proposals' model scores must
    # equal their true scores.
    df, _ = _run(landscape, start, signal_strength=1.0)
    prop = df[df["round"] > 0]
    np.testing.assert_allclose(
        prop["model_score"].to_numpy(), prop["true_score"].to_numpy(), atol=1e-5
    )


def test_seed_determinism(landscape, start):
    df1, _ = _run(landscape, start, seed=7)
    df2, _ = _run(landscape, start, seed=7)
    assert (df1["sequence"] == df2["sequence"]).all()
    np.testing.assert_allclose(
        df1["model_score"].to_numpy()[1:], df2["model_score"].to_numpy()[1:]
    )


def test_matches_host_path_quality(landscape, start):
    """Fused runner must climb like the host Adalead+NAM on real data."""
    df, _ = _run(
        landscape,
        start,
        rounds=5,
        sequences_batch_size=50,
        model_queries_per_batch=500,
    )
    # Host path reaches ~0.99 on this config (see bench history); the
    # fused path must reach comparable fitness.
    assert df["true_score"].max() > 0.95


def test_log_file_format(landscape, start, tmp_path):
    import json

    log = tmp_path / "run.csv"
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.DNAA,
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence=start,
        log_file=str(log),
    )
    runner.run(verbose=False)
    lines = log.read_text().splitlines()
    meta = json.loads(lines[0])
    assert meta["landscape_name"] == "TF_Binding"
    assert lines[1].split(",") == [
        "sequence",
        "model_score",
        "true_score",
        "round",
        "model_cost",
        "measurement_cost",
    ]


def test_perfect_model_mode(landscape, start):
    """model='perfect': predictions equal truth; landscape cost = measured."""
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.DNAA,
        rounds=3,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence=start,
        model="perfect",
        seed=0,
    )
    cost_before = landscape.cost
    df, meta = runner.run(verbose=False)
    prop = df[df["round"] > 0]
    np.testing.assert_allclose(
        prop["model_score"].to_numpy(), prop["true_score"].to_numpy(), atol=1e-5
    )
    assert meta["model_name"].startswith("LandscapeAsModel=")
    # Only measurements charge the landscape (reference model.py:49-50).
    assert landscape.cost - cost_before == len(df)


def test_invalid_model_mode_raises(landscape, start):
    with pytest.raises(ValueError):
        DeviceAdaleadNAM(
            landscape,
            flexs.DNAA,
            rounds=1,
            sequences_batch_size=5,
            model_queries_per_batch=20,
            starting_sequence=start,
            model="bogus",
        )
