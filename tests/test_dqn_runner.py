"""Fused DQN+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceDQNNAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 2)
    kw.setdefault("sequences_batch_size", 5)
    kw.setdefault("model_queries_per_batch", 25)
    kw.setdefault("memory_size", 128)
    runner = DeviceDQNNAM(
        landscape,
        flexs.DNAA,
        starting_sequence=flexs.landscapes.tf_binding.STARTS[0],
        signal_strength=kw.pop("signal_strength", 0.9),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_schema_and_rounds(landscape):
    df, meta = _run(landscape)
    assert df["round"].max() == 2
    for r in range(1, 3):
        sub = df[df["round"] == r]
        assert 0 < len(sub) <= 5
        # The per-round proposal pool is a dict (unique keys); ACROSS
        # rounds re-proposals are allowed, exactly like the reference
        # (dqn.py:291 records every walked sequence unconditionally and
        # the top-B is not filtered against the measured set).
        assert sub["sequence"].is_unique
    assert meta["exp_name"] == "DeviceDQN_Explorer"


def test_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_dqn_climbs_with_budget(landscape):
    df, _ = _run(
        landscape,
        rounds=4,
        sequences_batch_size=20,
        model_queries_per_batch=200,
        memory_size=1024,
        signal_strength=1.0,
    )
    assert df["true_score"].max() > 0.85


def test_seed_determinism(landscape):
    a, _ = _run(landscape, seed=9)
    b, _ = _run(landscape, seed=9)
    assert (a["sequence"] == b["sequence"]).all()
