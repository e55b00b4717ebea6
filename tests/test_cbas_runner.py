"""Fused CbAS/DbAS+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceCbASNAM, VAEConfig


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


SMALL_VAE = VAEConfig(intermediate_dim=32, epochs=3)


def _run(landscape, **kw):
    kw.setdefault("rounds", 2)
    kw.setdefault("sequences_batch_size", 8)
    kw.setdefault("model_queries_per_batch", 40)
    kw.setdefault("cycle_batch_size", 20)
    kw.setdefault("vae_cfg", SMALL_VAE)
    runner = DeviceCbASNAM(
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
    assert df["sequence"].is_unique  # all proposals novelty-filtered
    # First round = batch-size queries; the later round = 2 cycles of 20.
    assert df["model_cost"].max() == 8 + 40
    assert meta["exp_name"].startswith("Devicecbas")


def test_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_dbas_mode_runs(landscape):
    df, _ = _run(landscape, algo="dbas", rounds=2)
    assert df["round"].max() == 2
    assert df["sequence"].is_unique


def test_cbas_climbs_with_budget(landscape):
    df, _ = _run(
        landscape,
        rounds=3,
        sequences_batch_size=16,
        model_queries_per_batch=60,
        signal_strength=1.0,
    )
    # The VAE pool concentrates on elites round over round.
    assert df["true_score"].max() > df[df["round"] == 0]["true_score"].max()
    assert df["true_score"].max() > 0.6


def test_seed_determinism(landscape):
    a, _ = _run(landscape, seed=3)
    b, _ = _run(landscape, seed=3)
    assert (a["sequence"] == b["sequence"]).all()


def test_cbas_in_generic_sweep(landscape):
    """CbAS plugs into the fused sweep engine."""
    from flexs_tpu.parallel.sweep import run_landscape_robustness_sweep

    df = run_landscape_robustness_sweep(
        [landscape],
        flexs.DNAA,
        starts=[flexs.landscapes.tf_binding.STARTS[0]],
        signal_strengths=[1.0],
        seeds=[0],
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=40,
        algorithm="cbas",
        algorithm_kwargs={"cycle_batch_size": 20, "vae_cfg": SMALL_VAE},
    )
    assert len(df) == 1
    assert df["max_fitness"].iloc[0] >= df["start_fitness"].iloc[0]
    assert df["model_cost"].iloc[0] == 8 + 40  # round 0 batch + one round
