"""Fused GPR_BO device runner tests (full-space enumeration)."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.landscapes import tf_binding
from flexs_tpu.parallel import run_landscape_robustness_sweep
from flexs_tpu.runtime import DeviceGPRBONAM
from flexs_tpu.runtime.surrogate import SurrogateSpec


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 3)
    kw.setdefault("sequences_batch_size", 6)
    kw.setdefault("model_queries_per_batch", 60)
    runner = DeviceGPRBONAM(
        landscape,
        flexs.DNAA,
        starting_sequence=tf_binding.STARTS[0],
        signal_strength=kw.pop("signal_strength", 0.9),
        seed=kw.pop("seed", 0),
        **kw,
    )
    return runner.run(verbose=False)


def test_gpr_bo_schema_and_costs(landscape):
    df, meta = _run(landscape)
    assert df["round"].max() == 3
    assert np.isnan(df["model_score"].iloc[0])
    assert meta["exp_name"] == "DeviceGPR_BO_method=Thompson"
    # Unbudgeted by design: the model is charged the full 4^8 space each
    # round (reference bo.py:264-266; host explorer add_cost(n)).
    per_round = df.groupby("round")["model_cost"].max()
    assert per_round.loc[1] == 4**8
    assert per_round.loc[3] == 3 * 4**8
    for r in range(1, 4):
        assert len(df[df["round"] == r]) == 6


def test_gpr_bo_never_reproposes(landscape):
    # Measured points are masked out of the ranking, so proposals are
    # unique across the WHOLE run, not just within a round.
    df, _ = _run(landscape)
    assert df["sequence"].is_unique


def test_gpr_bo_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_gpr_bo_perfect_model_is_global_topk(landscape):
    # With the perfect model sigma = 0, so round 1 proposes the true top-k
    # of the entire space (minus the start).
    df, meta = _run(landscape, model="perfect", rounds=1)
    assert meta["model_name"].startswith("LandscapeAsModel=")
    table = np.asarray(landscape.table)
    expected = np.sort(table)[-6:][::-1]
    got = np.sort(df[df["round"] == 1]["true_score"].to_numpy())[::-1]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_gpr_bo_nam_ranking_freezes_after_round_one(landscape):
    # NAM quirk cascade (module docstring): round 1 caches a prediction
    # for every point in the space, so later rounds just walk down the
    # frozen ranking — under Greedy, round r+1's scores are <= round r's
    # minimum.
    df, _ = _run(landscape, method="Greedy", rounds=3)
    mins = df.groupby("round")["model_score"].min()
    maxs = df.groupby("round")["model_score"].max()
    assert maxs.loc[2] <= mins.loc[1] + 1e-6
    assert maxs.loc[3] <= mins.loc[2] + 1e-6


def test_gpr_bo_methods_run(landscape):
    for method in ("Greedy", "UCB"):
        df, meta = _run(landscape, method=method, rounds=1)
        assert meta["exp_name"].endswith(method)
        assert len(df) == 7


def test_gpr_bo_surrogate_ensemble(landscape):
    spec = SurrogateSpec(ensemble_size=2, num_filters=8, hidden_size=16,
                         epochs=3)
    df, meta = _run(landscape, model="surrogate", surrogate_spec=spec,
                    rounds=2, sequences_batch_size=5)
    assert meta["model_name"].startswith("Ens(")
    assert df["true_score"].max() >= df["true_score"].iloc[0]


def test_gpr_bo_exact_gp_posterior(landscape):
    """arch="gp" gives GPR_BO what its name promises: a real GP posterior.

    The reference's GPR_BO sigma is np.std over a scalar = 0 everywhere
    (reference bo.py:319, preserved-quirks list), so Thompson/UCB collapse
    to greedy there.  The exact-GP surrogate's analytic sigma makes
    Thompson sampling genuinely stochastic: two Thompson runs with
    different seeds must diverge in their proposals while a Greedy run on
    the same posterior is seed-invariant.
    """
    spec = SurrogateSpec(arch="gp", gp_opt_steps=15)
    kw = dict(model="surrogate", surrogate_spec=spec, rounds=2,
              sequences_batch_size=5)
    t1, meta = _run(landscape, method="Thompson", seed=1, **kw)
    t2, _ = _run(landscape, method="Thompson", seed=2, **kw)
    assert meta["model_name"] == "gaussian_process"
    assert t1["sequence"].tolist() != t2["sequence"].tolist()
    g1, _ = _run(landscape, method="Greedy", seed=1, **kw)
    g2, _ = _run(landscape, method="Greedy", seed=2, **kw)
    assert g1["sequence"].tolist() == g2["sequence"].tolist()
    for df in (t1, t2, g1, g2):
        assert df["true_score"].max() >= df["true_score"].iloc[0]


def test_gpr_bo_seed_determinism(landscape):
    a, _ = _run(landscape, seed=7)
    b, _ = _run(landscape, seed=7)
    c, _ = _run(landscape, seed=8)
    assert a["sequence"].tolist() == b["sequence"].tolist()
    assert a["sequence"].tolist() != c["sequence"].tolist()


def test_gpr_bo_rejects_huge_spaces(landscape):
    with pytest.raises(ValueError, match="too large"):
        DeviceGPRBONAM(
            landscape,
            flexs.AAS,
            rounds=1,
            sequences_batch_size=5,
            model_queries_per_batch=20,
            starting_sequence="A" * 66,
        )


def test_gpr_bo_sweepable(landscape):
    df = run_landscape_robustness_sweep(
        [landscape],
        "TGCA",
        starts=tf_binding.STARTS[:2],
        signal_strengths=[0.9],
        seeds=[0],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        algorithm="gpr_bo",
    )
    assert len(df) == 2
    assert (df["max_fitness"] >= df["start_fitness"]).all()
