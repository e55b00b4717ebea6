"""Fused constructive DynaPPO+NAM device runner tests."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.runtime import DeviceDynaPPONAM


@pytest.fixture(scope="module")
def landscape():
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    return flexs.landscapes.TFBinding(**problem["params"])


def _run(landscape, **kw):
    kw.setdefault("rounds", 2)
    kw.setdefault("sequences_batch_size", 8)
    kw.setdefault("model_queries_per_batch", 32)
    kw.setdefault("env_batch_size", 8)
    runner = DeviceDynaPPONAM(
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
    assert df["sequence"].is_unique
    # Model phases spend exactly ceil(budget/E)*E surrogate queries/round.
    assert df["model_cost"].max() == 2 * 32
    assert meta["exp_name"].startswith("DeviceDynaPPO")


def test_truth_matches_landscape(landscape):
    df, _ = _run(landscape)
    recomputed = landscape._fitness_function(df["sequence"].tolist())
    np.testing.assert_allclose(df["true_score"].to_numpy(), recomputed, atol=1e-6)


def test_dynappo_climbs_with_budget(landscape):
    df, _ = _run(
        landscape,
        rounds=3,
        sequences_batch_size=16,
        model_queries_per_batch=64,
        signal_strength=1.0,
    )
    assert df["true_score"].max() > 0.75


def test_seed_determinism(landscape):
    a, _ = _run(landscape, seed=4)
    b, _ = _run(landscape, seed=4)
    assert (a["sequence"] == b["sequence"]).all()


def test_edit_density_weights_shift_pair():
    """_edit_density counts a block-shift pair the way editdistance does.

    ACGTACGT -> CGTACGTA is Hamming distance 8 (every position moves) but
    Levenshtein 2 (drop the leading A, append an A): the reference env
    weighs it 1/2 (environments/dyna_ppo.py:106-114); the packed-Hamming
    density reports 0.  Also pins the dead-row mask: a trash-row fitness
    beyond n_den must not leak into the sum.
    """
    import jax.numpy as jnp

    from flexs_tpu.runtime.dyna_ppo_runner import _edit_density

    query = jnp.array([[1, 2, 3, 0, 1, 2, 3, 0]], jnp.int32)  # CGTACGTA
    den_tokens = jnp.array(
        [
            [0, 1, 2, 3, 0, 1, 2, 3],  # ACGTACGT: edit distance 2
            [1, 2, 3, 0, 1, 2, 3, 0],  # dead row == query (d would be 0)
        ],
        jnp.int32,
    )
    den_fit = jnp.array([1.0, 50.0], jnp.float32)
    d = _edit_density(query, den_tokens, den_fit, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(d), [0.5], atol=1e-6)


def test_density_metric_edit_runs(landscape):
    """density_metric='edit' compiles, runs, and keeps the run contract."""
    df, meta = _run(landscape, density_metric="edit")
    assert df["round"].max() == 2
    assert df["sequence"].is_unique
    assert df["model_cost"].max() == 2 * 32
    a, _ = _run(landscape, density_metric="edit", seed=3)
    b, _ = _run(landscape, density_metric="edit", seed=3)
    assert (a["sequence"] == b["sequence"]).all()


def test_dynappo_in_generic_sweep(landscape):
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
        algorithm="dynappo",
        algorithm_kwargs={"env_batch_size": 8},
    )
    assert len(df) == 1
    assert df["max_fitness"].iloc[0] >= df["start_fitness"].iloc[0]
    assert df["model_cost"].iloc[0] == 2 * 32
