"""Fused trained-surrogate (in-program CNN/ensemble) runner tests.

These cover the experiment class the reference paper actually features —
trained empirical surrogates guiding the explorer (reference
paper_code/cloud/runs/rosetta_cnn/ and runs/cmaes/*_cnn) — executed
entirely inside one device program per run.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import flexs_tpu as flexs
from flexs_tpu.landscapes import tf_binding
from flexs_tpu.parallel import run_landscape_robustness_sweep
from flexs_tpu.runtime import surrogate
from flexs_tpu.runtime.cmaes_runner import DeviceCMAESNAM
from flexs_tpu.runtime.jit_runner import DeviceAdaleadNAM

TINY_CNN = surrogate.SurrogateSpec(
    num_filters=8, hidden_size=16, epochs=3, batch_size=64
)


@pytest.fixture(scope="module")
def landscape():
    return flexs.landscapes.TFBinding(name="SIX6_REF_R1")


def test_surrogate_fit_reduces_loss():
    """A fit on a fixed measured buffer must reduce held-in MSE."""
    key = jax.random.PRNGKey(0)
    L, A, n = 8, 4, 60
    tokens = jax.random.randint(key, (64, L), 0, A)
    truth = jax.numpy.where(
        jax.numpy.arange(64) < n,
        jax.numpy.sum(tokens == 2, axis=1).astype(np.float32) / L,
        -np.inf,
    )
    spec = surrogate.SurrogateSpec(
        num_filters=8, hidden_size=16, epochs=10, batch_size=32
    )
    state = surrogate.init_state(spec, A, L, key)

    def mse(state):
        preds = surrogate.predict(spec, A, state, tokens[:n])
        return float(np.mean((np.asarray(preds) - np.asarray(truth[:n])) ** 2))

    before = mse(state)
    state = surrogate.train(spec, A, state, tokens, truth, n, key)
    after = mse(state)
    assert after < before * 0.5, (before, after)


def test_linear_arch_matches_host_ols():
    """arch="linear" solves the same weighted OLS as JaxRidgeRegression."""
    import jax.numpy as jnp

    from flexs_tpu.baselines.models.jax_linear import JaxRidgeRegression

    rng = np.random.default_rng(0)
    L, A, n = 8, 4, 50
    tokens_np = rng.integers(0, A, size=(64, L)).astype(np.int32)
    y_np = rng.normal(size=64).astype(np.float32)
    truth = jnp.where(jnp.arange(64) < n, jnp.asarray(y_np), -np.inf)

    spec = surrogate.SurrogateSpec(arch="linear")
    assert spec.model_name == "linear_regression"
    state = surrogate.init_state(spec, A, L, jax.random.PRNGKey(0))
    state = surrogate.train(
        spec, A, state, jnp.asarray(tokens_np), truth, n, jax.random.PRNGKey(1)
    )
    preds = np.asarray(surrogate.predict(spec, A, state, jnp.asarray(tokens_np)))

    host = JaxRidgeRegression("TGCA", alpha=0.0)
    decode = lambda rows: ["".join("TGCA"[t] for t in row) for row in rows]
    host.train(decode(tokens_np[:n]), y_np[:n])
    expected = host.get_fitness(decode(tokens_np))
    np.testing.assert_allclose(preds, expected, atol=2e-3)


def test_gem_and_linear_archs_run_fused(landscape):
    """The remaining reference model archs drive the fused runner."""
    for spec in (
        surrogate.SurrogateSpec(arch="gem", hidden_size=16, epochs=3,
                                batch_size=64),
        surrogate.SurrogateSpec(arch="linear"),
    ):
        explorer = DeviceAdaleadNAM(
            landscape,
            "TGCA",
            rounds=2,
            sequences_batch_size=8,
            model_queries_per_batch=40,
            starting_sequence=tf_binding.STARTS[0],
            model="surrogate",
            surrogate_spec=spec,
        )
        df, _ = explorer.run(verbose=False)
        assert df["true_score"].max() >= df["true_score"].iloc[0]
        assert df["measurement_cost"].max() == len(df)
    # GEM keeps the reference's name quirk (global_epistasis_model.py:41).
    assert (
        surrogate.SurrogateSpec(arch="gem", hidden_size=16).model_name
        == "MLP_hidden_size_16"
    )


def test_gp_arch_matches_host_gp_posterior():
    """arch="gp" reproduces JaxGaussianProcessRegressor's mean AND std."""
    import jax.numpy as jnp

    from flexs_tpu.baselines.models.jax_gp import JaxGaussianProcessRegressor

    rng = np.random.default_rng(3)
    L, A, n, cap = 8, 4, 40, 64
    tokens_np = rng.integers(0, A, size=(cap, L)).astype(np.int32)
    y_np = rng.normal(size=cap).astype(np.float32)
    truth = jnp.where(jnp.arange(cap) < n, jnp.asarray(y_np), -np.inf)

    spec = surrogate.SurrogateSpec(arch="gp")
    assert spec.model_name == "gaussian_process"
    with pytest.raises(ValueError):  # capacity is required for gp
        surrogate.init_state(spec, A, L, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):  # exact posterior: no ensembling
        surrogate.init_state(
            spec._replace(ensemble_size=3), A, L, jax.random.PRNGKey(0),
            capacity=cap,
        )

    state = surrogate.init_state(spec, A, L, jax.random.PRNGKey(0), capacity=cap)
    state = surrogate.train(
        spec, A, state, jnp.asarray(tokens_np), truth, n, jax.random.PRNGKey(1)
    )
    query = rng.integers(0, A, size=(16, L)).astype(np.int32)
    mu, sig = surrogate.posterior(spec, A, state, jnp.asarray(query))
    assert float(jnp.min(sig)) > 0  # a REAL posterior spread

    # Host model fit on the same bucketed shapes (next_bucket(40) = 64).
    host = JaxGaussianProcessRegressor("TGCA")
    decode = lambda rows: ["".join("TGCA"[t] for t in row) for row in rows]
    host.train(decode(tokens_np[:n]), y_np[:n])
    np.testing.assert_allclose(
        np.asarray(mu), host.fitness_from_tokens(query), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sig), host.fitness_std_from_tokens(query), atol=2e-3
    )
    # predict() is the posterior mean.
    np.testing.assert_allclose(
        np.asarray(surrogate.predict(spec, A, state, jnp.asarray(query))),
        np.asarray(mu),
        atol=1e-6,
    )


def test_gp_arch_runs_fused(landscape):
    """The exact-GP surrogate drives the fused Adalead and Evo-BO runners."""
    from flexs_tpu.runtime.bo_runner import DeviceBONAM

    spec = surrogate.SurrogateSpec(arch="gp", gp_opt_steps=15)
    for cls, kw in (
        (DeviceAdaleadNAM, {}),
        (DeviceBONAM, dict(num_chains=4, method="EI")),
    ):
        explorer = cls(
            landscape,
            "TGCA",
            rounds=2,
            sequences_batch_size=8,
            model_queries_per_batch=40,
            starting_sequence=tf_binding.STARTS[0],
            model="surrogate",
            surrogate_spec=spec,
            **kw,
        )
        df, meta = explorer.run(verbose=False)
        assert meta["model_name"] == "gaussian_process"
        assert df["true_score"].max() >= df["true_score"].iloc[0]


def test_adaptive_ensemble_weights():
    """Adaptive specs reweight members by holdout r^2 (sum to 1)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    L, A, n = 8, 4, 60
    tokens = jax.random.randint(key, (64, L), 0, A)
    truth = jnp.where(
        jnp.arange(64) < n,
        jnp.sum(tokens == 2, axis=1).astype(np.float32) / L,
        -np.inf,
    )
    spec = TINY_CNN._replace(ensemble_size=3, adaptive=True)
    assert spec.model_name.startswith("AdaptiveEns(")
    state = surrogate.init_state(spec, A, L, key)
    np.testing.assert_allclose(np.asarray(state.weight), [1 / 3] * 3, atol=1e-6)
    state = surrogate.train(spec, A, state, tokens, truth, n, key)
    w = np.asarray(state.weight)
    assert abs(w.sum() - 1.0) < 1e-5
    assert (w >= 0).all()
    # Prediction is the weighted member combine.
    members = np.asarray(
        surrogate.predict_members(spec, A, state, tokens[:4])
    )
    np.testing.assert_allclose(
        np.asarray(surrogate.predict(spec, A, state, tokens[:4])),
        (members * w[:, None]).sum(axis=0),
        atol=1e-6,
    )


def test_device_adalead_adaptive_surrogate(landscape):
    explorer = DeviceAdaleadNAM(
        landscape,
        "TGCA",
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=40,
        starting_sequence=tf_binding.STARTS[0],
        model="surrogate",
        surrogate_spec=TINY_CNN._replace(ensemble_size=2, adaptive=True),
    )
    df, _ = explorer.run(verbose=False)
    assert df["true_score"].max() >= df["true_score"].iloc[0]


def test_device_adalead_surrogate(landscape):
    explorer = DeviceAdaleadNAM(
        landscape,
        "TGCA",
        rounds=3,
        sequences_batch_size=8,
        model_queries_per_batch=40,
        starting_sequence=tf_binding.STARTS[0],
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    assert explorer.model_name == "CNN_hidden_size_16_num_filters_8"
    df, metadata = explorer.run(verbose=False)
    assert df["true_score"].max() >= df["true_score"].iloc[0]
    # Landscape pays ONLY for measurements (start + proposals), never for
    # model queries (reference keras surrogate semantics).
    assert df["measurement_cost"].max() == len(df)
    assert (df[df["round"] > 0]["model_cost"] > 0).all()


def test_device_cmaes_surrogate_ensemble(landscape):
    explorer = DeviceCMAESNAM(
        landscape,
        "TGCA",
        rounds=3,
        sequences_batch_size=8,
        model_queries_per_batch=60,
        starting_sequence=tf_binding.STARTS[0],
        population_size=6,
        max_iter=50,
        maximize=True,
        model="surrogate",
        surrogate_spec=TINY_CNN._replace(ensemble_size=2),
    )
    assert explorer.model_name == (
        "Ens(CNN_hidden_size_16_num_filters_8|CNN_hidden_size_16_num_filters_8)"
    )
    df, _ = explorer.run(verbose=False)
    assert df["true_score"].max() >= df["true_score"].iloc[0]


def test_surrogate_sweep_sharded(landscape):
    """Surrogate cells vmap + shard over the mesh like NAM cells."""
    mesh = Mesh(np.array(jax.devices()), ("cells",))
    df = run_landscape_robustness_sweep(
        [landscape],
        "TGCA",
        starts=tf_binding.STARTS[:2],
        signal_strengths=[1.0],
        seeds=[0, 1],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        mesh=mesh,
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    assert len(df) == 4
    assert (df["max_fitness"] >= df["start_fitness"]).all()
    assert (df["model_cost"] > 0).all()


def test_device_ga_surrogate(landscape):
    from flexs_tpu.runtime.ga_runner import DeviceGeneticAlgorithmNAM

    explorer = DeviceGeneticAlgorithmNAM(
        landscape,
        "TGCA",
        rounds=3,
        sequences_batch_size=8,
        model_queries_per_batch=40,
        starting_sequence=tf_binding.STARTS[0],
        population_size=20,
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    df, _ = explorer.run(verbose=False)
    assert df["true_score"].max() >= df["true_score"].iloc[0]
    # Landscape pays only for measurements.
    assert df["measurement_cost"].max() == len(df)


@pytest.mark.parametrize("method", ["EI", "UCB"])
def test_device_bo_surrogate_ensemble(landscape, method):
    """Fused BO with a real member spread: EI/UCB use per-member stats."""
    from flexs_tpu.runtime.bo_runner import DeviceBONAM

    explorer = DeviceBONAM(
        landscape,
        "TGCA",
        rounds=3,
        sequences_batch_size=8,
        model_queries_per_batch=64,
        starting_sequence=tf_binding.STARTS[0],
        num_chains=4,
        method=method,
        model="surrogate",
        surrogate_spec=TINY_CNN._replace(ensemble_size=2),
    )
    df, _ = explorer.run(verbose=False)
    assert df["true_score"].max() >= df["true_score"].iloc[0]
    assert df["measurement_cost"].max() == len(df)


def test_device_random_surrogate(landscape):
    from flexs_tpu.runtime.random_runner import DeviceRandomNAM

    explorer = DeviceRandomNAM(
        landscape,
        "TGCA",
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=40,
        starting_sequence=tf_binding.STARTS[0],
        batch=16,
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    assert explorer.model_name == "CNN_hidden_size_16_num_filters_8"
    df, _ = explorer.run(verbose=False)
    assert df["true_score"].max() >= df["true_score"].iloc[0]
    # Landscape pays only for measurements, never for surrogate queries.
    assert df["measurement_cost"].max() == len(df)
    assert (df[df["round"] > 0]["model_cost"] > 0).all()


def test_device_dqn_surrogate(landscape):
    from flexs_tpu.runtime.dqn_runner import DeviceDQNNAM

    explorer = DeviceDQNNAM(
        landscape,
        "TGCA",
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=30,
        starting_sequence=tf_binding.STARTS[0],
        memory_size=256,
        train_epochs=3,
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    df, _ = explorer.run(verbose=False)
    assert df["measurement_cost"].max() == len(df)


def test_device_ppo_surrogate(landscape):
    from flexs_tpu.runtime.ppo_runner import DevicePPONAM

    explorer = DevicePPONAM(
        landscape,
        "TGCA",
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=30,
        starting_sequence=tf_binding.STARTS[0],
        train_epochs=3,
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    df, _ = explorer.run(verbose=False)
    assert df["measurement_cost"].max() == len(df)


def test_device_cbas_surrogate(landscape):
    from flexs_tpu.runtime.cbas_runner import DeviceCbASNAM, VAEConfig

    explorer = DeviceCbASNAM(
        landscape,
        "TGCA",
        rounds=2,
        sequences_batch_size=8,
        model_queries_per_batch=40,
        starting_sequence=tf_binding.STARTS[0],
        cycle_batch_size=20,
        vae_cfg=VAEConfig(epochs=2, batch_size=10),
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    df, _ = explorer.run(verbose=False)
    assert df["measurement_cost"].max() == len(df)


@pytest.mark.parametrize(
    "algorithm,kwargs",
    [
        ("random", {"batch": 8}),
        ("dqn", {"memory_size": 64, "train_epochs": 2}),
        ("ppo", {"train_epochs": 2}),
        ("cbas", {"cycle_batch_size": 10}),
    ],
)
def test_surrogate_sweep_new_runners(landscape, algorithm, kwargs):
    """The new surrogate runners vmap + shard under the sweep engine."""
    df = run_landscape_robustness_sweep(
        [landscape],
        "TGCA",
        starts=tf_binding.STARTS[:1],
        signal_strengths=[1.0],
        seeds=[0, 1],
        rounds=2,
        sequences_batch_size=4,
        model_queries_per_batch=16,
        algorithm=algorithm,
        algorithm_kwargs=kwargs,
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    assert len(df) == 2
    assert (df["max_fitness"] >= df["start_fitness"]).all()
    assert (df["model_cost"] > 0).all()


def test_dynappo_surrogate_raises(landscape):
    """DynaPPO's internal ensemble IS the trained surrogate — explicit error."""
    with pytest.raises(ValueError, match="internal model ensemble"):
        run_landscape_robustness_sweep(
            [landscape],
            "TGCA",
            starts=tf_binding.STARTS[:1],
            signal_strengths=[1.0],
            rounds=2,
            sequences_batch_size=4,
            model_queries_per_batch=20,
            algorithm="dynappo",
            model="surrogate",
        )


def test_surrogate_sweep_cmaes(landscape):
    df = run_landscape_robustness_sweep(
        [landscape],
        "TGCA",
        starts=tf_binding.STARTS[:1],
        signal_strengths=[1.0],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=30,
        algorithm="cmaes",
        algorithm_kwargs={"population_size": 6, "max_iter": 40, "maximize": True},
        model="surrogate",
        surrogate_spec=TINY_CNN,
    )
    assert len(df) == 1
    assert (df["max_fitness"] >= df["start_fitness"]).all()


def test_gp_arch_survives_duplicate_measured_rows():
    """Duplicate measured rows must not NaN-poison the exact GP.

    BO/CMA-ES runners can re-propose an already-measured sequence, so the
    measured buffer can hold identical token rows; the f32 Cholesky of an
    exactly singular kernel returns all-NaN without the first-occurrence
    dedup in surrogate.train's gp branch.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    L, A, cap = 8, 4, 32
    tokens_np = rng.integers(0, A, size=(cap, L)).astype(np.int32)
    tokens_np[5] = tokens_np[2]  # exact duplicate pair
    tokens_np[9] = tokens_np[2]  # triple
    y = rng.normal(size=cap).astype(np.float32)
    y[5] = y[2]
    y[9] = y[2]
    truth = jnp.where(jnp.arange(cap) < 16, jnp.asarray(y), -np.inf)

    spec = surrogate.SurrogateSpec(arch="gp", gp_opt_steps=10)
    state = surrogate.init_state(spec, A, L, jax.random.PRNGKey(0), capacity=cap)
    state = surrogate.train(
        spec, A, state, jnp.asarray(tokens_np), truth, 16, jax.random.PRNGKey(1)
    )
    mu, sig = surrogate.posterior(spec, A, state, jnp.asarray(tokens_np[:16]))
    assert np.isfinite(np.asarray(mu)).all()
    assert np.isfinite(np.asarray(sig)).all()
    # The duplicated sequence's posterior mean still interpolates its label.
    np.testing.assert_allclose(np.asarray(mu)[2], y[2], atol=0.1)


def test_bo_gp_ucb_multi_round(landscape):
    """gp-UCB BO (which walks back to measured points) stays finite and
    proposes in EVERY round — the duplicate-row NaN regression."""
    from flexs_tpu.runtime.bo_runner import DeviceBONAM

    explorer = DeviceBONAM(
        landscape,
        "TGCA",
        rounds=4,
        sequences_batch_size=5,
        model_queries_per_batch=40,
        starting_sequence=tf_binding.STARTS[0],
        num_chains=4,
        method="UCB",
        model="surrogate",
        surrogate_spec=surrogate.SurrogateSpec(arch="gp", gp_opt_steps=10),
    )
    df, _ = explorer.run(verbose=False)
    for r in range(1, 5):
        assert len(df[df["round"] == r]) > 0, f"round {r} proposed nothing"
    assert np.isfinite(df["true_score"].to_numpy()[1:]).all()
