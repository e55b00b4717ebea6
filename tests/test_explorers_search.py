"""Tests for GeneticAlgorithm and CMAES explorers.

The reference ships no GA test at all and a smoke-only CMAES test
(tests/test_explorers.py:108-118); here both get smoke + hill-climbing
regression coverage (SURVEY.md §4).
"""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.ops import cmaes as cma_ops

ROUNDS = 3
BATCH = 5
QUERIES = 30
START = "TTGCAGCA"


class FakeModel(flexs.Model):
    def __init__(self):
        super().__init__(name="FakeModel")
        self.rng = np.random.default_rng(1)

    def train(self, *args):
        pass

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


class SmoothLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="Smooth")

    def _fitness_function(self, sequences):
        return np.array([sum(c == "A" for c in s) / len(s) for s in sequences])


class FakeLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="FakeLandscape")
        self.rng = np.random.default_rng(0)

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


def _run(explorer):
    df, _ = explorer.run(FakeLandscape(), verbose=False)
    assert df["round"].max() == ROUNDS
    for r in range(1, ROUNDS + 1):
        assert 0 < len(df[df["round"] == r]) <= BATCH
    return df


@pytest.mark.parametrize("strategy", ["top-proportion", "wright-fisher"])
def test_genetic_algorithm_smoke(strategy):
    _run(
        flexs.baselines.explorers.GeneticAlgorithm(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            population_size=10,
            parent_selection_strategy=strategy,
            children_proportion=0.5,
            parent_selection_proportion=0.5,
            beta=0.1,
            seed=0,
        )
    )


def test_genetic_algorithm_invalid_strategy_raises():
    with pytest.raises(ValueError):
        flexs.baselines.explorers.GeneticAlgorithm(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            population_size=10,
            parent_selection_strategy="bogus",
            children_proportion=0.5,
        )


def test_genetic_algorithm_climbs_with_perfect_model():
    landscape = SmoothLandscape()
    explorer = flexs.baselines.explorers.GeneticAlgorithm(
        flexs.LandscapeAsModel(landscape),
        rounds=5,
        sequences_batch_size=10,
        model_queries_per_batch=200,
        starting_sequence=START,
        alphabet=flexs.DNAA,
        population_size=20,
        parent_selection_strategy="wright-fisher",
        children_proportion=0.5,
        beta=0.05,
        seed=0,
    )
    df, _ = explorer.run(landscape, verbose=False)
    assert df["true_score"].max() >= 0.875


def test_cmaes_smoke():
    _run(
        flexs.baselines.explorers.CMAES(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            population_size=8,
            seed=0,
        )
    )


def test_cmaes_core_minimizes_sphere():
    # The CMA-ES core must reliably minimize a convex quadratic.
    target = np.full(8, 3.0, dtype=np.float32)

    def sphere(x):
        return np.sum((x - target) ** 2, axis=1)

    best_x, best_f = cma_ops.minimize(
        sphere, np.zeros(8, np.float32), sigma=1.0, popsize=16, iterations=60, seed=0
    )
    assert best_f < 1e-2
    np.testing.assert_allclose(best_x, target, atol=0.15)


def test_cmaes_sigma_stays_finite_on_flat_objective():
    state = cma_ops.init(np.zeros(4, np.float32), 0.5)
    import jax

    key = jax.random.PRNGKey(0)
    for _ in range(5):
        key, k = jax.random.split(key)
        sols = cma_ops.ask_numpy(state, k, 8)
        state = cma_ops.tell_numpy(state, sols, np.zeros(len(sols)))
    assert np.isfinite(float(state.sigma))
    assert np.isfinite(np.asarray(state.cov)).all()
