"""Model tests (NoisyAbstractModel semantics follow reference
tests/test_models.py:80-99 plus determinism/batching checks)."""
import numpy as np

import flexs_tpu as flexs
from flexs_tpu.utils import sequence_utils as s_utils


class FakeConstantLandscape(flexs.Landscape):
    def __init__(self, v=0.5):
        super().__init__(name="Const")
        self.v = v

    def _fitness_function(self, sequences):
        return np.full(len(sequences), self.v)


class CountingLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="Counting")

    def _fitness_function(self, sequences):
        # fitness = fraction of 'A's: smooth, deterministic
        return np.array([sum(c == "A" for c in s) / len(s) for s in sequences])


def test_nam_exact_when_ss1():
    landscape = CountingLandscape()
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=1.0, seed=0
    )
    model.train(["AAAA", "TTTT"], [1.0, 0.0])
    seqs = ["AATT", "ATAT", "AAAT"]
    np.testing.assert_allclose(
        model.get_fitness(seqs), landscape._fitness_function(seqs)
    )


def test_nam_cached_values_returned():
    landscape = CountingLandscape()
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=0.5, seed=0
    )
    model.train(["AAAA"], [0.77])
    np.testing.assert_allclose(model.get_fitness(["AAAA"]), [0.77])


def test_nam_deterministic_repeat_queries():
    landscape = CountingLandscape()
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=0.0, seed=0
    )
    model.train(["AAAA"], [1.0])
    first = model.get_fitness(["TTTT", "GGGG"])
    second = model.get_fitness(["TTTT", "GGGG"])
    np.testing.assert_allclose(first, second)


def test_nam_ss0_fully_corrupted():
    landscape = CountingLandscape()
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=0.0, seed=0
    )
    model.train(["AAAAAAAA"], [1.0])
    seqs = s_utils.generate_random_sequences(
        8, 50, flexs.DNAA, rng=np.random.default_rng(3)
    )
    seqs = [s for s in seqs if s != "AAAAAAAA"]
    preds = model.get_fitness(seqs)
    truth = landscape._fitness_function(seqs)
    # With ss=0 predictions are pure exponential noise around the neighbor's
    # fitness; they should not match the truth.
    assert np.abs(preds - truth).max() > 0.01


def test_nam_landscape_cost_two_per_new_query():
    landscape = CountingLandscape()
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=0.9, seed=0
    )
    model.train(["AAAA"], [1.0])
    model.get_fitness(["TTTT", "GGGG"])
    # signal + neighbor lookup per new sequence (reference :85-88)
    assert landscape.cost == 4
    assert model.cost == 2


def test_nam_nearest_neighbor_distance_weighting():
    landscape = FakeConstantLandscape(v=1.0)
    model = flexs.baselines.models.NoisyAbstractModel(
        landscape, signal_strength=0.5, seed=42
    )
    model.train(["AAAAAAAA"], [1.0])
    # distance-1 neighbor: alpha = 0.5; distance-8: alpha = 0.5^8
    close, far = model.get_fitness(["AAAAAAAT", "TTTTTTTT"])
    # Both signals are 1.0; far one is nearly all exponential noise.
    assert 0 <= close and 0 <= far
    # statistical check with fixed seed: deterministic values
    np.testing.assert_allclose(model.get_fitness(["AAAAAAAT"]), [close])
