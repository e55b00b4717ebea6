"""Explorer smoke tests over fake models/landscapes.

Mirrors the reference test strategy (tests/test_explorers.py:20-33):
3 rounds, batch 5, 20 queries, 8-mer DNA.
"""
import numpy as np
import pytest

import flexs_tpu as flexs


class FakeLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="FakeLandscape")
        self.rng = np.random.default_rng(0)

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


class FakeModel(flexs.Model):
    def __init__(self):
        super().__init__(name="FakeModel")
        self.rng = np.random.default_rng(1)

    def train(self, *args):
        pass

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


ROUNDS = 3
BATCH = 5
QUERIES = 20
START = "TTGCAGCA"


def _run(explorer):
    landscape = FakeLandscape()
    df, _ = explorer.run(landscape, verbose=False)
    assert df["round"].max() == ROUNDS
    for r in range(1, ROUNDS + 1):
        assert 0 < len(df[df["round"] == r]) <= BATCH
    return df


def test_random():
    _run(
        flexs.baselines.explorers.Random(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            seed=0,
        )
    )


def test_random_proposes_novel():
    df = _run(
        flexs.baselines.explorers.Random(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            seed=0,
        )
    )
    # no sequence measured twice across rounds (dedup discipline)
    per_round = df.groupby("sequence")["round"].nunique()
    assert (per_round == 1).all()


def test_adalead():
    df = _run(
        flexs.baselines.explorers.Adalead(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            seed=0,
        )
    )
    # model-score column populated for proposals
    assert df[df["round"] > 0]["model_score"].notna().all()


def test_adalead_respects_budget():
    model = FakeModel()
    explorer = flexs.baselines.explorers.Adalead(
        model,
        rounds=1,
        sequences_batch_size=BATCH,
        model_queries_per_batch=QUERIES,
        starting_sequence=START,
        alphabet=flexs.DNAA,
        seed=0,
    )
    landscape = FakeLandscape()
    explorer.run(landscape, verbose=False)
    # cost may exceed budget by at most one batch of roots
    assert model.cost <= QUERIES + BATCH


def test_adalead_improves_on_smooth_landscape():
    """On a smooth landscape with a perfect model, Adalead must climb."""

    class SmoothLandscape(flexs.Landscape):
        def __init__(self):
            super().__init__(name="Smooth")

        def _fitness_function(self, sequences):
            return np.array(
                [sum(c == "A" for c in s) / len(s) for s in sequences]
            )

    landscape = SmoothLandscape()
    model = flexs.LandscapeAsModel(landscape)
    explorer = flexs.baselines.explorers.Adalead(
        model,
        rounds=5,
        sequences_batch_size=10,
        model_queries_per_batch=200,
        starting_sequence="TTGCAGCA",
        alphabet=flexs.DNAA,
        seed=0,
    )
    df, _ = explorer.run(landscape, verbose=False)
    assert df["true_score"].max() >= 0.875  # near-optimal 8-mer reached
