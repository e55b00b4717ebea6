"""Tests for BO and GPR_BO explorers (reference test_explorers.py:36-67)."""
import numpy as np

import flexs_tpu as flexs

ROUNDS = 3
BATCH = 5
QUERIES = 20
START = "TTGC"  # 4-mer keeps GPR_BO's 4^4 enumeration fast


class FakeModel(flexs.Model):
    def __init__(self):
        super().__init__(name="FakeModel")
        self.rng = np.random.default_rng(1)

    def train(self, *args):
        pass

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


class FakeLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="FakeLandscape")
        self.rng = np.random.default_rng(0)

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


def test_bo_smoke():
    explorer = flexs.baselines.explorers.BO(
        FakeModel(),
        rounds=ROUNDS,
        sequences_batch_size=BATCH,
        model_queries_per_batch=QUERIES,
        starting_sequence=START,
        alphabet=flexs.DNAA,
        seed=0,
    )
    df, _ = explorer.run(FakeLandscape(), verbose=False)
    assert df["round"].max() == ROUNDS
    # BO pads with randoms, so every round proposes a full batch.
    for r in range(1, ROUNDS + 1):
        assert 0 < len(df[df["round"] == r]) <= BATCH


def test_bo_wraps_model_in_identity_ensemble():
    model = FakeModel()
    explorer = flexs.baselines.explorers.BO(
        model,
        rounds=1,
        sequences_batch_size=BATCH,
        model_queries_per_batch=QUERIES,
        starting_sequence=START,
        alphabet=flexs.DNAA,
        seed=0,
    )
    assert isinstance(explorer.model, flexs.Ensemble)
    preds = explorer.model.get_fitness([START, "AAAA"])
    assert preds.shape == (2, 1)


def test_gpr_bo_smoke_and_proposes_unmeasured():
    explorer = flexs.baselines.explorers.GPR_BO(
        FakeModel(),
        rounds=2,
        sequences_batch_size=BATCH,
        model_queries_per_batch=QUERIES,
        starting_sequence=START,
        alphabet=flexs.DNAA,
        seed=0,
    )
    df, _ = explorer.run(FakeLandscape(), verbose=False)
    assert df["round"].max() == 2
    assert df["sequence"].is_unique


def test_gpr_bo_greedy_ranks_by_mean():
    class ConstantAModel(flexs.Model):
        """Fitness = fraction of 'T's (deterministic)."""

        def __init__(self):
            super().__init__(name="CountT")

        def train(self, *args):
            pass

        def _fitness_function(self, sequences):
            return np.array([sum(c == "T" for c in s) / len(s) for s in sequences])

    explorer = flexs.baselines.explorers.GPR_BO(
        ConstantAModel(),
        rounds=1,
        sequences_batch_size=3,
        model_queries_per_batch=QUERIES,
        starting_sequence=START,
        alphabet=flexs.DNAA,
        seq_proposal_method="Greedy",
        seed=0,
    )
    ranked = explorer.propose_sequences_via_greedy()
    assert ranked[0][1] == "TTTT"
    assert ranked[0][0] == 1.0
