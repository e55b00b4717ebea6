"""Host evaluator tests (reference flexs/evaluate.py semantics)."""
import numpy as np

import flexs_tpu as flexs


class FakeLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="FakeLandscape")
        self.rng = np.random.default_rng(0)

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


def _make_random(model, rounds=2, batch=5, queries=20):
    return flexs.baselines.explorers.Random(
        model,
        rounds=rounds,
        sequences_batch_size=batch,
        model_queries_per_batch=queries,
        starting_sequence="TTGCAGCA",
        alphabet=flexs.DNAA,
        seed=0,
    )


def test_robustness_sweeps_signal_strengths():
    results = flexs.evaluate.robustness(
        FakeLandscape(),
        make_explorer=lambda model, ss: _make_random(model),
        signal_strengths=[0.0, 1.0],
        verbose=False,
    )
    assert [ss for ss, _ in results] == [0.0, 1.0]
    for _, (df, meta) in results:
        assert df["round"].max() == 2
        assert meta["model_name"].startswith("NAMb_ss")


def test_efficiency_sweeps_budget_pairs():
    results = flexs.evaluate.efficiency(
        FakeLandscape(),
        make_explorer=lambda batch, queries: _make_random(
            flexs.baselines.models.NoisyAbstractModel(FakeLandscape(), seed=0),
            batch=batch,
            queries=queries,
        ),
        budgets=[(3, 10), (5, 20)],
    )
    assert [b for b, _ in results] == [(3, 10), (5, 20)]
    for (batch, _), (df, _) in results:
        assert len(df[df["round"] == 1]) <= batch


def test_adaptivity_splits_total_budget():
    seen = []

    def make(rounds, batch, queries):
        seen.append((rounds, batch, queries))
        return _make_random(
            flexs.baselines.models.NoisyAbstractModel(FakeLandscape(), seed=0),
            rounds=rounds,
            batch=batch,
            queries=queries,
        )

    flexs.evaluate.adaptivity(
        FakeLandscape(),
        make,
        num_rounds=[1, 2],
        total_ground_truth_measurements=10,
        total_model_queries=40,
    )
    assert seen == [(1, 10, 40), (2, 5, 20)]
