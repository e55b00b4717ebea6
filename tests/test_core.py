"""Core framework tests: alphabet codecs, cost accounting, run loop, logging.

Modeled on the reference's FakeModel/FakeLandscape pattern
(tests/test_explorers.py:7-33) plus golden-schema checks the reference lacks.
"""
import json

import numpy as np
import pandas as pd
import pytest

import flexs_tpu as flexs
from flexs_tpu.utils import sequence_utils as s_utils


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


def test_alphabet_roundtrip():
    alpha = flexs.Alphabet(flexs.DNAA)
    seqs = ["TGCA", "AAAA", "CGCG"]
    tokens = alpha.encode(seqs)
    assert tokens.shape == (3, 4)
    assert (tokens[0] == np.arange(4)).all()
    assert alpha.decode(tokens) == seqs


def test_alphabet_rejects_bad_chars():
    alpha = flexs.Alphabet(flexs.DNAA)
    with pytest.raises(ValueError):
        alpha.encode(["TGCX"])


def test_one_hot_roundtrip():
    oh = s_utils.string_to_one_hot("UGCA", "UGCA")
    assert oh.shape == (4, 4)
    assert (oh == np.eye(4)).all()
    assert s_utils.one_hot_to_string(oh, "UGCA") == "UGCA"


def test_generate_single_mutants():
    muts = s_utils.generate_single_mutants("AA", "AB")
    assert muts[0] == "AA"
    assert len(muts) == 1 + 2 * 2


def test_random_mutant_rate():
    rng = np.random.default_rng(0)
    mutated = [
        s_utils.generate_random_mutant("A" * 100, 0.5, "AC", rng=rng)
        for _ in range(50)
    ]
    frac = np.mean([sum(c == "C" for c in m) / 100 for m in mutated])
    assert 0.15 < frac < 0.35  # 0.5 mutation rate * 0.5 chance of new char


def test_cost_accounting():
    landscape = FakeLandscape()
    landscape.get_fitness(["AAA", "CCC"])
    landscape.get_fitness(["GGG"])
    assert landscape.cost == 3


def test_run_loop_schema(tmp_path):
    log_file = str(tmp_path / "log.csv")
    model = FakeModel()
    explorer = flexs.baselines.explorers.Random(
        model,
        rounds=3,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence="TTGCAGCA",
        alphabet=flexs.DNAA,
        seed=0,
        log_file=log_file,
    )
    landscape = FakeLandscape()
    df, metadata = explorer.run(landscape, verbose=False)

    # Measured-data schema (reference explorer.py:140-181).
    assert list(df.columns) == [
        "sequence",
        "model_score",
        "true_score",
        "round",
        "model_cost",
        "measurement_cost",
    ]
    assert df["round"].max() == 3
    round0 = df[df["round"] == 0]
    assert len(round0) == 1
    assert np.isnan(round0["model_score"]).all()
    assert len(df) == 1 + 3 * 5

    # Model cost resets per run and respects the query budget per round.
    assert metadata["rounds"] == 3
    per_round_cost = df.groupby("round")["model_cost"].max().to_numpy()
    assert per_round_cost[0] == 0
    assert (np.diff(per_round_cost) >= 0).all()

    # Log format: one JSON metadata line then the CSV (explorer.py:92-113).
    with open(log_file) as f:
        meta_line = f.readline()
        parsed = json.loads(meta_line)
        assert parsed["exp_name"] == explorer.name
        logged = pd.read_csv(f)
    assert len(logged) == len(df)


def test_landscape_as_model_no_double_count():
    landscape = FakeLandscape()
    model = flexs.LandscapeAsModel(landscape)
    model.get_fitness(["AAAA"])
    assert model.cost == 1
    assert landscape.cost == 0  # inner _fitness_function called directly


def test_ensemble_combines():
    class Const(flexs.Landscape):
        def __init__(self, v):
            super().__init__(name=f"c{v}")
            self.v = v

        def _fitness_function(self, sequences):
            return np.full(len(sequences), self.v)

    ens = flexs.Ensemble([Const(0.0), Const(1.0)])
    assert ens.name == "Ens(c0.0|c1.0)"
    np.testing.assert_allclose(ens.get_fitness(["AA", "CC"]), [0.5, 0.5])

    identity = flexs.Ensemble([Const(0.0), Const(1.0)], combine_with=lambda x: x)
    assert identity.get_fitness(["AA"]).shape == (1, 2)
