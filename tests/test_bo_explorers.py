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


def test_bo_reaches_optimum_on_easy_landscape():
    """The batched chain walk climbs a smooth landscape with a perfect model."""

    class CountT(flexs.Landscape):
        def __init__(self):
            super().__init__(name="CountT")

        def _fitness_function(self, sequences):
            return np.array([sum(c == "T" for c in s) / len(s) for s in sequences])

    landscape = CountT()
    explorer = flexs.baselines.explorers.BO(
        flexs.LandscapeAsModel(landscape),
        rounds=5,
        sequences_batch_size=10,
        model_queries_per_batch=100,
        starting_sequence="GCAGCAGC",
        alphabet=flexs.DNAA,
        seed=0,
    )
    df, _ = explorer.run(landscape, verbose=False)
    assert df["true_score"].max() == 1.0  # finds TTTTTTTT


def test_gpr_bo_token_path_matches_string_path():
    """Device-token enumeration (VERDICT r1 #10) ranks exactly like strings."""

    class TokenModel(flexs.Model):
        """Deterministic model with both string and token paths."""

        def __init__(self):
            super().__init__(name="TokenModel")
            self.alpha = flexs.alphabet.Alphabet(flexs.DNAA)

        def train(self, *args):
            pass

        def fitness_from_tokens(self, tokens):
            # Arbitrary deterministic score: weighted token sum.
            w = np.arange(1, np.asarray(tokens).shape[1] + 1)
            return (np.asarray(tokens) * w).sum(axis=1).astype(np.float64)

        def _fitness_function(self, sequences):
            return self.fitness_from_tokens(self.alpha.encode(list(sequences)))

    def make(model):
        return flexs.baselines.explorers.GPR_BO(
            model,
            rounds=1,
            sequences_batch_size=3,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            seq_proposal_method="Greedy",
            seed=0,
        )

    token_model = TokenModel()
    ranked = make(token_model).propose_sequences_via_greedy()
    # Token path accounted the full enumerated space in cost
    # (fitness_from_tokens itself never increments cost; GPR_BO add_costs).
    assert token_model.cost == 4**4

    class StringOnly(TokenModel):
        def fitness_from_tokens(self, tokens):
            raise NotImplementedError

        def _fitness_function(self, sequences):
            return TokenModel.fitness_from_tokens(
                self, self.alpha.encode(list(sequences))
            )

    scores_str, seqs_str, tokens_str = make(
        StringOnly()
    ).propose_sequences_via_greedy()
    scores, seqs, tokens = ranked
    # Token path skips the full-space decode (seqs is None); both paths
    # agree on scores and on the token ordering.
    assert seqs is None and seqs_str is not None
    np.testing.assert_allclose(scores, scores_str)
    order, order_str = np.argsort(scores)[::-1], np.argsort(scores_str)[::-1]
    np.testing.assert_array_equal(tokens[order[:16]], tokens_str[order_str[:16]])


def test_ensemble_fitness_from_tokens_matches_strings():
    import flexs_tpu.baselines.models as models

    alpha = flexs.alphabet.Alphabet(flexs.DNAA)
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("TGCA"), 4)) for _ in range(20)]
    labels = rng.random(20)
    members = [
        models.LinearRegression(flexs.DNAA),
        models.RandomForest(flexs.DNAA, n_estimators=5, random_state=0),
    ]
    ens = flexs.Ensemble(members, combine_with=lambda x: x)
    ens.train(seqs, labels)
    by_string = ens.get_fitness(seqs)
    by_tokens = ens.fitness_from_tokens(alpha.encode(seqs))
    np.testing.assert_allclose(by_tokens, by_string, atol=1e-12)


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
    scores, seqs, tokens = explorer.propose_sequences_via_greedy()
    best = int(np.argmax(scores))
    best_seq = (
        seqs[best]
        if seqs is not None
        else explorer.alphabet.decode(tokens[best : best + 1])[0]
    )
    assert best_seq == "TTTT"
    assert scores[best] == 1.0
