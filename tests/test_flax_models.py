"""Tests for the Flax/sklearn/linear surrogate models (M1).

Mirrors reference tests/test_models.py:36-115 (smoke get_fitness, adaptive
ensemble weight semantics, untrained-query errors) and adds what the
reference lacks: a learning-signal regression test (SURVEY.md §4).
"""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.baselines import models
from flexs_tpu.utils import sequence_utils as s_utils

DNA = flexs.DNAA


def _dataset(n=64, length=8, seed=0):
    rng = np.random.default_rng(seed)
    seqs = s_utils.generate_random_sequences(length, n, DNA, rng=rng)
    seqs = list(dict.fromkeys(seqs))
    labels = np.array([sum(c == "A" for c in s) / len(s) for s in seqs])
    return seqs, labels


@pytest.mark.parametrize(
    "make",
    [
        lambda: models.CNN(8, num_filters=8, hidden_size=16, alphabet=DNA),
        lambda: models.MLP(8, hidden_size=16, alphabet=DNA),
        lambda: models.GlobalEpistasisModel(8, hidden_size=16, alphabet=DNA),
    ],
)
def test_flax_models_smoke(make):
    model = make()
    seqs, labels = _dataset(32)
    model.train(seqs, labels)
    preds = model.get_fitness(seqs)
    assert preds.shape == (len(seqs),)
    assert np.isfinite(preds).all()
    assert model.cost == len(seqs)


def test_mlp_learns_additive_signal():
    # fraction-of-A is linear in one-hot features; the MLP must fit it.
    model = models.MLP(8, hidden_size=32, alphabet=DNA, epochs=80, seed=0)
    seqs, labels = _dataset(200, seed=1)
    model.train(seqs, labels)
    preds = model.get_fitness(seqs)
    corr = np.corrcoef(preds, labels)[0, 1]
    assert corr > 0.9


def test_flax_model_warm_start_progresses():
    model = models.MLP(8, hidden_size=16, alphabet=DNA, epochs=5, seed=0)
    seqs, labels = _dataset(64)
    model.train(seqs, labels)
    first = np.mean((model.get_fitness(seqs) - labels) ** 2)
    for _ in range(5):
        model.train(seqs, labels)
    second = np.mean((model.get_fitness(seqs) - labels) ** 2)
    assert second < first


def test_flax_model_odd_batch_sizes_no_error():
    model = models.MLP(8, hidden_size=8, alphabet=DNA, epochs=1, batch_size=16)
    seqs, labels = _dataset(37)
    model.train(seqs, labels)
    assert model.get_fitness(seqs[:5]).shape == (5,)
    assert model.get_fitness(seqs[:1]).shape == (1,)


def test_jax_ridge_exact_on_linear_target():
    model = models.JaxRidgeRegression(DNA)
    seqs, labels = _dataset(100, seed=2)
    model.train(seqs, labels)
    preds = model.get_fitness(seqs)
    np.testing.assert_allclose(preds, labels, atol=1e-2)


def test_jax_ridge_untrained_raises():
    model = models.JaxRidgeRegression(DNA)
    with pytest.raises(RuntimeError):
        model.get_fitness(["ACGT" * 2])


def test_sklearn_models_smoke():
    seqs, labels = _dataset(50, seed=3)
    for model in [
        models.LinearRegression(DNA),
        models.RandomForest(DNA, n_estimators=5),
    ]:
        model.train(seqs, labels)
        preds = model.get_fitness(seqs)
        assert preds.shape == (len(seqs),)


def test_sklearn_untrained_raises():
    from sklearn.exceptions import NotFittedError

    model = models.LinearRegression(DNA)
    with pytest.raises(NotFittedError):
        model.get_fitness(["ACGTACGT"])


def test_adaptive_ensemble_weights_normalized():
    seqs, labels = _dataset(64, seed=4)
    ens = models.AdaptiveEnsemble(
        models=[models.JaxRidgeRegression(DNA), models.LinearRegression(DNA)],
        seed=0,
    )
    assert np.isclose(ens.weights.sum(), 1)
    ens.train(seqs, labels)
    assert np.isclose(ens.weights.sum(), 1)
    preds = ens.get_fitness(seqs[:10])
    assert preds.shape == (10,)


def test_adaptive_ensemble_skips_reweight_below_ten_samples():
    seqs, labels = _dataset(8, seed=5)
    ens = models.AdaptiveEnsemble(
        models=[models.JaxRidgeRegression(DNA), models.JaxRidgeRegression(DNA, 1.0)],
        seed=0,
    )
    before = ens.weights.copy()
    ens.train(seqs[:8], labels[:8])
    np.testing.assert_array_equal(ens.weights, before)


def test_r2_weights_prefers_better_model():
    labels = np.linspace(0, 1, 50)
    good = labels + 0.01 * np.random.default_rng(0).normal(size=50)
    bad = np.random.default_rng(1).normal(size=50)
    w = models.r2_weights(np.stack([good, bad]), labels)
    assert w[0] > 0.9


def test_custom_train_and_predict_functions():
    """Reference keras_model.py:33-38 API: user-supplied train/predict."""
    calls = {"train": 0}

    def custom_train(one_hots, labels):
        calls["train"] += 1
        assert one_hots.ndim == 3 and len(labels) == one_hots.shape[0]

    def custom_predict(one_hots):
        return np.full(one_hots.shape[0], 0.25)

    model = models.FlaxModel(
        module=None,  # never touched when both overrides are supplied
        alphabet=DNA,
        name="custom",
        custom_train_function=custom_train,
        custom_predict_function=custom_predict,
    )
    seqs, labels = _dataset(8)
    model.train(seqs, labels)
    assert calls["train"] == 1
    np.testing.assert_allclose(model.get_fitness(seqs[:3]), [0.25] * 3)
