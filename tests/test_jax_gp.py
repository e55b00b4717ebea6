"""Device GP / k-NN regressor tests (parity vs sklearn)."""
import numpy as np
import pytest

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.baselines.models.jax_gp import (
    JaxGaussianProcessRegressor,
    JaxKNNRegressor,
)

ALPHA = as_alphabet("TGCA")


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 4, size=(40, 8)).astype(np.int32)
    labels = rng.normal(size=40)
    queries = rng.integers(0, 4, size=(32, 8)).astype(np.int32)
    return tokens, labels, queries


def _one_hot(tokens):
    return np.eye(4)[tokens].reshape(len(tokens), -1)


def test_gp_matches_sklearn(data):
    from sklearn.gaussian_process import GaussianProcessRegressor

    tokens, labels, queries = data
    sk = GaussianProcessRegressor().fit(_one_hot(tokens), labels)
    sk_mu, sk_std = sk.predict(_one_hot(queries), return_std=True)

    gp = JaxGaussianProcessRegressor("TGCA")
    gp.train(ALPHA.decode(tokens), labels)
    mu = gp.fitness_from_tokens(queries)
    std = gp.fitness_std_from_tokens(queries)

    np.testing.assert_allclose(mu, sk_mu, atol=1e-4)
    np.testing.assert_allclose(std, sk_std, atol=1e-4)


def test_gp_interpolates_training_points(data):
    tokens, labels, _ = data
    gp = JaxGaussianProcessRegressor("TGCA")
    gp.train(ALPHA.decode(tokens), labels)
    # alpha=1e-10 jitter: the posterior interpolates the training labels.
    np.testing.assert_allclose(gp.fitness_from_tokens(tokens), labels, atol=1e-2)
    assert gp.fitness_std_from_tokens(tokens).max() < 0.1


def test_gp_string_api_and_guard(data):
    tokens, labels, queries = data
    gp = JaxGaussianProcessRegressor("TGCA")
    with pytest.raises(RuntimeError):
        gp.get_fitness(ALPHA.decode(queries[:2]))
    gp.train(ALPHA.decode(tokens), labels)
    via_str = gp.get_fitness(ALPHA.decode(queries))
    np.testing.assert_allclose(via_str, gp.fitness_from_tokens(queries), atol=1e-6)


def test_knn_matches_handwritten(data):
    tokens, labels, queries = data
    knn = JaxKNNRegressor("TGCA")
    knn.train(ALPHA.decode(tokens), labels)
    preds = knn.fitness_from_tokens(queries)

    dists = (queries[:, None, :] != tokens[None, :, :]).sum(-1)
    # Index-ordered tie-break: stable argsort over (distance, index).
    expected = np.array(
        [labels[np.argsort(d, kind="stable")[:5]].mean() for d in dists]
    )
    np.testing.assert_allclose(preds, expected, atol=1e-6)


def test_knn_matches_sklearn_on_tie_free_queries(data):
    from sklearn.neighbors import KNeighborsRegressor

    tokens, labels, queries = data
    sk = KNeighborsRegressor().fit(_one_hot(tokens), labels)
    sk_preds = sk.predict(_one_hot(queries))

    knn = JaxKNNRegressor("TGCA")
    knn.train(ALPHA.decode(tokens), labels)
    preds = knn.fitness_from_tokens(queries)

    # sklearn's argpartition leaves k-th-boundary tie order unspecified
    # (module docstring); compare only where the boundary is tie-free.
    dists = np.sort((queries[:, None, :] != tokens[None, :, :]).sum(-1), axis=1)
    tie_free = dists[:, 4] < dists[:, 5]
    assert tie_free.any()
    np.testing.assert_allclose(preds[tie_free], sk_preds[tie_free], atol=1e-6)


def test_knn_k_capped_by_train_size():
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 4, size=(3, 8)).astype(np.int32)
    labels = np.array([1.0, 2.0, 3.0])
    knn = JaxKNNRegressor("TGCA")
    knn.train(ALPHA.decode(tokens), labels)
    # k = min(5, 3): every prediction is the global mean.
    preds = knn.fitness_from_tokens(tokens)
    np.testing.assert_allclose(preds, labels.mean(), atol=1e-6)


def test_jax_members_in_dyna_ppo_ensemble(data):
    from flexs_tpu.baselines.explorers.dyna_ppo import DynaPPOEnsemble

    tokens, labels, queries = data
    ens = DynaPPOEnsemble(
        seq_len=8,
        alphabet="TGCA",
        models=[
            JaxGaussianProcessRegressor("TGCA"),
            JaxKNNRegressor("TGCA"),
        ],
    )
    ens.train(ALPHA.decode(tokens), labels)
    preds = ens.get_fitness(ALPHA.decode(queries))
    assert preds.shape == (len(queries),)
    assert np.isfinite(preds).all()


def test_bayesian_ridge_matches_sklearn(data):
    from sklearn.linear_model import BayesianRidge

    from flexs_tpu.baselines.models.jax_linear import JaxBayesianRidge

    tokens, _, queries = data
    rng = np.random.default_rng(3)
    true_w = rng.normal(size=(8, 4))
    labels = true_w[np.arange(8), tokens].sum(-1) + 0.1 * rng.normal(
        size=len(tokens)
    )
    sk = BayesianRidge().fit(_one_hot(tokens), labels)
    br = JaxBayesianRidge("TGCA")
    br.train(ALPHA.decode(tokens), labels)
    np.testing.assert_allclose(
        br.fitness_from_tokens(queries), sk.predict(_one_hot(queries)), atol=1e-4
    )


def test_lasso_matches_sklearn(data):
    from sklearn.linear_model import Lasso

    from flexs_tpu.baselines.models.jax_linear import JaxLasso  # noqa

    tokens, _, queries = data
    rng = np.random.default_rng(4)
    true_w = rng.normal(size=(8, 4))
    labels = true_w[np.arange(8), tokens].sum(-1) + 0.1 * rng.normal(
        size=len(tokens)
    )
    # Both solvers stop short of the exact optimum (sklearn's tol=1e-4
    # duality criterion; FISTA in f32), so fitted values agree to ~1e-3.
    for alpha in (1.0, 0.02):
        sk = Lasso(alpha=alpha).fit(_one_hot(tokens), labels)
        la = JaxLasso("TGCA", alpha=alpha)
        la.train(ALPHA.decode(tokens), labels)
        np.testing.assert_allclose(
            la.fitness_from_tokens(queries),
            sk.predict(_one_hot(queries)),
            atol=3e-3,
        )
        if alpha == 0.02:
            # Soft-thresholding actually exercised: sparse but nonzero.
            assert (np.abs(np.asarray(la._coef)) > 1e-8).any()


def test_tpu_native_default_ensemble(data):
    from flexs_tpu.baselines.explorers.dyna_ppo import DynaPPOEnsemble

    tokens, _, queries = data
    rng = np.random.default_rng(5)
    true_w = rng.normal(size=(8, 4))
    labels = true_w[np.arange(8), tokens].sum(-1)
    ens = DynaPPOEnsemble(seq_len=8, alphabet="TGCA", tpu_native_members=True)
    names = [m.name for m in ens.models]
    assert len(names) == 11
    for expected in (
        "linear_regression",
        "nearest_neighbors",
        "lasso",
        "bayesian_ridge",
        "gaussian_process",
        "random_forest",
        "gradient_boosting",
        "extra_trees",
    ):
        assert expected in names
    ens.train(ALPHA.decode(tokens), labels)
    preds = ens.get_fitness(ALPHA.decode(queries))
    assert np.isfinite(preds).all()
