"""Device-side Gaussian-process and k-NN regressors.

The reference's DynaPPO ensemble (reference baselines/explorers/dyna_ppo.py
:51-85) includes sklearn's `GaussianProcessRegressor()` and
`KNeighborsRegressor()` fit on flattened one-hot encodings.  Both are exact
kernel methods over pairwise sequence distances, and for fixed-length token
sequences the squared Euclidean distance between one-hot encodings is
exactly `2 * hamming(x, y)` — so the entire computation factors through a
batched Hamming-distance matrix, which is native TPU VPU work, plus a
Cholesky factorization on the MXU.  These JAX equivalents keep every train
and predict step on device.

Parity notes:
  * `JaxGaussianProcessRegressor` mirrors sklearn's default
    `ConstantKernel(1.0) * RBF(1.0)` kernel with `alpha=1e-10` jitter
    (plus a 1e-8 f32-Cholesky stabilizer, documented in `_fit_gp`) and
    `normalize_y=False`, maximizing the log marginal likelihood over
    (log constant, log length_scale) from the same (0, 0) start.
    Documented deviation: the optimizer is 150 Adam steps on the
    unbounded log-parameters instead of sklearn's L-BFGS-B clipped to
    [1e-5, 1e5]; interior optima agree, bound-hitting cases may not.
  * `JaxKNNRegressor` mirrors sklearn's `KNeighborsRegressor()` defaults
    (k=5, uniform weights).  Distance ties at the k-th neighbor are broken
    by training-set index order; sklearn's argpartition backend leaves tie
    order unspecified, so predictions can differ only on exact ties.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.model import Model
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.types import SEQUENCES_TYPE


def _hamming(a, b):
    """Pairwise Hamming distances int32[N, M] of token arrays [N,L], [M,L]."""
    return jnp.sum(a[:, None, :] != b[None, :, :], axis=-1).astype(jnp.float32)


def _kernel(d2, log_c, log_l):
    """ConstantKernel * RBF over squared distances (sklearn's default)."""
    return jnp.exp(log_c) * jnp.exp(-0.5 * d2 / jnp.exp(2.0 * log_l))


def gp_fit(tokens, labels, valid, opt_steps: int = 150):
    """Maximize the log marginal likelihood; return (theta, dual, chol).

    Pure function (safe to call inside an outer jit/scan, e.g. the fused
    runners' in-program GP surrogate — runtime/surrogate.py arch="gp").
    Padded rows (valid=False) are decoupled: their kernel rows are zeroed
    and their diagonal set to 1, so they contribute a constant to the LML
    and exactly zero to the posterior.
    """
    n = tokens.shape[0]
    d2 = 2.0 * _hamming(tokens, tokens)
    y = jnp.where(valid, labels, 0.0)
    outer = valid[:, None] & valid[None, :]
    eye = jnp.eye(n, dtype=jnp.float32)

    def build_k(theta):
        k = _kernel(d2, theta[0], theta[1])
        k = jnp.where(outer, k, 0.0)
        # alpha=1e-10 is sklearn's default; the extra 1e-8 stabilizes the
        # f32 Cholesky (sklearn factorizes in f64) — documented deviation:
        # effective diagonal noise is ~1e-8, visible only for
        # near-duplicate training rows at tiny label scales.
        jitter = jnp.where(valid, 1e-10, 1.0)
        return k + jnp.diag(jitter) + 1e-8 * eye

    def neg_lml(theta):
        k = build_k(theta)
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), y)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return 0.5 * jnp.dot(y, alpha) + 0.5 * logdet

    # Adam on the 2-D smooth LML surface (jax.scipy.optimize was removed
    # upstream; 150 steps from sklearn's (0, 0) start lands on the same
    # interior optimum).  Tracks the best-seen point, so a diverged tail
    # cannot worsen the fit.
    opt = optax.adam(0.1)
    grad_fn = jax.value_and_grad(neg_lml)

    def opt_step(carry, _):
        theta, opt_state, best_theta, best_val = carry
        val, g = grad_fn(theta)
        better = jnp.isfinite(val) & (val < best_val)
        best_theta = jnp.where(better, theta, best_theta)
        best_val = jnp.where(better, val, best_val)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state, best_theta, best_val), None

    theta0 = jnp.zeros(2, jnp.float32)
    (_, _, theta, _), _ = jax.lax.scan(
        opt_step,
        (theta0, opt.init(theta0), theta0, neg_lml(theta0)),
        None,
        length=opt_steps,
    )
    k = build_k(theta)
    chol = jnp.linalg.cholesky(k)
    dual = jax.scipy.linalg.cho_solve((chol, True), y)
    return theta, dual, chol


_fit_gp = jax.jit(gp_fit, static_argnames="opt_steps")


def gp_posterior(tokens, train_tokens, theta, dual, chol, valid):
    """Posterior mean and std at `tokens` given the fitted factorization.

    Pure (reused by the fused in-program GP surrogate)."""
    d2 = 2.0 * _hamming(tokens, train_tokens)
    k_star = jnp.where(valid[None, :], _kernel(d2, theta[0], theta[1]), 0.0)
    mu = k_star @ dual
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = jnp.exp(theta[0]) - jnp.sum(v * v, axis=0)
    return mu, jnp.sqrt(jnp.maximum(var, 0.0))


_gp_predict = jax.jit(gp_posterior)


class JaxGaussianProcessRegressor(Model):
    """Exact GP regression on device (RBF kernel over token Hamming)."""

    def __init__(self, alphabet: str, name: Optional[str] = None):
        """Create a GP with sklearn's default kernel form."""
        super().__init__(name or "gaussian_process")
        self.alphabet = as_alphabet(alphabet)
        self._state = None

    def train(self, sequences: SEQUENCES_TYPE, labels):
        """Fit kernel hyperparameters + dual coefficients in one device call."""
        tokens = self.alphabet.encode(list(sequences))
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        padded = jnp.asarray(pad_rows(tokens, bucket))
        y = jnp.asarray(pad_rows(np.asarray(labels, np.float32), bucket))
        valid = jnp.arange(bucket) < n
        theta, dual, chol = _fit_gp(padded, y, valid)
        self._state = (padded, theta, dual, chol, valid)

    def _posterior_from_tokens(self, tokens):
        if self._state is None:
            raise RuntimeError(f"{self.name} queried before train()")
        train_tokens, theta, dual, chol, valid = self._state
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        mu, std = _gp_predict(
            jnp.asarray(pad_rows(np.asarray(tokens), bucket)),
            train_tokens,
            theta,
            dual,
            chol,
            valid,
        )
        return np.asarray(mu[:n], np.float64), np.asarray(std[:n], np.float64)

    def fitness_from_tokens(self, tokens) -> np.ndarray:
        """Token fast path: posterior mean."""
        return self._posterior_from_tokens(tokens)[0]

    def fitness_std_from_tokens(self, tokens) -> np.ndarray:
        """Posterior standard deviation (a real GP sigma, unlike the
        reference's ensemble-spread proxy — reference bo.py:318-319)."""
        return self._posterior_from_tokens(tokens)[1]

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        return self.fitness_from_tokens(self.alphabet.encode(list(sequences)))


@partial(jax.jit, static_argnames=("k",))
def _knn_predict(tokens, train_tokens, train_labels, valid, k: int):
    n = train_tokens.shape[0]
    dists = jnp.sum(
        tokens[:, None, :] != train_tokens[None, :, :], axis=-1
    ).astype(jnp.int32)
    # Index-ordered tie-break: scale distances so the train index is the
    # low-order digit, then take the k smallest.  Integer keys stay exact
    # (max key = L*(n+1)+n < 2^31); a float32 key would lose exactness
    # past 2^24 and silently corrupt neighbor selection.
    keyed = jnp.where(
        valid[None, :], dists * (n + 1) + jnp.arange(n), jnp.iinfo(jnp.int32).max
    )
    _, idx = jax.lax.top_k(-keyed, k)
    return jnp.mean(train_labels[idx], axis=1)


class JaxKNNRegressor(Model):
    """k-nearest-neighbors regression on device (Hamming metric)."""

    def __init__(self, alphabet: str, n_neighbors: int = 5,
                 name: Optional[str] = None):
        """Create a k-NN regressor (sklearn defaults: k=5, uniform)."""
        super().__init__(name or "nearest_neighbors")
        self.alphabet = as_alphabet(alphabet)
        self.n_neighbors = n_neighbors
        self._state = None

    def train(self, sequences: SEQUENCES_TYPE, labels):
        """Store the training set as device token/label buffers."""
        tokens = self.alphabet.encode(list(sequences))
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        self._state = (
            jnp.asarray(pad_rows(tokens, bucket)),
            jnp.asarray(pad_rows(np.asarray(labels, np.float32), bucket)),
            jnp.arange(bucket) < n,
            min(self.n_neighbors, n),
        )

    def fitness_from_tokens(self, tokens) -> np.ndarray:
        """Token fast path: mean of the k nearest training labels."""
        if self._state is None:
            raise RuntimeError(f"{self.name} queried before train()")
        train_tokens, train_labels, valid, k = self._state
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        preds = _knn_predict(
            jnp.asarray(pad_rows(np.asarray(tokens), bucket)),
            train_tokens,
            train_labels,
            valid,
            k,
        )
        return np.asarray(preds[:n], np.float64)

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        return self.fitness_from_tokens(self.alphabet.encode(list(sequences)))
