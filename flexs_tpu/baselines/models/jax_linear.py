"""Closed-form linear models solved on device.

The reference's linear members come from sklearn (sklearn_models.py:67-91)
and run on the host.  These equivalents solve the normal equations on the
TPU in one shot — an MXU-shaped X^T X contraction plus a Cholesky solve —
so they compose with fully on-device sweeps (no host round trip per round).
Ridge regularization (lambda=0 recovers ordinary least squares up to the
jitter needed for a stable factorization).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.model import Model
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.types import SEQUENCES_TYPE


@partial(jax.jit, static_argnames=("alphabet_size",))
def _fit_ridge(tokens, labels, weight, lam, alphabet_size: int):
    """Weighted ridge solution over flattened one-hot features (+ bias)."""
    x = jax.nn.one_hot(tokens, alphabet_size, dtype=jnp.float32)
    x = x.reshape(x.shape[0], -1)
    x = jnp.concatenate([x, jnp.ones((x.shape[0], 1), jnp.float32)], axis=1)
    xw = x * weight[:, None]
    gram = jnp.dot(xw.T, x, preferred_element_type=jnp.float32)
    rhs = jnp.dot(xw.T, labels, preferred_element_type=jnp.float32)
    # One-hot blocks are collinear with the bias column, so the Gram matrix
    # is rank-deficient at lam=0; solve through an eigh pseudo-inverse
    # (minimum-norm solution) instead of a Cholesky factorization.
    s, v = jnp.linalg.eigh(gram)
    tol = 1e-6 * jnp.max(s)
    inv_s = jnp.where(s + lam > tol, 1.0 / (s + lam), 0.0)
    return v @ (inv_s * (v.T @ rhs))


@partial(jax.jit, static_argnames=("alphabet_size",))
def _predict_linear(tokens, coef, alphabet_size: int):
    x = jax.nn.one_hot(tokens, alphabet_size, dtype=jnp.float32)
    x = x.reshape(x.shape[0], -1)
    x = jnp.concatenate([x, jnp.ones((x.shape[0], 1), jnp.float32)], axis=1)
    return jnp.dot(x, coef, preferred_element_type=jnp.float32)


class JaxRidgeRegression(Model):
    """Device-side (weighted) ridge regression over one-hot features."""

    def __init__(self, alphabet: str, alpha: float = 0.0, name: Optional[str] = None):
        """Create a ridge model; `alpha=0` is ordinary least squares."""
        super().__init__(name or f"jax_ridge_alpha={alpha}")
        self.alphabet = as_alphabet(alphabet)
        self.alpha = alpha
        self._coef = None

    def train(self, sequences: SEQUENCES_TYPE, labels):
        """Solve the normal equations for the measured set in one device call."""
        tokens = self.alphabet.encode(list(sequences))
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        self._coef = _fit_ridge(
            jnp.asarray(pad_rows(tokens, bucket)),
            jnp.asarray(pad_rows(np.asarray(labels, np.float32), bucket)),
            jnp.asarray(pad_rows(np.ones(n, np.float32), bucket)),
            jnp.float32(self.alpha),
            len(self.alphabet),
        )

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        if self._coef is None:
            raise RuntimeError(f"{self.name} queried before train()")
        tokens = self.alphabet.encode(list(sequences))
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        preds = _predict_linear(
            jnp.asarray(pad_rows(tokens, bucket)), self._coef, len(self.alphabet)
        )
        return np.asarray(preds[:n], dtype=np.float64)


@partial(jax.jit, static_argnames=("alphabet_size",))
def _fit_bayesian_ridge(tokens, labels, valid, alphabet_size: int):
    """sklearn BayesianRidge's evidence-maximization fit, on device.

    Mirrors sklearn.linear_model.BayesianRidge defaults exactly: centered
    X and y (fit_intercept), hyperpriors alpha_1=alpha_2=lambda_1=lambda_2
    =1e-6, 300 iterations max with tol=1e-3 on the coefficient change (a
    converged state is carried through remaining scan steps unchanged).
    Factorizes X once by SVD; each iteration is a diagonal reweighting.
    """
    x = jax.nn.one_hot(tokens, alphabet_size, dtype=jnp.float32)
    x = x.reshape(x.shape[0], -1)
    w = valid.astype(jnp.float32)
    n = jnp.sum(w)
    x_mean = jnp.sum(x * w[:, None], axis=0) / n
    y_mean = jnp.sum(labels * w) / n
    xc = (x - x_mean) * w[:, None]
    yc = (labels - y_mean) * w

    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    uty = u.T @ yc
    s2 = s * s
    eps = jnp.finfo(jnp.float32).eps
    y_var = jnp.maximum(jnp.sum(yc * yc) / n, eps)
    a1 = a2 = l1 = l2 = 1e-6

    def iterate(carry, _):
        alpha_, lambda_, coef, done = carry
        scale = s / (s2 + lambda_ / alpha_)
        new_coef = vt.T @ (scale * uty)
        gamma = jnp.sum((alpha_ * s2) / (lambda_ + alpha_ * s2))
        resid = yc - xc @ new_coef
        rmse = jnp.sum(resid * resid)
        new_lambda = (gamma + 2 * l1) / (jnp.sum(new_coef * new_coef) + 2 * l2)
        new_alpha = (n - gamma + 2 * a1) / (rmse + 2 * a2)
        converged = jnp.sum(jnp.abs(new_coef - coef)) < 1e-3
        keep = done
        carry = (
            jnp.where(keep, alpha_, new_alpha),
            jnp.where(keep, lambda_, new_lambda),
            jnp.where(keep, coef, new_coef),
            done | converged,
        )
        return carry, None

    init = (1.0 / y_var, jnp.float32(1.0), jnp.zeros(x.shape[1], jnp.float32),
            jnp.asarray(False))
    (alpha_, lambda_, coef, _), _ = jax.lax.scan(iterate, init, None, length=300)
    # Final coefficient refresh at the converged hyperparameters (sklearn
    # recomputes coef_ after the loop).
    scale = s / (s2 + lambda_ / alpha_)
    coef = vt.T @ (scale * uty)
    intercept = y_mean - jnp.dot(x_mean, coef)
    return coef, intercept


@partial(jax.jit, static_argnames=("alphabet_size", "iters"))
def _fit_lasso_fista(tokens, labels, valid, alpha, alphabet_size: int,
                     iters: int = 1000):
    """Lasso via FISTA: objective 1/(2n)||y - Xw||^2 + alpha ||w||_1.

    sklearn's Lasso solves the same convex objective with coordinate
    descent; with collinear one-hot columns the minimizing `w` may be
    non-unique but the fitted values Xw are, so predictions match.
    Centered X and y (fit_intercept=True default).
    """
    x = jax.nn.one_hot(tokens, alphabet_size, dtype=jnp.float32)
    x = x.reshape(x.shape[0], -1)
    w = valid.astype(jnp.float32)
    n = jnp.sum(w)
    x_mean = jnp.sum(x * w[:, None], axis=0) / n
    y_mean = jnp.sum(labels * w) / n
    xc = (x - x_mean) * w[:, None]
    yc = (labels - y_mean) * w

    gram = xc.T @ xc
    # Lipschitz constant of the gradient: largest eigenvalue of gram / n.
    lip = jnp.linalg.eigvalsh(gram)[-1] / n + 1e-6
    xty = xc.T @ yc

    def soft(z, t):
        return jnp.sign(z) * jnp.maximum(jnp.abs(z) - t, 0.0)

    def step(carry, _):
        coef, z, t = carry
        grad = (gram @ z - xty) / n
        new_coef = soft(z - grad / lip, alpha / lip)
        new_t = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        new_z = new_coef + ((t - 1.0) / new_t) * (new_coef - coef)
        return (new_coef, new_z, new_t), None

    p = x.shape[1]
    init = (jnp.zeros(p, jnp.float32), jnp.zeros(p, jnp.float32),
            jnp.float32(1.0))
    (coef, _, _), _ = jax.lax.scan(step, init, None, length=iters)
    intercept = y_mean - jnp.dot(x_mean, coef)
    return coef, intercept


class _FittedLinear(Model):
    """Shared predict path for device linear models fit as (coef, intercept)."""

    def __init__(self, alphabet, name):
        super().__init__(name)
        self.alphabet = as_alphabet(alphabet)
        self._coef = None
        self._intercept = 0.0

    def _predict_tokens(self, tokens):
        if self._coef is None:
            raise RuntimeError(f"{self.name} queried before train()")
        tokens = np.asarray(tokens)
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        preds = _predict_linear(
            jnp.asarray(pad_rows(tokens, bucket)),
            jnp.concatenate([self._coef, jnp.zeros(1, jnp.float32)]),
            len(self.alphabet),
        )
        return np.asarray(preds[:n], np.float64) + float(self._intercept)

    def fitness_from_tokens(self, tokens) -> np.ndarray:
        """Token fast path (no string round-trip)."""
        return self._predict_tokens(tokens)

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        return self._predict_tokens(self.alphabet.encode(list(sequences)))

    def _padded_train_args(self, sequences, labels):
        tokens = self.alphabet.encode(list(sequences))
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        return (
            jnp.asarray(pad_rows(tokens, bucket)),
            jnp.asarray(pad_rows(np.asarray(labels, np.float32), bucket)),
            jnp.arange(bucket) < n,
        )


class JaxBayesianRidge(_FittedLinear):
    """Device BayesianRidge (sklearn's evidence-maximization defaults)."""

    def __init__(self, alphabet: str, name: Optional[str] = None):
        """Create a Bayesian ridge model."""
        super().__init__(alphabet, name or "bayesian_ridge")

    def train(self, sequences: SEQUENCES_TYPE, labels):
        """Run the full evidence iteration in one device call."""
        toks, y, valid = self._padded_train_args(sequences, labels)
        self._coef, self._intercept = _fit_bayesian_ridge(
            toks, y, valid, len(self.alphabet)
        )


class JaxLasso(_FittedLinear):
    """Device Lasso (FISTA on sklearn's objective; alpha=1.0 default)."""

    def __init__(self, alphabet: str, alpha: float = 1.0,
                 name: Optional[str] = None):
        """Create a Lasso model (`alpha` as in sklearn.linear_model.Lasso)."""
        super().__init__(alphabet, name or "lasso")
        self.alpha = alpha

    def train(self, sequences: SEQUENCES_TYPE, labels):
        """Run FISTA to the sklearn Lasso optimum in one device call."""
        toks, y, valid = self._padded_train_args(sequences, labels)
        self._coef, self._intercept = _fit_lasso_fista(
            toks, y, valid, jnp.float32(self.alpha), len(self.alphabet)
        )
