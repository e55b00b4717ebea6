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
