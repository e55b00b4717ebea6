"""Device tree-ensemble regressors for the DynaPPO default ensemble.

The reference's DynaPPO ensemble keeps three sklearn tree members —
RandomForestRegressor, GradientBoostingRegressor, ExtraTreeRegressor
(reference dyna_ppo.py:57-85) — which were the last non-device compute in
a default-config experiment (VERDICT r2 missing #4).  These JAX
equivalents exploit the models' input encoding: features are FLATTENED
ONE-HOT columns (sklearn_models.py flattens to [N, L*A] 0/1 matrices), so
every split threshold is 0.5 and exact greedy split-finding reduces to
per-feature gradient histograms computed by ONE MXU matmul per tree
level:

    G[node, feature] = node_onehot[N, nodes]^T @ (residual[:, None] * X)

Trees are depth-capped, dense, level-wise (node k's children are 2k+1 and
2k+2), built entirely under jit and vmapped across trees; prediction
routes all samples down the dense tree with `depth` gathers.

Parity notes vs sklearn (documented deviations — agreement is pinned
statistically in tests/test_jax_trees.py, not bitwise):
  * sklearn grows depth-unbounded trees; these cap depth (forest 10,
    boosting 3 = sklearn's own max_depth default).  On 0/1 features a
    depth-10 tree separates up to 1024 regions — past the saturation
    point for the data sizes DynaPPO trains on.
  * sklearn's ExtraTreeRegressor draws a uniform split threshold per
    feature — on 0/1 features every threshold in (0, 1) is equivalent to
    0.5, so the "random-threshold" tree degenerates to the exact greedy
    tree implemented here.
  * RandomForest bootstraps per tree (multinomial counts as sample
    weights, like sklearn); GradientBoosting uses the mean-init +
    learning_rate * tree(residual) recursion with sklearn's defaults
    (100 rounds, lr 0.1, depth 3).
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


def _grow_tree(X, resid, w, depth: int):
    """Fit one depth-`depth` dense regression tree on weighted residuals.

    Args:
        X: f32[N, F] 0/1 features.
        resid: f32[N] targets (residuals).
        w: f32[N] sample weights (0 = padding / out-of-bag).
        depth: static tree depth.

    Returns:
        (feat int32[2^depth - 1], leaf f32[2^depth]): split feature per
        internal node (dense heap layout) and leaf values.
    """
    n, f = X.shape
    n_internal = 2 ** depth - 1
    n_nodes = 2 ** depth  # static per-level upper bound; 2^level live
    feat = jnp.zeros((n_internal,), jnp.int32)
    node = jnp.zeros((n,), jnp.int32)  # level-local node id per sample

    wy = resid * w
    eps = 1e-12
    root_val = jnp.sum(wy) / jnp.maximum(jnp.sum(w), eps)
    # Level-local node values; start every slot at the root mean so empty
    # nodes inherit their deepest non-empty ancestor's mean (an unseen
    # input routed there at predict time gets the ancestor prediction,
    # like an unexpanded sklearn node).
    val = jnp.full((n_nodes,), root_val, jnp.float32)

    def level_step(level, carry):
        feat, node, val = carry
        node_oh = jax.nn.one_hot(node, n_nodes, dtype=jnp.float32)
        # Histograms via MXU: sums of w*y and w per (node, feature==1).
        G1 = node_oh.T @ (wy[:, None] * X)  # [nodes, F]
        H1 = node_oh.T @ (w[:, None] * X)
        G = node_oh.T @ wy[:, None]  # [nodes, 1]
        H = node_oh.T @ w[:, None]

        G0 = G - G1
        H0 = H - H1
        # Split gain for squared error: sum of child S^2/n minus parent's.
        gain = (
            jnp.square(G1) / (H1 + eps)
            + jnp.square(G0) / (H0 + eps)
            - jnp.square(G) / (H + eps)
        )
        # A split is valid only if both children receive samples.
        valid = (H1 > 0) & (H0 > 0)
        gain = jnp.where(valid, gain, -jnp.inf)
        best = jnp.argmax(gain, axis=1).astype(jnp.int32)  # [nodes]
        has_split = jnp.isfinite(jnp.max(gain, axis=1))
        best = jnp.where(has_split, best, 0)

        # Write this level's node features into the dense heap: level-
        # local node k lives at heap index (2^level - 1) + k.
        base = 2 ** level - 1
        k = jnp.arange(n_nodes)
        heap_idx = jnp.where(k < 2 ** level, base + k, n_internal)
        feat = feat.at[heap_idx].set(best, mode="drop")

        # Child values with ancestor fallback for empty children.
        G1b = jnp.take_along_axis(G1, best[:, None], axis=1)[:, 0]
        H1b = jnp.take_along_axis(H1, best[:, None], axis=1)[:, 0]
        G0b = G[:, 0] - G1b
        H0b = H[:, 0] - H1b
        parent = jnp.where(H[:, 0] > 0, G[:, 0] / (H[:, 0] + eps), val)
        right = jnp.where(H1b > 0, G1b / (H1b + eps), parent)
        left = jnp.where(H0b > 0, G0b / (H0b + eps), parent)
        half = n_nodes // 2
        new_val = jnp.zeros((n_nodes,), jnp.float32)
        kk = jnp.arange(half)
        new_val = new_val.at[2 * kk].set(left[:half])
        new_val = new_val.at[2 * kk + 1].set(right[:half])

        # Route samples: child = 2*k + x[best[node]].
        go_right = X[jnp.arange(n), best[node]] > 0.5
        node = node * 2 + go_right.astype(jnp.int32)
        return feat, node, new_val

    feat, node, val = jax.lax.fori_loop(
        0, depth, level_step, (feat, node, val)
    )
    return feat, val


def _predict_tree(feat, leaf, X, depth: int):
    """Route f32[N, F] samples down one dense tree; returns f32[N]."""
    n = X.shape[0]
    node = jnp.zeros((n,), jnp.int32)

    def step(level, node):
        base = 2 ** level - 1
        split = feat[base + node]
        go_right = X[jnp.arange(n), split] > 0.5
        return node * 2 + go_right.astype(jnp.int32)

    node = jax.lax.fori_loop(0, depth, step, node)
    return leaf[node]


@partial(jax.jit, static_argnames=("depth", "n_trees"))
def fit_forest(X, y, w, key, n_trees: int, depth: int):
    """Bootstrap-aggregated trees (sklearn RandomForestRegressor analog)."""
    n = X.shape[0]

    def one(k):
        # Bootstrap: multinomial counts as integer sample weights, drawn
        # only over live rows (w > 0).  sklearn draws n_live samples from
        # n_live rows; drawing the padded bucket size instead would
        # oversample small training sets ~(n/n_live)x and shrink
        # inter-tree variance, so only the first n_live of the n fixed-
        # shape draws are kept (== multinomial(n_live, p)).
        n_live = jnp.sum(w > 0)
        p = w / jnp.maximum(jnp.sum(w), 1e-9)
        idx = jax.random.categorical(k, jnp.log(p + 1e-30), shape=(n,))
        keep = (jnp.arange(n) < n_live).astype(jnp.float32)
        counts = jnp.zeros((n,), jnp.float32).at[idx].add(keep)
        # All-padding guard: keep weights zero if no live rows.
        counts = counts * (jnp.sum(w) > 0)
        return _grow_tree(X, y, counts, depth)

    return jax.vmap(one)(jax.random.split(key, n_trees))


@partial(jax.jit, static_argnames=("depth",))
def predict_forest(feats, leaves, X, depth: int):
    preds = jax.vmap(lambda f, l: _predict_tree(f, l, X, depth))(feats, leaves)
    return jnp.mean(preds, axis=0)


@partial(jax.jit, static_argnames=("depth", "n_rounds"))
def fit_boosted(X, y, w, n_rounds: int, depth: int, learning_rate: float):
    """Gradient boosting with squared loss (sklearn GBR defaults analog)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    init = jnp.sum(y * w) / wsum

    def round_step(carry, _):
        pred = carry
        resid = y - pred
        feat, leaf = _grow_tree(X, resid, w, depth)
        pred = pred + learning_rate * _predict_tree(feat, leaf, X, depth)
        return pred, (feat, leaf)

    _, (feats, leaves) = jax.lax.scan(
        round_step, jnp.full(y.shape, init), None, length=n_rounds
    )
    return init, feats, leaves


@partial(jax.jit, static_argnames=("depth",))
def predict_boosted(init, feats, leaves, X, depth: int, learning_rate: float):
    preds = jax.vmap(lambda f, l: _predict_tree(f, l, X, depth))(feats, leaves)
    return init + learning_rate * jnp.sum(preds, axis=0)


class _JaxTreeModel(Model):
    """Shared plumbing: one-hot flattening + padded-bucket training."""

    def __init__(self, alphabet: str, name: str, seed: int = 0):
        super().__init__(name)
        self.alphabet = as_alphabet(alphabet)
        self._key = jax.random.PRNGKey(seed)
        self._state = None

    def _flat(self, sequences):
        tokens = self.alphabet.encode(list(sequences))
        return self._flat_tokens(np.asarray(tokens))

    def _flat_tokens(self, tokens):
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        tokens = pad_rows(np.asarray(tokens), bucket)
        x = jax.nn.one_hot(
            jnp.asarray(tokens), len(self.alphabet), dtype=jnp.float32
        )
        return x.reshape(bucket, -1), n

    def train(self, sequences: SEQUENCES_TYPE, labels, **kwargs):
        x, n = self._flat(sequences)
        y = jnp.asarray(pad_rows(np.asarray(labels, np.float32), x.shape[0]))
        w = jnp.asarray(pad_rows(np.ones(n, np.float32), x.shape[0]))
        self._key, fit_key = jax.random.split(self._key)
        self._state = self._fit(x, y, w, fit_key)

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        x, n = self._flat(sequences)
        return np.asarray(self._predict(x), np.float64)[:n]

    def fitness_from_tokens(self, tokens) -> np.ndarray:
        x, n = self._flat_tokens(tokens)
        return np.asarray(self._predict(x), np.float64)[:n]


class JaxRandomForest(_JaxTreeModel):
    """Device bagged-tree regressor (sklearn RandomForestRegressor slot)."""

    def __init__(self, alphabet: str, n_trees: int = 100, depth: int = 10,
                 name: Optional[str] = None, seed: int = 0):
        super().__init__(alphabet, name or "random_forest", seed)
        self.n_trees = n_trees
        self.depth = depth

    def _fit(self, x, y, w, key):
        return fit_forest(x, y, w, key, self.n_trees, self.depth)

    def _predict(self, x):
        if self._state is None:
            raise NotFittedError(self.name)
        feats, leaves = self._state
        return predict_forest(feats, leaves, x, self.depth)


class JaxGradientBoosting(_JaxTreeModel):
    """Device gradient-boosting regressor (sklearn GBR slot; defaults
    n_estimators=100, learning_rate=0.1, max_depth=3)."""

    def __init__(self, alphabet: str, n_rounds: int = 100, depth: int = 3,
                 learning_rate: float = 0.1, name: Optional[str] = None,
                 seed: int = 0):
        super().__init__(alphabet, name or "gradient_boosting", seed)
        self.n_rounds = n_rounds
        self.depth = depth
        self.learning_rate = learning_rate

    def _fit(self, x, y, w, key):
        return fit_boosted(x, y, w, self.n_rounds, self.depth,
                           self.learning_rate)

    def _predict(self, x):
        if self._state is None:
            raise NotFittedError(self.name)
        init, feats, leaves = self._state
        return predict_boosted(init, feats, leaves, x, self.depth,
                               self.learning_rate)


class JaxExtraTree(_JaxTreeModel):
    """Device single-tree regressor (sklearn ExtraTreeRegressor slot).

    On 0/1 one-hot features the extra-tree's uniform random threshold is
    indistinguishable from 0.5, so the exact greedy tree IS the extra
    tree (module docstring).
    """

    def __init__(self, alphabet: str, depth: int = 10,
                 name: Optional[str] = None, seed: int = 0):
        super().__init__(alphabet, name or "extra_trees", seed)
        self.depth = depth

    def _fit(self, x, y, w, key):
        return _jit_grow(x, y, w, self.depth)

    def _predict(self, x):
        if self._state is None:
            raise NotFittedError(self.name)
        feat, leaf = self._state
        return _jit_predict(feat, leaf, x, self.depth)


_jit_grow = jax.jit(_grow_tree, static_argnames=("depth",))
_jit_predict = jax.jit(_predict_tree, static_argnames=("depth",))


class NotFittedError(Exception):
    """Raised when predicting before the first `train` call."""
