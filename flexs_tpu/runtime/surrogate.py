"""In-program trained surrogates for the fused device runners.

The reference's headline empirical experiments train a Keras CNN (or a
3x-CNN ensemble) on all measured data every round and let the explorer
query it (reference baselines/models/cnn.py:23-67, keras_model.py:49-79;
experiments at paper_code/cloud/runs/rosetta_cnn/ and runs/cmaes/*_cnn).
The host-loop rebuild reproduces this through `FlaxModel`, but each round
still crosses the host<->device boundary dozens of times.

This module lets the fused runners carry the surrogate INSIDE the device
program: parameters + Adam state live in the `lax.scan` round carry, the
whole multi-epoch fit is a nested scan over shuffled fixed-shape
minibatches of the measured buffer, and candidate scoring is one forward
pass — so a complete trained-surrogate experiment (the class the reference
paper actually features) is a single device dispatch.

Parity notes vs the Keras fit (keras_model.py:49-67):
  * same arch (CNNModule — layer-for-layer vs reference cnn.py:23-54),
    same Adam(1e-3), MSE, 20 epochs, batch 256, warm-started per round,
    dropout active in training;
  * the measured set lives in a fixed-capacity buffer, so every epoch is a
    fixed grid of `ceil(capacity/batch)` minibatches with padding rows
    carrying zero weight; a minibatch whose rows are ALL padding is a
    true no-op (params and opt state are kept, not just zero-gradient).
    Early rounds therefore take the same number of (mostly lighter)
    steps as late rounds, where Keras would take fewer, denser ones —
    the per-epoch pass over the real data is identical in expectation;
  * ensembles (reference ensemble.py:10-59 with the default mean
    `combine_with`) carry a leading member axis and train/score via vmap.
"""
from functools import lru_cache
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from flexs_tpu.baselines.models.cnn import CNNModule
from flexs_tpu.baselines.models.global_epistasis_model import (
    GlobalEpistasisModule,
)
from flexs_tpu.baselines.models.jax_gp import gp_fit, gp_posterior
from flexs_tpu.baselines.models.mlp import MLPModule


class LinearModule(nn.Module):
    """Flattened one-hot -> Dense(1): the sklearn LinearRegression shape.

    The reference's linear surrogate is `sklearn.linear_model
    .LinearRegression` over flattened one-hot features (reference
    sklearn_models.py:20-33,67-74).  This module only defines the predict
    path; `train` fits it in CLOSED FORM (weighted minimum-norm OLS via an
    eigh pseudo-inverse — one MXU Gram contraction + one solve per round,
    no SGD epochs), so the fused runner gets exact sklearn-equivalent
    fitted values instead of an Adam approximation.
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(1)(x.reshape(x.shape[0], -1))


class SurrogateSpec(NamedTuple):
    """Static surrogate configuration (compile-time constant).

    Defaults mirror the reference paper runs: CNN with 32 filters and
    hidden size 100 (metadata `CNN_hidden_size_100_num_filters_32`),
    Keras fit defaults of 20 epochs at batch 256 with Adam(1e-3).
    """

    arch: str = "cnn"  # "cnn" | "mlp" | "gem" | "linear" | "gp"
    ensemble_size: int = 1
    num_filters: int = 32
    hidden_size: int = 100
    kernel_size: int = 5
    epochs: int = 20
    batch_size: int = 256
    learning_rate: float = 1e-3
    # arch="gp" only: LML Adam steps per round (jax_gp.gp_fit; 150 is the
    # sklearn-parity default documented there).  GP state shapes depend on
    # the measured-buffer capacity, so `init_state` needs `capacity=` for
    # this arch.
    gp_opt_steps: int = 150
    # Adaptive r^2 reweighting (reference adaptive_ensemble.py:71-96):
    # with >= 10 live rows, members train on a random (1 - val) split and
    # the combine weights become normalized holdout Pearson r^2; with
    # fewer rows, members train on everything and weights are kept.
    adaptive: bool = False
    adaptive_val_size: float = 0.2

    @property
    def model_name(self) -> str:
        """Reference-format model metadata name (cnn.py:67, ensemble.py:36,
        adaptive_ensemble.py:55)."""
        if self.arch == "cnn":
            base = (
                f"CNN_hidden_size_{self.hidden_size}"
                f"_num_filters_{self.num_filters}"
            )
        elif self.arch == "linear":
            # Reference sklearn wrapper name (sklearn_models.py:67-74).
            base = "linear_regression"
        elif self.arch == "gp":
            # Matches JaxGaussianProcessRegressor / the sklearn member name
            # in the reference DynaPPO ensemble (dyna_ppo.py:57-85).
            base = "gaussian_process"
        else:
            # Both MLP and GlobalEpistasis default to this string in the
            # reference (mlp.py:43, global_epistasis_model.py:41 — the
            # GEM name quirk is preserved on purpose, see CLAUDE.md).
            base = f"MLP_hidden_size_{self.hidden_size}"
        if self.ensemble_size == 1 and not self.adaptive:
            return base
        members = "|".join([base] * self.ensemble_size)
        if self.adaptive:
            return f"AdaptiveEns({members})"
        return f"Ens({members})"


class SurrogateState(NamedTuple):
    """Traced surrogate state (leading member axis on every leaf)."""

    params: dict
    opt_state: tuple
    # Combine weight per member (normalized; uniform unless adaptive).
    weight: jnp.ndarray


@lru_cache(maxsize=64)
def _module(spec: SurrogateSpec, alphabet_size: int):
    """Stable module instance per (spec, alphabet) for jit-cache identity."""
    if spec.arch == "cnn":
        return CNNModule(
            num_filters=spec.num_filters,
            hidden_size=spec.hidden_size,
            alphabet_size=alphabet_size,
            kernel_size=spec.kernel_size,
        )
    if spec.arch == "mlp":
        return MLPModule(hidden_size=spec.hidden_size)
    if spec.arch == "gem":
        return GlobalEpistasisModule(hidden_size=spec.hidden_size)
    if spec.arch == "linear":
        return LinearModule()
    raise ValueError(f"unknown surrogate arch {spec.arch!r}")


@lru_cache(maxsize=64)
def _tx(spec: SurrogateSpec):
    return optax.adam(spec.learning_rate)


def init_state(
    spec: SurrogateSpec,
    alphabet_size: int,
    length: int,
    key,
    capacity: int = 0,
):
    """Initialize ensemble_size independent members (vmapped leading axis).

    `capacity` (the runner's measured-buffer row count) is required for
    arch="gp", whose exact-posterior state — the training set, the dual
    coefficients, and the Cholesky factor — is shaped [capacity, ...].
    Other archs ignore it.
    """
    if spec.arch == "gp":
        if capacity < 1:
            raise ValueError(
                'arch="gp" needs init_state(..., capacity=<measured-buffer '
                "capacity>) — its posterior state is shaped by it"
            )
        if spec.ensemble_size != 1 or spec.adaptive:
            raise ValueError(
                'arch="gp" is an exact posterior — ensemble_size must be 1 '
                "and adaptive False (ensembling a deterministic GP is a "
                "no-op)"
            )
        return SurrogateState(
            params={
                "train_tokens": jnp.zeros((capacity, length), jnp.int32),
                "theta": jnp.zeros((2,), jnp.float32),
                "dual": jnp.zeros((capacity,), jnp.float32),
                "chol": jnp.eye(capacity, dtype=jnp.float32),
                "valid": jnp.zeros((capacity,), bool),
            },
            opt_state=(),
            weight=jnp.ones((1,), jnp.float32),
        )

    module = _module(spec, alphabet_size)
    tx = _tx(spec)
    dummy = jnp.zeros((1, length, alphabet_size), jnp.float32)

    def one(k):
        params = module.init({"params": k, "dropout": k}, dummy, train=False)
        return SurrogateState(
            params=params,
            opt_state=tx.init(params),
            weight=jnp.float32(1.0 / spec.ensemble_size),
        )

    return jax.vmap(one)(jax.random.split(key, spec.ensemble_size))


def train(
    spec: SurrogateSpec,
    alphabet_size: int,
    state: SurrogateState,
    tokens: jnp.ndarray,
    truth: jnp.ndarray,
    n_rows,
    key,
) -> SurrogateState:
    """One full warm-started fit on the live rows of the measured buffer.

    Args:
        tokens: int32[cap, L] measured-sequence buffer (fixed capacity).
        truth: f32[cap] true scores (-inf on unfilled rows).
        n_rows: live row count (traced).
        key: PRNG key (per-member shuffle/dropout streams are split off).
    """
    if spec.arch == "gp":
        # Exact posterior refit: LML hyperparameter optimization + one
        # Cholesky over the masked measured buffer (jax_gp.gp_fit — the
        # same math as JaxGaussianProcessRegressor, here inside the fused
        # program so the state rides the lax.scan round carry).
        valid = (jnp.arange(tokens.shape[0]) < n_rows) & jnp.isfinite(truth)
        # Duplicate measured rows (runners like BO/CMA-ES may re-propose
        # an already-measured sequence) make the kernel matrix exactly
        # singular — the f32 Cholesky (jitter 1e-8, below f32 eps at
        # kernel amplitude ~1) returns all-NaN and silently kills every
        # later round.  A duplicate row carries no information, so keep
        # only each sequence's FIRST occurrence.
        eq = jnp.all(tokens[:, None, :] == tokens[None, :, :], axis=-1)
        earlier = jnp.tril(jnp.ones_like(eq, dtype=bool), k=-1)
        dup = jnp.any(eq & earlier & valid[None, :], axis=1)
        valid = valid & ~dup
        theta, dual, chol = gp_fit(tokens, truth, valid, spec.gp_opt_steps)
        return state._replace(
            params={
                "train_tokens": tokens,
                "theta": theta,
                "dual": dual,
                "chol": chol,
                "valid": valid,
            }
        )

    module = _module(spec, alphabet_size)
    tx = _tx(spec)

    cap = tokens.shape[0]
    bs = min(spec.batch_size, cap)
    num_batches = -(-cap // bs)
    padded = num_batches * bs

    x = jax.nn.one_hot(tokens, alphabet_size, dtype=jnp.float32)
    w_all = ((jnp.arange(cap) < n_rows) & jnp.isfinite(truth)).astype(jnp.float32)
    y = jnp.where(jnp.isfinite(truth), truth, 0.0)
    if spec.adaptive:
        # Random holdout split (reference adaptive_ensemble.py:86-95;
        # Bernoulli(val_size) per live row approximates the exact-count
        # train_test_split). With < 10 live rows members train on
        # everything and weights are kept (:82-85).
        key, k_split = jax.random.split(key)
        val_mask = w_all * (
            jax.random.uniform(k_split, (cap,)) < spec.adaptive_val_size
        )
        use_split = jnp.sum(w_all) >= 10
        w = jnp.where(use_split, w_all - val_mask, w_all)
    else:
        w = w_all
    if padded > cap:
        x = jnp.pad(x, ((0, padded - cap), (0, 0), (0, 0)))
        y = jnp.pad(y, (0, padded - cap))
        w = jnp.pad(w, (0, padded - cap))

    def fit_one(params, opt_state, weight, k):
        def minibatch_step(carry, idx):
            params, opt_state, k = carry
            k, dk = jax.random.split(k)
            xb, yb, wb = x[idx], y[idx], w[idx]
            wsum = jnp.sum(wb)

            def batch_loss(p):
                preds = module.apply(
                    p, xb, train=True, rngs={"dropout": dk}
                ).reshape(bs)
                return jnp.sum(jnp.square(preds - yb) * wb) / (wsum + 1e-9)

            grads = jax.grad(batch_loss)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # All-padding minibatches are true no-ops (Keras would simply
            # not run them): keep params AND optimizer state untouched.
            has = wsum > 0
            sel = lambda a, b: jnp.where(has, a, b)
            params = jax.tree.map(sel, new_params, params)
            opt_state = jax.tree.map(sel, new_opt, opt_state)
            return (params, opt_state, k), None

        def epoch_step(carry, _):
            params, opt_state, k = carry
            k, pk = jax.random.split(k)
            perm = jax.random.permutation(pk, padded).reshape(num_batches, bs)
            carry, _ = jax.lax.scan(
                minibatch_step, (params, opt_state, k), perm
            )
            return carry, None

        (params, opt_state, _), _ = jax.lax.scan(
            epoch_step, (params, opt_state, k), None, length=spec.epochs
        )
        return SurrogateState(params=params, opt_state=opt_state, weight=weight)

    if spec.arch == "linear":
        # Closed form instead of SGD: weighted minimum-norm OLS via an
        # eigh pseudo-inverse (the one-hot blocks are collinear with the
        # bias column, so the Gram matrix is rank-deficient; the pinv
        # gives sklearn LinearRegression's fitted values exactly).  One
        # MXU Gram contraction + one solve per round; members are
        # deterministic and identical.
        xf = x.reshape(padded, -1)
        xf = jnp.concatenate([xf, jnp.ones((padded, 1), jnp.float32)], 1)
        xw = xf * w[:, None]
        gram = jnp.dot(xw.T, xf, preferred_element_type=jnp.float32)
        rhs = jnp.dot(xw.T, y, preferred_element_type=jnp.float32)
        s, v = jnp.linalg.eigh(gram)
        inv_s = jnp.where(s > 1e-6 * jnp.max(s), 1.0 / s, 0.0)
        coef = v @ (inv_s * (v.T @ rhs))
        kernel, bias = coef[:-1][:, None], coef[-1:]

        def fill(old):
            tgt = kernel if old.shape[1:] == kernel.shape else bias
            return jnp.broadcast_to(tgt, old.shape).astype(old.dtype)

        new_state = SurrogateState(
            params=jax.tree.map(fill, state.params),
            opt_state=state.opt_state,
            weight=state.weight,
        )
    else:
        keys = jax.random.split(key, spec.ensemble_size)
        new_state = jax.vmap(fit_one)(
            state.params, state.opt_state, state.weight, keys
        )

    if spec.adaptive:
        # Holdout Pearson r^2 per member, normalized to combine weights
        # (reference adaptive_ensemble.py:12-26,96).
        vm = val_mask if padded == cap else jnp.pad(val_mask, (0, padded - cap))
        nv = jnp.maximum(jnp.sum(vm), 1.0)
        ym = jnp.sum(y * vm) / nv

        def member_r2(params):
            p = module.apply(params, x, train=False).reshape(padded)
            pm = jnp.sum(p * vm) / nv
            cov = jnp.sum((p - pm) * (y - ym) * vm)
            var = jnp.sum(jnp.square(p - pm) * vm) * jnp.sum(
                jnp.square(y - ym) * vm
            )
            r = cov / jnp.sqrt(var + 1e-12)
            return jnp.nan_to_num(r * r)

        r2s = jax.vmap(member_r2)(new_state.params)
        wts = r2s / jnp.maximum(jnp.sum(r2s), 1e-9)
        # Degenerate holdouts (constant labels/predictions) give every
        # member r^2 = 0; all-zero weights would zero the combined
        # prediction entirely, so keep the previous weights instead —
        # the same fallback the < 10-rows path takes.
        weight = jnp.where(
            use_split & (jnp.sum(r2s) > 0), wts, new_state.weight
        )
        new_state = new_state._replace(weight=weight)
    return new_state


def predict(
    spec: SurrogateSpec,
    alphabet_size: int,
    state: SurrogateState,
    tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Weight-combined prediction f32[B] for int32[B, L] tokens.

    Mirrors `KerasModel._fitness_function` (predict + nan_to_num,
    keras_model.py:69-79) combined over members: uniform weights give the
    plain Ensemble mean (ensemble.py:24,54-59); adaptive specs use the
    holdout-r^2 weights (adaptive_ensemble.py:97-102, weighted sum with
    weights normalized to 1).
    """
    members = predict_members(spec, alphabet_size, state, tokens)
    return jnp.sum(members * state.weight[:, None], axis=0)


def predict_members(
    spec: SurrogateSpec,
    alphabet_size: int,
    state: SurrogateState,
    tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Per-member predictions f32[members, B] (for BO-style acquisition)."""
    if spec.arch == "gp":
        return _gp_posterior(state, tokens)[0][None, :]
    x = jax.nn.one_hot(tokens, alphabet_size, dtype=jnp.float32)
    module = _module(spec, alphabet_size)

    def one(params):
        return module.apply(params, x, train=False).reshape(x.shape[0])

    return jnp.nan_to_num(jax.vmap(one)(state.params))


def _gp_posterior(state: SurrogateState, tokens: jnp.ndarray):
    p = state.params
    return gp_posterior(
        tokens, p["train_tokens"], p["theta"], p["dual"], p["chol"], p["valid"]
    )


def posterior(
    spec: SurrogateSpec,
    alphabet_size: int,
    state: SurrogateState,
    tokens: jnp.ndarray,
):
    """Posterior (mean, std), each f32[B].

    arch="gp" returns the EXACT analytic posterior; every other arch
    returns the combined mean and the member spread (population std over
    ensemble members — the reference's sigma proxy, bo.py:318-319, which
    is 0 for single-member specs).  This is what acquisition functions
    should consume: it gives fused BO/GPR_BO a real uncertainty signal
    where the reference's GPR_BO collapses to greedy (its np.std over a
    scalar quirk — see CLAUDE.md preserved-quirks).
    """
    if spec.arch == "gp":
        return _gp_posterior(state, tokens)
    members = predict_members(spec, alphabet_size, state, tokens)
    mean = jnp.sum(members * state.weight[:, None], axis=0)
    return mean, jnp.std(members, axis=0)
