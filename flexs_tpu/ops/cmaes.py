"""CMA-ES (covariance matrix adaptation evolution strategy) on device.

The reference explorer delegates to the `cma` package's Python/numpy
implementation (cmaes.py:96-114).  This is a from-scratch JAX implementation
of the standard (mu/mu_w, lambda) CMA-ES following Hansen's tutorial
hyperparameters: sampling, ranking, mean/step-size/covariance updates, and
the eigendecomposition all run under jit on device, so an entire ask+tell
generation is one compiled program.

Convention: MINIMIZES fitness (same as `cma`).  Callers wanting
maximization negate their objective.

Pure-functional: `init` builds a state pytree; `ask`/`tell` return new
states.  All shapes are static in (dim, popsize).
"""
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CMAState(NamedTuple):
    """CMA-ES evolution state (a pytree; all arrays live on device)."""

    mean: jnp.ndarray  # [n]
    sigma: jnp.ndarray  # scalar step size
    cov: jnp.ndarray  # [n, n] covariance
    p_sigma: jnp.ndarray  # [n] step-size evolution path
    p_c: jnp.ndarray  # [n] covariance evolution path
    eig_b: jnp.ndarray  # [n, n] eigenbasis of cov
    eig_d: jnp.ndarray  # [n] sqrt eigenvalues
    count: jnp.ndarray  # generation counter


def _hyperparams(dim: int, popsize: int):
    mu = popsize // 2
    ranks = np.arange(1, mu + 1)
    weights = np.log(mu + 0.5) - np.log(ranks)
    weights = weights / weights.sum()
    mu_eff = 1.0 / np.sum(weights**2)

    c_sigma = (mu_eff + 2) / (dim + mu_eff + 5)
    d_sigma = (
        1 + 2 * max(0.0, np.sqrt((mu_eff - 1) / (dim + 1)) - 1) + c_sigma
    )
    c_c = (4 + mu_eff / dim) / (dim + 4 + 2 * mu_eff / dim)
    c_1 = 2 / ((dim + 1.3) ** 2 + mu_eff)
    c_mu = min(1 - c_1, 2 * (mu_eff - 2 + 1 / mu_eff) / ((dim + 2) ** 2 + mu_eff))
    chi_n = np.sqrt(dim) * (1 - 1 / (4 * dim) + 1 / (21 * dim**2))
    return {
        "mu": mu,
        "weights": jnp.asarray(weights, jnp.float32),
        "mu_eff": float(mu_eff),
        "c_sigma": float(c_sigma),
        "d_sigma": float(d_sigma),
        "c_c": float(c_c),
        "c_1": float(c_1),
        "c_mu": float(c_mu),
        "chi_n": float(chi_n),
    }


def init(x0: np.ndarray, sigma: float) -> CMAState:
    """Create a fresh CMA-ES state centered at `x0` with step size `sigma`."""
    x0 = jnp.asarray(x0, jnp.float32)
    n = x0.shape[0]
    return CMAState(
        mean=x0,
        sigma=jnp.float32(sigma),
        cov=jnp.eye(n, dtype=jnp.float32),
        p_sigma=jnp.zeros(n, jnp.float32),
        p_c=jnp.zeros(n, jnp.float32),
        eig_b=jnp.eye(n, dtype=jnp.float32),
        eig_d=jnp.ones(n, jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, static_argnames=("popsize",))
def ask(state: CMAState, key, popsize: int) -> jnp.ndarray:
    """Sample `popsize` candidate solutions x_i ~ N(mean, sigma^2 C)."""
    n = state.mean.shape[0]
    z = jax.random.normal(key, (popsize, n), jnp.float32)
    # y = B D z  — rotate isotropic samples into the covariance ellipsoid.
    y = jnp.dot(
        z * state.eig_d[None, :], state.eig_b.T, preferred_element_type=jnp.float32
    )
    return state.mean[None, :] + state.sigma * y


@partial(jax.jit, static_argnames=("popsize",))
def tell(
    state: CMAState, solutions: jnp.ndarray, fitnesses: jnp.ndarray, popsize: int
) -> CMAState:
    """Update the state from evaluated solutions (minimization)."""
    n = state.mean.shape[0]
    hp = _hyperparams(n, popsize)
    weights, mu = hp["weights"], hp["mu"]

    order = jnp.argsort(fitnesses)
    elite = solutions[order[:mu]]  # [mu, n]
    y_elite = (elite - state.mean[None, :]) / state.sigma
    y_bar = jnp.dot(weights, y_elite, preferred_element_type=jnp.float32)  # [n]

    new_mean = state.mean + state.sigma * y_bar

    # C^{-1/2} y_bar via the cached eigendecomposition.
    inv_sqrt_y = jnp.dot(
        state.eig_b,
        jnp.dot(state.eig_b.T, y_bar) / jnp.maximum(state.eig_d, 1e-20),
        preferred_element_type=jnp.float32,
    )
    p_sigma = (1 - hp["c_sigma"]) * state.p_sigma + jnp.sqrt(
        hp["c_sigma"] * (2 - hp["c_sigma"]) * hp["mu_eff"]
    ) * inv_sqrt_y

    count = state.count + 1
    ps_norm = jnp.linalg.norm(p_sigma)
    h_sigma = (
        ps_norm
        / jnp.sqrt(1 - (1 - hp["c_sigma"]) ** (2 * count.astype(jnp.float32)))
        < (1.4 + 2 / (n + 1)) * hp["chi_n"]
    ).astype(jnp.float32)

    p_c = (1 - hp["c_c"]) * state.p_c + h_sigma * jnp.sqrt(
        hp["c_c"] * (2 - hp["c_c"]) * hp["mu_eff"]
    ) * y_bar

    delta_h = (1 - h_sigma) * hp["c_c"] * (2 - hp["c_c"])
    rank_one = jnp.outer(p_c, p_c)
    rank_mu = jnp.einsum(
        "i,ij,ik->jk", weights, y_elite, y_elite, preferred_element_type=jnp.float32
    )
    cov = (
        (1 - hp["c_1"] - hp["c_mu"]) * state.cov
        + hp["c_1"] * (rank_one + delta_h * state.cov)
        + hp["c_mu"] * rank_mu
    )
    cov = (cov + cov.T) / 2

    sigma = state.sigma * jnp.exp(
        (hp["c_sigma"] / hp["d_sigma"]) * (ps_norm / hp["chi_n"] - 1)
    )
    # Guard against overflow/degeneration under pathological objectives.
    sigma = jnp.clip(sigma, 1e-12, 1e6)

    # Lazy eigendecomposition (standard CMA-ES practice): refresh the
    # sampling basis every ~1/(10 n (c1+cmu)) generations — an O(n^3) eigh
    # per generation dominates wall-clock in high dimension otherwise.
    lazy_gap = max(1, int(1.0 / (10.0 * n * (hp["c_1"] + hp["c_mu"]))))
    refresh = (count % lazy_gap) == 0
    eig_vals, eig_b_new = jax.lax.cond(
        refresh,
        lambda c: tuple(jnp.linalg.eigh(c)),
        lambda c: (jnp.square(state.eig_d), state.eig_b),
        cov,
    )
    eig_b = eig_b_new
    eig_d = jnp.sqrt(jnp.maximum(eig_vals, 1e-20))

    return CMAState(
        mean=new_mean,
        sigma=sigma,
        cov=cov,
        p_sigma=p_sigma,
        p_c=p_c,
        eig_b=eig_b,
        eig_d=eig_d,
        count=count,
    )


def ask_numpy(state: CMAState, key, popsize: int) -> np.ndarray:
    """Host-friendly `ask` returning numpy solutions."""
    return np.asarray(ask(state, key, popsize))


def tell_numpy(
    state: CMAState, solutions: np.ndarray, fitnesses: np.ndarray
) -> CMAState:
    """Host-friendly `tell` taking numpy arrays."""
    popsize = len(solutions)
    return tell(
        state,
        jnp.asarray(solutions, jnp.float32),
        jnp.asarray(fitnesses, jnp.float32),
        popsize,
    )


def minimize(
    fn, x0: np.ndarray, sigma: float, popsize: int, iterations: int, seed: int = 0
) -> Tuple[np.ndarray, float]:
    """Convenience driver: minimize `fn` (batched [pop, n] -> [pop])."""
    state = init(x0, sigma)
    key = jax.random.PRNGKey(seed)
    best_x, best_f = np.asarray(x0), np.inf
    for _ in range(iterations):
        key, ask_key = jax.random.split(key)
        solutions = ask_numpy(state, ask_key, popsize)
        fitnesses = np.asarray(fn(solutions))
        i = int(np.argmin(fitnesses))
        if fitnesses[i] < best_f:
            best_x, best_f = solutions[i], float(fitnesses[i])
        state = tell_numpy(state, solutions, fitnesses)
    return best_x, best_f
