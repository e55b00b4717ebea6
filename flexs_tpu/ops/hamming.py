"""Batched sequence-distance kernels.

The reference computes edit distance one pair at a time through the C
`editdistance` extension inside Python loops (noisy_abstract_model.py:42-60,
environments/dyna_ppo.py:106-114) — an O(N) scan per query.  On TPU we
compute the whole query-vs-cache distance matrix at once.

All FLEXS problems are fixed-length with substitution-only proposal
operators, so Hamming distance equals Levenshtein on the realized data for
nearest-neighbor purposes (Levenshtein can be lower for coincidental shifts;
`edit_distance_matrix` provides the exact DP when parity demands it).

The Hamming kernel is MXU-shaped: one-hot both sides and contract over
(length x alphabet), so a [B, N] distance matrix is a single bf16/int matmul
instead of B*N scalar loops.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("alphabet_size",))
def hamming_distance_matrix(queries, cache, alphabet_size: int):
    """All-pairs Hamming distances between two token batches.

    Args:
        queries: int[B, L] token array.
        cache: int[N, L] token array.
        alphabet_size: Number of symbols (static).

    Returns:
        int32[B, N] matrix of Hamming distances.

    Implementation: matches(b, n) = sum_l [q_bl == c_nl]; expressed as a
    one-hot contraction so the MXU does the work:
    matches = onehot(q) . onehot(c)^T over the flattened (L*A) axis.
    """
    queries = jnp.asarray(queries)
    cache = jnp.asarray(cache)
    length = queries.shape[-1]
    q1 = jax.nn.one_hot(queries, alphabet_size, dtype=jnp.bfloat16).reshape(
        queries.shape[0], -1
    )
    c1 = jax.nn.one_hot(cache, alphabet_size, dtype=jnp.bfloat16).reshape(
        cache.shape[0], -1
    )
    matches = jnp.dot(q1, c1.T, preferred_element_type=jnp.float32)
    return (length - matches).astype(jnp.int32)


@jax.jit
def min_hamming_and_argmin(dists):
    """Row-wise (min distance, argmin index) of a [B, N] distance matrix."""
    return jnp.min(dists, axis=1), jnp.argmin(dists, axis=1)


@jax.jit
def _edit_distance_pairwise(a, b):
    """Exact Levenshtein distance between two equal-capacity token rows.

    Wagner-Fischer DP with the column dimension scanned (lax.scan) and the
    row dimension vectorized — compiler-friendly fixed shapes.
    Inputs are int[L] token rows; positions with value < 0 are padding and
    are ignored (allows variable true lengths under one static shape).
    """
    la = jnp.sum(a >= 0)
    lb = jnp.sum(b >= 0)
    L = a.shape[0]

    init_row = jnp.arange(L + 1, dtype=jnp.int32)

    def step(prev_row, i):
        # prev_row: DP row for b-prefix length i; compute row i+1.
        bi = b[i]
        sub_cost = jnp.where(a == bi, 0, 1)

        def inner(carry, j):
            left = carry  # dp[i+1][j]
            diag = prev_row[j]
            up = prev_row[j + 1]
            val = jnp.minimum(
                jnp.minimum(left + 1, up + 1), diag + sub_cost[j]
            )
            # Clamp DP to valid region of a.
            val = jnp.where(j < la, val, left)
            return val, val

        first = prev_row[0] + 1
        _, rest = jax.lax.scan(inner, first, jnp.arange(L))
        new_row = jnp.concatenate([first[None], rest])
        new_row = jnp.where(i < lb, new_row, prev_row)
        return new_row, None

    final_row, _ = jax.lax.scan(step, init_row, jnp.arange(L))
    return final_row[la]


def edit_distance_matrix(queries, cache):
    """Exact Levenshtein distance matrix (int32[B, N]) via vmapped DP.

    O(B*N*L^2) — use only when exact parity with `editdistance.eval` matters;
    `hamming_distance_matrix` is the fast path for fixed-length data.
    """
    queries = jnp.asarray(queries)
    cache = jnp.asarray(cache)
    f = jax.vmap(
        jax.vmap(_edit_distance_pairwise, in_axes=(None, 0)), in_axes=(0, None)
    )
    return np.asarray(f(queries, cache))
