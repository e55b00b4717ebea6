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


@partial(jax.jit, static_argnames=("band",))
def _banded_edit_distance_pairwise(a, b, band: int = 2):
    """Levenshtein distance, exact up to `band`, saturated at `band + 1`.

    Ukkonen-style banded Wagner-Fischer: only the 2*band+1 diagonals
    |i - j| <= band are tracked, so the DP is O(L * (2*band+1)) per pair
    instead of O(L^2).  Any true distance > band reports exactly band + 1
    (distances beyond the band cannot re-enter it).  Inputs are int[L]
    token rows; positions with value < 0 are padding (variable true
    lengths under one static shape, matching `_edit_distance_pairwise`).
    """
    la = jnp.sum(a >= 0)
    lb = jnp.sum(b >= 0)
    L = a.shape[0]
    K = 2 * band + 1
    inf = jnp.int32(band + 1)
    offs = jnp.arange(K, dtype=jnp.int32) - band  # column offset j - r

    # Row 0: dp[0][j] = j for j in 0..band; columns off-band are saturated.
    w0 = jnp.minimum(jnp.where(offs >= 0, offs, inf), inf).astype(jnp.int32)

    def step(w_prev, r0):
        # w_prev[d] = dp[r][r + offs[d]]; compute row r+1 (a-prefix r+1).
        r = r0 + 1
        j = r + offs  # columns this row's window covers
        achar = a[r - 1]
        bj = jnp.where(
            (j >= 1) & (j <= L), b[jnp.clip(j - 1, 0, L - 1)], jnp.int32(-2)
        )
        cost = jnp.where(achar == bj, 0, 1).astype(jnp.int32)
        # dp[r-1][j] sits one offset up in the previous window; dp[r-1][j-1]
        # sits at the same offset.
        up = jnp.concatenate([w_prev[1:], inf[None]])
        cand = jnp.minimum(up + 1, w_prev + cost)
        # Left-to-right pass for dp[r][j-1] + 1 — K is tiny, unroll it.
        vals = []
        left = inf
        for d in range(K):
            v = jnp.minimum(cand[d], left + 1)
            v = jnp.where(j[d] == 0, r, v)
            v = jnp.where((j[d] < 0) | (j[d] > lb), inf, v)
            v = jnp.minimum(v, inf)
            vals.append(v)
            left = v
        w_new = jnp.stack(vals)
        # Freeze once past a's true length so w holds row `la` at the end.
        w_new = jnp.where(r <= la, w_new, w_prev)
        return w_new, None

    w_final, _ = jax.lax.scan(step, w0, jnp.arange(L, dtype=jnp.int32))
    # Answer = dp[la][lb] = window offset lb - la (saturated if off-band).
    off = lb - la
    in_band = jnp.abs(off) <= band
    idx = jnp.clip(off + band, 0, K - 1)
    return jnp.where(in_band, w_final[idx], inf)


@partial(jax.jit, static_argnames=("band",))
def banded_edit_distance_matrix(queries, cache, band: int = 2):
    """Levenshtein matrix (int32[B, N]) exact up to `band`, else band + 1.

    The radius-limited exact distance the DynaPPO density reward needs
    (reference environments/dyna_ppo.py:106-114 calls `editdistance.eval`
    per pair and keeps only 0 < d <= 2): entries <= band are the true
    Levenshtein distance; larger distances all report band + 1, which the
    density weighting discards anyway.
    """
    queries = jnp.asarray(queries)
    cache = jnp.asarray(cache)
    f = jax.vmap(
        jax.vmap(_banded_edit_distance_pairwise, in_axes=(None, 0, None)),
        in_axes=(0, None, None),
    )
    return f(queries, cache, band)
