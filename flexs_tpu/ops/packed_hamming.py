"""Bit-packed Hamming distance: XOR + popcount instead of one-hot matmuls.

The MXU formulation (flexs_tpu/ops/hamming.py) reads a [N, L*A] bf16
one-hot cache per query — 512 bytes/row for 8-mer DNA.  At fused-runner
scale that read dominates: the whole distance step is HBM-bandwidth-bound
on an operand that is 99% zeros.

Here every sequence packs into ceil(L / (32 // bits)) uint32 words (one
word for an 8-mer: 256x smaller than its one-hot).  The distance between
two packed rows is:

    x = a XOR b                       # group == 0 iff tokens equal
    fold = (x | x>>1 | ... | x>>(bits-1)) & lsb_mask
    dist = popcount(fold)             # one set bit per differing position

All VPU integer ops, fused by XLA into the [B, N] reduction — no big
operand ever leaves HBM.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def packing_spec(length: int, alphabet_size: int):
    """(bits per symbol, symbols per word, number of words) for a length."""
    bits = max(1, int(np.ceil(np.log2(max(alphabet_size, 2)))))
    per_word = 32 // bits
    words = int(np.ceil(length / per_word))
    return bits, per_word, words


@partial(jax.jit, static_argnames=("alphabet_size", "length"))
def pack_tokens(tokens, alphabet_size: int, length: int = None):
    """Pack int[..., L] tokens into uint32[..., K] words."""
    tokens = jnp.asarray(tokens)
    L = tokens.shape[-1] if length is None else length
    bits, per_word, words = packing_spec(L, alphabet_size)
    pad = words * per_word - L
    if pad:
        tokens = jnp.concatenate(
            [
                tokens,
                jnp.zeros(tokens.shape[:-1] + (pad,), tokens.dtype),
            ],
            axis=-1,
        )
    grouped = tokens.reshape(tokens.shape[:-1] + (words, per_word)).astype(
        jnp.uint32
    )
    shifts = (bits * jnp.arange(per_word, dtype=jnp.uint32))[
        (None,) * (grouped.ndim - 1) + (slice(None),)
    ]
    # Groups occupy disjoint bit ranges, so summing the shifted groups is
    # exactly their bitwise OR.
    return (grouped << shifts).sum(axis=-1).astype(jnp.uint32)


def _lsb_mask(bits: int, per_word: int) -> np.uint32:
    mask = 0
    for g in range(per_word):
        mask |= 1 << (g * bits)
    return np.uint32(mask)


@partial(jax.jit, static_argnames=("bits", "per_word"))
def packed_hamming_matrix(q_packed, c_packed, bits: int, per_word: int):
    """All-pairs Hamming distances of packed rows: int32[B, N].

    q_packed: uint32[B, K]; c_packed: uint32[N, K].
    """
    mask = jnp.uint32(_lsb_mask(bits, per_word))
    x = q_packed[:, None, :] ^ c_packed[None, :, :]  # [B, N, K]
    fold = x
    for s in range(1, bits):
        fold = fold | (x >> jnp.uint32(s))
    fold = fold & mask
    return jax.lax.population_count(fold).sum(axis=-1).astype(jnp.int32)
