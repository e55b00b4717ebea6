"""Bit-packed Hamming distance tests (the fused runner's hot op)."""
import numpy as np
import pytest

from flexs_tpu.ops.hamming import hamming_distance_matrix
from flexs_tpu.ops.packed_hamming import (
    pack_tokens,
    packed_hamming_matrix,
    packing_spec,
)


@pytest.mark.parametrize(
    "length,alphabet_size",
    [(8, 4), (14, 4), (100, 4), (66, 20), (90, 20), (735, 20), (5, 2)],
)
def test_packed_matches_one_hot(length, alphabet_size):
    rng = np.random.default_rng(0)
    q = rng.integers(0, alphabet_size, (11, length)).astype(np.int32)
    c = rng.integers(0, alphabet_size, (23, length)).astype(np.int32)
    bits, per_word, words = packing_spec(length, alphabet_size)
    d_packed = np.asarray(
        packed_hamming_matrix(pack_tokens(q, alphabet_size), pack_tokens(c, alphabet_size), bits, per_word)
    )
    d_ref = np.asarray(hamming_distance_matrix(q, c, alphabet_size=alphabet_size))
    np.testing.assert_array_equal(d_packed, d_ref)


def test_identical_rows_distance_zero():
    q = np.array([[1, 2, 3, 0, 1, 2, 3, 0]], np.int32)
    bits, per_word, _ = packing_spec(8, 4)
    pk = pack_tokens(q, 4)
    assert int(packed_hamming_matrix(pk, pk, bits, per_word)[0, 0]) == 0


def test_packing_density():
    # An 8-mer over 4 symbols fits one word; a 735-aa protein needs 123.
    assert packing_spec(8, 4)[2] == 1
    assert packing_spec(735, 20)[2] == int(np.ceil(735 / (32 // 5)))
