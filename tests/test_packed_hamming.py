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


# -- banded Levenshtein (DynaPPO density radius kernel) -----------------------

from flexs_tpu.ops.hamming import banded_edit_distance_matrix, edit_distance_matrix


def _levenshtein(a, b):
    la, lb = len(a), len(b)
    dp = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev = dp.copy()
        dp[0] = i
        for j in range(1, lb + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[lb]


@pytest.mark.parametrize("band", [1, 2, 3])
def test_banded_matches_exact_up_to_band(band):
    rng = np.random.default_rng(7)
    q = rng.integers(0, 4, (9, 12)).astype(np.int32)
    # Cache rows: near-copies of queries (so small distances occur) + random.
    c = q[rng.integers(0, 9, 17)].copy()
    mut = rng.integers(0, 12, (17, 2))
    for r in range(17):
        c[r, mut[r]] = rng.integers(0, 4, 2)
    got = np.asarray(banded_edit_distance_matrix(q, c, band=band))
    for i in range(9):
        for j in range(17):
            exact = _levenshtein(list(q[i]), list(c[j]))
            if exact <= band:
                assert got[i, j] == exact, (i, j, exact, got[i, j])
            else:
                assert got[i, j] == band + 1, (i, j, exact, got[i, j])


def test_banded_catches_shift_by_one():
    # ACGTA -> CGTAA: Hamming 5 (every position differs) but Levenshtein 2
    # (delete the leading A, append an A) — the case the reference's
    # editdistance.eval counts inside the radius and Hamming misses.
    a = np.array([[0, 1, 2, 3, 0]], np.int32)
    b = np.array([[1, 2, 3, 0, 0]], np.int32)
    d_band = int(banded_edit_distance_matrix(a, b, band=2)[0, 0])
    d_ham = int(hamming_distance_matrix(a, b, alphabet_size=4)[0, 0])
    d_full = int(edit_distance_matrix(a, b)[0, 0])
    assert d_full == 2 and d_band == 2 and d_ham == 4


def test_banded_variable_lengths_and_padding():
    # -1-padded rows carry true lengths; an all-padding row is length 0 and
    # lands outside any radius vs a real row.
    a = np.array([[0, 1, 2, -1, -1], [0, 1, 2, 3, 0]], np.int32)
    b = np.array([[0, 1, 2, 3, -1], [-1, -1, -1, -1, -1]], np.int32)
    d = np.asarray(banded_edit_distance_matrix(a, b, band=2))
    assert d[0, 0] == 1  # ACG vs ACGT: one insertion
    assert d[1, 0] == 1  # ACGTA vs ACGT: one deletion
    assert d[0, 1] == 3 and d[1, 1] == 3  # vs empty: saturated at band+1
