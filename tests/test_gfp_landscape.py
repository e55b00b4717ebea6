"""GFP transformer landscape tests.

The reference test is commented out as too slow for CI
(tests/test_landscapes.py:55-66).  Here a shrunken architecture keeps the
smoke test fast; the bert-base default is exercised only for construction
metadata.
"""
import numpy as np
import pytest

from flexs_tpu.landscapes.bert_gfp import (
    VOCAB,
    BertGFPBrightness,
    encode_tape,
)


@pytest.fixture(scope="module")
def landscape():
    with pytest.warns(UserWarning, match="DETERMINISTIC"):
        return BertGFPBrightness(
            model_path="/nonexistent", hidden=64, layers=2, seed=0
        )


def test_starts_at_expected_edit_distances():
    from flexs_tpu.alphabet import Alphabet
    from flexs_tpu.ops.hamming import edit_distance_matrix

    wt = BertGFPBrightness.gfp_wt_sequence
    alpha = Alphabet("".join(sorted(set(wt + "".join(BertGFPBrightness.starts.values())))))
    # Actual Levenshtein distances of the reference's start sequences; note
    # "ed_18_wt" is at true distance 22 (reference naming inaccuracy,
    # verified against an independent pure-Python DP).
    expected = {"ed_10_wt": 10, "ed_18_wt": 22, "ed_31_wt": 31}
    for name, start in BertGFPBrightness.starts.items():
        d = int(
            edit_distance_matrix(
                alpha.encode([wt]), alpha.encode([start])
            )[0, 0]
        )
        assert d == expected[name], f"{name}: {d}"
        assert len(start) == len(wt) == 238


def test_encode_tape_layout():
    toks = encode_tape(["ACD"], max_len=8)
    assert toks.shape == (1, 8)
    assert toks[0, 0] == VOCAB["<cls>"]
    assert toks[0, 4] == VOCAB["<sep>"]
    assert toks[0, 5] == VOCAB["<pad>"]
    assert toks[0, 1] == VOCAB["A"]


def test_scores_batches_and_is_deterministic(landscape):
    seqs = [
        BertGFPBrightness.gfp_wt_sequence,
        BertGFPBrightness.starts["ed_10_wt"],
        BertGFPBrightness.starts["ed_31_wt"],
    ]
    a = landscape.get_fitness(seqs)
    b = landscape.get_fitness(seqs)
    assert a.shape == (3,)
    np.testing.assert_allclose(a, b)
    assert np.isfinite(a).all()
    # Different sequences produce different scores.
    assert len(set(np.round(a, 6))) == 3


def test_padding_does_not_change_scores(landscape):
    seqs = [BertGFPBrightness.gfp_wt_sequence] * 3
    single = landscape.get_fitness([seqs[0]])
    batch = landscape.get_fitness(seqs)
    np.testing.assert_allclose(batch, np.repeat(single, 3), atol=1e-5)


def test_gfp_device_fitness_matches_host_path(landscape):
    from flexs_tpu.alphabet import AAS, Alphabet

    seqs = [
        BertGFPBrightness.gfp_wt_sequence,
        BertGFPBrightness.starts["ed_10_wt"],
    ]
    host = landscape._fitness_function(seqs)
    tokens = Alphabet(AAS).encode(seqs)
    device = np.asarray(landscape.fitness_from_tokens(tokens))
    np.testing.assert_allclose(device, host, atol=1e-4)


def test_gfp_fused_runner(landscape):
    import flexs_tpu as flexs
    from flexs_tpu.runtime import DeviceAdaleadNAM

    runner = DeviceAdaleadNAM(
        landscape,
        flexs.AAS,
        rounds=1,
        sequences_batch_size=3,
        model_queries_per_batch=10,
        starting_sequence=BertGFPBrightness.gfp_wt_sequence,
        model="perfect",
        seed=0,
    )
    df, _ = runner.run(verbose=False)
    assert df["round"].max() == 1
    assert np.isfinite(df["true_score"]).all()
