"""Landscape tests, including golden-value parity checks vs the reference's
raw measurement data (which the reference's own tests lack; SURVEY.md §4)."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.utils import sequence_utils as s_utils


def test_tf_binding_registry_and_scores():
    problems = flexs.landscapes.tf_binding.registry()
    assert "SIX6_REF_R1" in problems
    assert len(problems) >= 158

    problem = problems["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])

    seqs = s_utils.generate_random_sequences(
        8, 100, flexs.DNAA, rng=np.random.default_rng(0)
    )
    fitness = landscape.get_fitness(seqs)
    assert fitness.shape == (100,)
    assert (fitness >= 0).all() and (fitness <= 1).all()
    assert landscape.cost == 100


def test_tf_binding_matches_raw_tsv():
    """Packed-table scores must exactly match direct TSV normalization."""
    import os

    raw = "/root/reference/flexs/landscapes/data/tf_binding/SIX6_REF_R1_8mers.txt"
    if not os.path.exists(raw):
        pytest.skip("raw reference data not available")

    from_table = flexs.landscapes.TFBinding(name="SIX6_REF_R1")
    from_tsv = flexs.landscapes.TFBinding(landscape_file=raw)

    seqs = s_utils.generate_random_sequences(
        8, 200, flexs.DNAA, rng=np.random.default_rng(1)
    )
    np.testing.assert_allclose(
        from_table.get_fitness(seqs), from_tsv.get_fitness(seqs), atol=1e-7
    )


def test_tf_binding_both_strands_same_score():
    landscape = flexs.landscapes.TFBinding(name="SIX6_REF_R1")
    comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
    seq = "GCTCGAGC"
    rc = "".join(comp[c] for c in reversed(seq))
    a, b = landscape.get_fitness([seq, rc])
    assert abs(a - b) < 1e-7
