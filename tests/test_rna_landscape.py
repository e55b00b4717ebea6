"""RNA landscape tests.

The reference's RNA test needs ViennaRNA installed (tests/test_landscapes.py:16-28).
Here the landscape is self-contained; agreement with the real ViennaRNA is
checked against oracle outputs shipped with the reference
(examples/robustness/adalead/*.csv — ~2.4k sequences scored by the C
library for the L14_RNA1 problem).
"""
import glob
import os

import numpy as np
import pandas as pd
import pytest

import flexs_tpu as flexs
from flexs_tpu.landscapes import rna

REFERENCE_CSVS = "/root/reference/examples/robustness/adalead/*.csv"


def test_registry_has_36_problems():
    problems = rna.registry()
    assert len(problems) == 36
    assert "L14_RNA1" in problems
    assert "L100_RNA1+2" in problems
    assert "C20_L100_RNA1+2" in problems
    # Conserved problems carry the swampland region.
    assert problems["C20_L100_RNA1+2"]["params"]["conserved_region"]["start"] == 21


def test_rna_binding_basic_properties():
    problem = rna.registry()["L14_RNA1"]
    landscape = rna.RNABinding(**problem["params"])
    starts = list(problem["starts"].values())
    scores = landscape.get_fitness(starts)
    assert scores.shape == (5,)
    assert np.isfinite(scores).all()
    assert landscape.cost == 5
    # The first start is a subsequence match to the target's complement
    # region and should bind well.
    assert scores[0] > 0.3


def test_rna_binding_wrong_length_raises():
    problem = rna.registry()["L14_RNA1"]
    landscape = rna.RNABinding(**problem["params"])
    with pytest.raises(ValueError):
        landscape.get_fitness(["ACGU"])


def test_rna_binding_perfect_complement_scores_near_one():
    target = rna.registry()["L14_RNA1"]["params"]["targets"][0]
    landscape = rna.RNABinding(targets=[target], seq_length=14)
    comp = {"A": "U", "C": "G", "G": "C", "U": "A"}
    # Complement of a 14-nt window of the target, reversed.
    window = target[40:54]
    complement = "".join(comp[x] for x in window)[::-1]
    score = landscape.get_fitness([complement])[0]
    assert score > 0.6


def test_conserved_region_swampland():
    problems = rna.registry()
    problem = problems["C20_L100_RNA1+2"]
    landscape = rna.RNABinding(**problem["params"])
    good = problem["starts"][1]  # starts contain the conserved pattern
    bad = "A" * 100
    scores = landscape.get_fitness([good, bad])
    assert scores[0] != 0
    assert scores[1] == 0


def test_multi_target_is_mean_of_singles():
    problems = rna.registry()
    p2 = problems["L14_RNA1+2"]["params"]
    landscape_both = rna.RNABinding(**p2)
    l1 = rna.RNABinding(targets=[p2["targets"][0]], seq_length=14)
    l2 = rna.RNABinding(targets=[p2["targets"][1]], seq_length=14)
    seqs = list(problems["L14_RNA1"]["starts"].values())
    both = landscape_both.get_fitness(seqs)
    mean_single = (l1.get_fitness(seqs) + l2.get_fitness(seqs)) / 2
    np.testing.assert_allclose(both, mean_single, atol=1e-5)


@pytest.mark.skipif(
    not glob.glob(REFERENCE_CSVS), reason="reference oracle CSVs not available"
)
def test_agreement_with_viennarna_outputs():
    data = {}
    for f in sorted(glob.glob(REFERENCE_CSVS)):
        df = pd.read_csv(f, skiprows=1)
        for s, t in zip(df["sequence"], df["true_score"]):
            data[s] = t
    seqs = sorted(data.keys())
    truth = np.array([data[s] for s in seqs])

    problem = rna.registry()["L14_RNA1"]
    landscape = rna.RNABinding(**problem["params"])
    ours = landscape.get_fitness(seqs)

    corr = np.corrcoef(ours, truth)[0, 1]
    mae = np.abs(ours - truth).mean()
    # Calibrated round-2 model (scripts/calibrate_rna.py; full E_IntLoop
    # functional form + two-phase MSE/Huber fit): holdout pearson 0.9993,
    # MAE 0.0021. Gate slightly below to absorb re-calibration jitter.
    assert corr > 0.995, f"pearson {corr:.4f}"
    assert mae < 0.005, f"MAE {mae:.4f}"


def test_rna_folding_orders_structures():
    landscape = rna.RNAFolding()
    # A strong hairpin (stem of GC pairs) vs an unfoldable homopolymer.
    hairpin = "GGGGGGAAAACCCCCC"
    unstructured = "AAAAAAAAAAAAAAAA"
    scores = landscape.get_fitness([hairpin, unstructured])
    assert scores[0] > scores[1]
    assert scores[1] <= 0.0 + 1e-6


def test_rna_device_fitness_with_fused_runner():
    from flexs_tpu.runtime import DeviceAdaleadNAM

    problem = rna.registry()["L14_RNA1"]
    landscape = rna.RNABinding(**problem["params"])
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.RNAA,
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence=problem["starts"][1],
        signal_strength=1.0,
        seed=0,
    )
    df, _ = runner.run(verbose=False)
    assert df["round"].max() == 2
    # ss=1: model scores equal true scores.
    prop = df[df["round"] > 0]
    np.testing.assert_allclose(
        prop["model_score"].to_numpy(), prop["true_score"].to_numpy(), atol=1e-5
    )


def test_rna_folding_device_fitness_fused_runner():
    """RNAFolding joins the fused-runner family via device_fitness."""
    from flexs_tpu.runtime import DeviceAdaleadNAM

    landscape = rna.RNAFolding()
    start = "GGGGGGAAAACCCCCC"
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.RNAA,
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence=start,
        signal_strength=1.0,
        seed=0,
    )
    df, _ = runner.run(verbose=False)
    assert df["round"].max() == 2
    # Device fn agrees with the host fast path on the proposals.
    seqs = df["sequence"].tolist()
    host = landscape.get_fitness(seqs)
    np.testing.assert_allclose(df["true_score"].to_numpy(), host, atol=1e-5)


def test_rna_folding_mixed_length_batch():
    """The reference RNAFolding folds each string independently (no fixed
    length); mixed-length queries must work (reference rna.py:15-27)."""
    from flexs_tpu.landscapes.rna import RNAFolding

    land = RNAFolding()
    seqs = ["GGGGAAAACCCC", "GGGGGAAAACCCCC", "GGGGAAAACCCC"]
    fit = land.get_fitness(seqs)
    assert fit.shape == (3,)
    assert fit[0] == fit[2]  # same sequence scores the same
    # Each equals its own single-sequence score (grouping is transparent).
    np.testing.assert_allclose(fit[1], land.get_fitness([seqs[1]])[0])


def test_pallas_guard_small_maxloop():
    """maxloop < 3 must raise cleanly, not crash inside kernel tracing."""
    import pytest

    from flexs_tpu.ops.pallas_duplex import duplex_energy_batch_pallas
    from flexs_tpu.ops.rna_duplex import DuplexParams

    seqs = np.zeros((4, 12), np.int32)
    target = np.zeros((12,), np.int32)
    with pytest.raises(ValueError, match="maxloop >= 3"):
        duplex_energy_batch_pallas(seqs, target, DuplexParams(maxloop=2))
