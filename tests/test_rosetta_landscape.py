"""Rosetta centroid landscape tests.

The reference test needs PyRosetta installed and always skips in CI
(tests/test_landscapes.py:31-44, SURVEY.md §4).  Here the landscape is
self-contained; fidelity is checked against ~38k sequences scored by the
real PyRosetta that ship with the reference (paper_code/cloud/runs/3msi).
"""
import glob

import numpy as np
import pandas as pd
import pytest

import flexs_tpu as flexs
from flexs_tpu.landscapes import rosetta

RUNS = "/root/reference/paper_code/cloud/runs/3msi/*/*.csv"


def test_registry_structures_and_starts():
    problems = rosetta.registry()
    assert set(problems) == {"3msi", "3mx7"}
    for p in problems.values():
        assert p["params"]["sigmoid_center"] == -3
        assert p["params"]["sigmoid_norm_value"] == 12


def test_wild_type_matches_start_edit_distances():
    problems = rosetta.registry()
    land = rosetta.RosettaFolding(**problems["3msi"]["params"])
    assert len(land.wt_sequence) == 66
    for name, start in problems["3msi"]["starts"].items():
        expected = int(name.split("_")[1])
        actual = sum(a != b for a, b in zip(land.wt_sequence, start))
        assert actual == expected

    land2 = rosetta.RosettaFolding(**problems["3mx7"]["params"])
    assert len(land2.wt_sequence) == 90


def test_length_mismatch_raises():
    land = rosetta.RosettaFolding(**rosetta.registry()["3msi"]["params"])
    with pytest.raises(ValueError):
        land.get_fitness(["ACDEFG"])
    with pytest.raises(ValueError):
        land.get_folding_energy("ACDEFG")


def test_fitness_is_sigmoid_of_energy():
    land = rosetta.RosettaFolding(**rosetta.registry()["3msi"]["params"])
    seq = land.wt_sequence
    e = land.get_folding_energy(seq)
    fit = land.get_fitness([seq])[0]
    expected = 1.0 / (1.0 + np.exp(-((-e - (-3)) / 12)))
    assert fit == pytest.approx(expected, abs=1e-5)


@pytest.mark.skipif(not glob.glob(RUNS), reason="reference run CSVs unavailable")
def test_agreement_with_pyrosetta_outputs():
    data = {}
    for f in sorted(glob.glob(RUNS))[::4]:  # subsample files for speed
        df = pd.read_csv(f, skiprows=1)
        for s, t in zip(df["sequence"], df["true_score"]):
            data[s] = t
    seqs = sorted(data.keys())
    truth = np.array([data[s] for s in seqs])

    land = rosetta.RosettaFolding(**rosetta.registry()["3msi"]["params"])
    ours = land.get_fitness(seqs)
    corr = np.corrcoef(ours, truth)[0, 1]
    mae = np.abs(ours - truth).mean()
    # Fitted potential: holdout pearson 0.993, MAE 0.023 over the full set
    # (scripts/calibrate_rosetta.py); gate slightly below.
    assert corr > 0.97, f"pearson {corr:.4f}"
    assert mae < 0.05, f"MAE {mae:.4f}"


def test_potential_transfers_to_3mx7():
    # Structure-independent tables: 3mx7's wild type should score above
    # random sequences on its own backbone.
    from flexs_tpu.utils import sequence_utils as s_utils

    land = rosetta.RosettaFolding(**rosetta.registry()["3mx7"]["params"])
    wt_fit = land.get_fitness([land.wt_sequence])[0]
    rand = s_utils.generate_random_sequences(
        90, 50, flexs.AAS, rng=np.random.default_rng(0)
    )
    rand_mean = land.get_fitness(rand).mean()
    assert wt_fit > rand_mean


def test_device_fitness_with_fused_runner():
    from flexs_tpu.runtime import DeviceAdaleadNAM

    problem = rosetta.registry()["3msi"]
    land = rosetta.RosettaFolding(**problem["params"])
    runner = DeviceAdaleadNAM(
        land,
        flexs.AAS,
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence=problem["starts"]["ed_3_wt"],
        signal_strength=1.0,
        seed=0,
    )
    df, _ = runner.run(verbose=False)
    assert df["round"].max() == 2
    assert np.isfinite(df["true_score"]).all()
