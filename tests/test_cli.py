"""`flexs-tpu-sweep` console entry point (flexs_tpu/cli.py).

The packaged replacement for the reference's cloud runner scripts
(reference paper_code/cloud/runner.py:90-126); both the shared-table
Adalead fast path and the generic algorithm/model routing are driven
end-to-end here.
"""
import os

import pandas as pd

from flexs_tpu import cli


def test_cli_fast_path(tmp_path):
    out = str(tmp_path / "sweep.csv")
    rc = cli.main(
        [
            "--landscapes", "SIX6_REF_R1",
            "--starts", "1",
            "--signal-strengths", "1.0",
            "--rounds", "2",
            "--batch", "5",
            "--queries", "20",
            "--out", out,
        ]
    )
    assert rc == 0
    df = pd.read_csv(out)
    assert len(df) == 1
    assert (df["max_fitness"] >= df["start_fitness"]).all()


def test_cli_generic_path_with_checkpoint(tmp_path):
    out = str(tmp_path / "sweep.csv")
    ckpt = str(tmp_path / "ckpt")
    argv = [
        "--landscapes", "SIX6_REF_R1",
        "--starts", "2",
        "--signal-strengths", "1.0",
        "--seeds", "0", "1",
        "--rounds", "2",
        "--batch", "5",
        "--queries", "20",
        "--algorithm", "ga",
        "--chunk-size", "2",
        "--checkpoint-dir", ckpt,
        "--no-mesh",
        "--out", out,
    ]
    assert cli.main(argv) == 0
    df1 = pd.read_csv(out)
    assert len(df1) == 4
    assert list(df1["landscape"].unique()) == ["SIX6_REF_R1"]
    assert sorted(f for f in os.listdir(ckpt) if f.endswith(".npz")) == [
        "chunk_00000.npz",
        "chunk_00001.npz",
    ]
    # Rerun resumes from the checkpoints and reproduces the summary.
    assert cli.main(argv) == 0
    assert pd.read_csv(out).equals(df1)


def test_cli_surrogate_arch_flag(tmp_path):
    """--model surrogate --surrogate-arch gp sweeps the exact-GP family."""
    out = str(tmp_path / "sweep.csv")
    rc = cli.main(
        [
            "--landscapes", "SIX6_REF_R1",
            "--starts", "1",
            "--rounds", "2",
            "--batch", "5",
            "--queries", "20",
            "--algorithm", "gpr_bo",
            "--model", "surrogate",
            "--surrogate-arch", "gp",
            "--no-mesh",
            "--out", out,
        ]
    )
    assert rc == 0
    df = pd.read_csv(out)
    assert len(df) == 1
    assert (df["max_fitness"] >= df["start_fitness"]).all()
