"""Generic landscape-family sweeps + golden-band regression on L14_RNA1.

The golden band pins end-to-end behavior against the reference's shipped
robustness demo (examples/robustness/adalead/*.csv: max fitness 0.89-1.06
over signal strengths on L14_RNA1 at rounds=5, batch=100, queries=1000).
"""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.landscapes import additive_aav_packaging as aav
from flexs_tpu.landscapes import rna
from flexs_tpu.parallel import run_landscape_robustness_sweep


def test_generic_sweep_rna_family():
    problems = {
        n: p
        for n, p in rna.registry().items()
        if n.startswith("L14_RNA") and "+" not in n
    }
    landscapes = [rna.RNABinding(**p["params"]) for p in problems.values()]
    start = list(problems.values())[0]["starts"][1]
    df = run_landscape_robustness_sweep(
        landscapes,
        flexs.RNAA,
        starts=[start],
        signal_strengths=[1.0],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
    )
    assert len(df) == 4
    assert (df["max_fitness"] >= df["start_fitness"]).all()


def test_generic_sweep_rejects_mixed_families():
    l_rna = rna.RNABinding(**rna.registry()["L14_RNA1"]["params"])
    l_aav = aav.AdditiveAAVPackaging(phenotype="heart", start=450, end=540)
    with pytest.raises(ValueError):
        run_landscape_robustness_sweep(
            [l_rna, l_aav], flexs.RNAA, starts=["A" * 14]
        )


def test_generic_sweep_chunking_consistency():
    landscapes = [
        aav.AdditiveAAVPackaging(phenotype=p, start=450, end=540)
        for p in ["heart", "lung"]
    ]
    kw = dict(
        alphabet=flexs.AAS,
        starts=[landscapes[0].wild_type],
        signal_strengths=[1.0, 0.5],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
    )
    a = run_landscape_robustness_sweep(landscapes, **kw)
    b = run_landscape_robustness_sweep(landscapes, chunk_size=3, **kw)
    np.testing.assert_allclose(
        a["max_fitness"].to_numpy(), b["max_fitness"].to_numpy()
    )


def test_golden_band_l14_rna1_robustness():
    """Fused Adalead+NAM on L14_RNA1 must land in the reference's band.

    Reference demo (5 rounds x 100 x 1000 queries) reached max fitness
    0.89-1.06 across signal strengths; a smaller-budget run must still
    clear 0.8 and stay below the theoretical-ish ceiling.
    """
    problem = rna.registry()["L14_RNA1"]
    landscape = rna.RNABinding(**problem["params"])
    df = run_landscape_robustness_sweep(
        [landscape],
        flexs.RNAA,
        starts=[problem["starts"][1]],
        signal_strengths=[0.0, 0.5, 0.9, 1.0],
        rounds=5,
        sequences_batch_size=50,
        model_queries_per_batch=500,
    )
    assert (df["max_fitness"] > 0.8).all(), df["max_fitness"].tolist()
    assert (df["max_fitness"] < 1.2).all()
    # Stronger signal should not hurt much: best ss>=0.9 beats ss=0 - slack.
    strong = df[df["signal_strength"] >= 0.9]["max_fitness"].max()
    weak = df[df["signal_strength"] == 0.0]["max_fitness"].max()
    assert strong > weak - 0.15


@pytest.mark.parametrize("algorithm,kwargs", [
    ("ga", {"population_size": 8, "children_proportion": 0.5}),
    ("cmaes", {"population_size": 8}),
])
def test_generic_sweep_algorithm_selection(algorithm, kwargs):
    landscapes = [
        aav.AdditiveAAVPackaging(phenotype=p, start=450, end=540)
        for p in ["heart", "lung"]
    ]
    df = run_landscape_robustness_sweep(
        landscapes,
        flexs.AAS,
        starts=[landscapes[0].wild_type],
        signal_strengths=[1.0],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        algorithm=algorithm,
        algorithm_kwargs=kwargs,
    )
    assert len(df) == 2
    assert (df["model_cost"] > 0).all()


def test_sweep_checkpoint_resume(tmp_path):
    """Chunked sweeps checkpoint per chunk and resume identically."""
    import os

    from flexs_tpu.landscapes import tf_binding

    ckpt = str(tmp_path / "sweep_ckpt")
    land = flexs.landscapes.TFBinding(name="SIX6_REF_R1")
    kw = dict(
        starts=tf_binding.STARTS[:2],
        signal_strengths=[0.9],
        seeds=[0, 1],
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        chunk_size=2,
        checkpoint_dir=ckpt,
    )
    df1 = run_landscape_robustness_sweep([land], "TGCA", **kw)
    chunks = sorted(f for f in os.listdir(ckpt) if f.endswith(".npz"))
    assert chunks == ["chunk_00000.npz", "chunk_00001.npz"]

    # Full resume: every chunk loads from disk, results identical.
    df2 = run_landscape_robustness_sweep([land], "TGCA", **kw)
    assert df1.equals(df2)

    # Partial resume: one chunk recomputes, the other loads.
    os.remove(os.path.join(ckpt, "chunk_00001.npz"))
    df3 = run_landscape_robustness_sweep([land], "TGCA", **kw)
    assert df1.equals(df3)

    # A different sweep must refuse to reuse the directory.
    with pytest.raises(ValueError, match="DIFFERENT sweep"):
        run_landscape_robustness_sweep([land], "TGCA", **{**kw, "seeds": [5, 6]})

    # Landscape identity is part of the signature too.
    other = flexs.landscapes.TFBinding(name="POU3F4_REF_R1")
    with pytest.raises(ValueError, match="DIFFERENT sweep"):
        run_landscape_robustness_sweep([other], "TGCA", **kw)

    # A corrupt (truncated) manifest fails loudly instead of resuming.
    with open(os.path.join(ckpt, "manifest.json"), "w") as f:
        f.write('{"signa')
    with pytest.raises(ValueError, match="corrupt"):
        run_landscape_robustness_sweep([land], "TGCA", **kw)
