"""AAV landscape tests (reference tests/test_landscapes.py:8-13 + more)."""
import numpy as np

import flexs_tpu as flexs
from flexs_tpu.landscapes import additive_aav_packaging as aav
from flexs_tpu.utils import sequence_utils as s_utils


def test_registry_six_phenotypes():
    problems = aav.registry()
    assert sorted(problems) == [
        "blood",
        "heart",
        "kidney",
        "liver",
        "lung",
        "spleen",
    ]
    for p in problems.values():
        assert p["params"]["start"] == 450 and p["params"]["end"] == 540


def test_scores_random_sequences():
    problem = aav.registry()["heart"]
    landscape = aav.AdditiveAAVPackaging(**problem["params"])
    seqs = s_utils.generate_random_sequences(
        90, 100, flexs.AAS, rng=np.random.default_rng(0)
    )
    scores = landscape.get_fitness(seqs)
    assert scores.shape == (100,)
    assert (scores >= 0).all()
    assert landscape.cost == 100


def test_wild_type_scores_reasonably():
    landscape = aav.AdditiveAAVPackaging(phenotype="heart", start=450, end=540)
    wt_score = landscape.get_fitness([landscape.wild_type])[0]
    rand = s_utils.generate_random_sequences(
        90, 50, flexs.AAS, rng=np.random.default_rng(1)
    )
    rand_mean = landscape.get_fitness(rand).mean()
    # WT (all-zero log2 terms) must beat random mutants on average.
    assert wt_score > rand_mean


def test_top_seq_achieves_max_fitness():
    landscape = aav.AdditiveAAVPackaging(phenotype="lung", start=450, end=540)
    top = landscape.get_fitness([landscape.top_seq])[0]
    others = landscape.get_fitness(
        s_utils.generate_random_sequences(
            90, 20, flexs.AAS, rng=np.random.default_rng(2)
        )
    )
    assert top >= others.max()
    # With mfm=1, the normalized max is (max + max) / (2 * max) = 1 when
    # every position's best residue is viable.
    assert 0.9 <= top <= 1.0 + 1e-6


def test_additivity():
    landscape = aav.AdditiveAAVPackaging(phenotype="blood", start=450, end=540)
    wt = landscape.wild_type
    norm = landscape.max_possible * (landscape.mfm + 1)
    offset = landscape.mfm * landscape.max_possible

    # Single mutant effect should add up exactly (pre-clip linearity).
    m1 = "A" + wt[1:]
    m2 = wt[:10] + "C" + wt[11:]
    m12 = "A" + wt[1:10] + "C" + wt[11:]
    f = landscape.get_fitness([wt, m1, m2, m12])
    delta1 = f[1] - f[0]
    delta2 = f[2] - f[0]
    np.testing.assert_allclose(f[3], f[0] + delta1 + delta2, atol=1e-5)
    assert norm > 0 and offset > 0


def test_noise_seeded_and_clipped():
    landscape = aav.AdditiveAAVPackaging(
        phenotype="heart", start=450, end=540, noise=0.5, seed=3
    )
    seqs = s_utils.generate_random_sequences(
        90, 50, flexs.AAS, rng=np.random.default_rng(4)
    )
    a = landscape.get_fitness(seqs)
    assert (a >= 0).all()
    landscape2 = aav.AdditiveAAVPackaging(
        phenotype="heart", start=450, end=540, noise=0.5, seed=3
    )
    b = landscape2.get_fitness(seqs)
    np.testing.assert_allclose(a, b)


def test_device_fitness_with_fused_runner():
    from flexs_tpu.runtime import DeviceAdaleadNAM

    landscape = aav.AdditiveAAVPackaging(phenotype="heart", start=450, end=540)
    runner = DeviceAdaleadNAM(
        landscape,
        flexs.AAS,
        rounds=2,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence=landscape.wild_type,
        signal_strength=1.0,
        seed=0,
    )
    df, _ = runner.run(verbose=False)
    assert df["round"].max() == 2
    assert (df["true_score"] >= 0).all()
