"""Parity checks against artifacts shipped with the reference.

Skipped wholesale when the read-only reference tree is not mounted.
"""
import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

import flexs_tpu as flexs

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


def test_tf_binding_scores_match_raw_tsv():
    """Packed table scores must equal the reference's raw measurements."""
    tsvs = glob.glob(f"{REFERENCE}/flexs/landscapes/data/tf_binding/*")
    assert tsvs, "no raw TF-binding TSVs found"
    tsv = sorted(tsvs)[0]
    name = os.path.basename(tsv).split("_8mers")[0]

    data = pd.read_csv(tsv, sep="\t")
    score = data["E-score"].to_numpy(np.float64)
    norm = (score - score.min()) / (score.max() - score.min())
    seqs = data["8-mer"].tolist()[:500]
    expected = norm[:500]

    landscape = flexs.landscapes.TFBinding(landscape_file=tsv)
    np.testing.assert_allclose(
        landscape.get_fitness(seqs), expected, atol=1e-6
    )
    # The packed registry entry (if this TSV was packed) must agree too.
    registry = flexs.landscapes.tf_binding.registry()
    for reg_name in registry:
        if reg_name.startswith(name):
            packed = flexs.landscapes.TFBinding(**registry[reg_name]["params"])
            np.testing.assert_allclose(
                packed.get_fitness(seqs), expected, atol=1e-6
            )
            break


def test_log_format_matches_reference_files(tmp_path):
    """Metadata keys + CSV schema must match the reference's shipped logs."""
    ref_log = sorted(glob.glob(f"{REFERENCE}/examples/robustness/adalead/*.csv"))[0]
    with open(ref_log) as f:
        ref_meta = json.loads(f.readline())
        ref_header = f.readline().strip()

    class FakeModel(flexs.Model):
        def __init__(self):
            super().__init__(name="FakeModel")

        def train(self, *a):
            pass

        def _fitness_function(self, seqs):
            return np.random.default_rng(0).random(len(seqs))

    log = tmp_path / "run.csv"
    explorer = flexs.baselines.explorers.Random(
        FakeModel(),
        rounds=1,
        sequences_batch_size=3,
        model_queries_per_batch=10,
        starting_sequence="TTGCAGCA",
        alphabet=flexs.DNAA,
        seed=0,
        log_file=str(log),
    )

    class FakeLandscape(flexs.Landscape):
        def __init__(self):
            super().__init__(name="L")

        def _fitness_function(self, seqs):
            return np.random.default_rng(1).random(len(seqs))

    explorer.run(FakeLandscape(), verbose=False)
    with open(log) as f:
        meta = json.loads(f.readline())
        header = f.readline().strip()

    assert set(meta.keys()) == set(ref_meta.keys())
    assert header == ref_header


def test_registry_problem_names_match_reference():
    """RNA/Rosetta/AAV registries must expose the reference's problem names."""
    import importlib.util

    def load_ref(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except Exception:
            return None
        return mod

    # RNA registry is import-safe (ViennaRNA guarded).
    ref_rna = load_ref("ref_rna", f"{REFERENCE}/flexs/landscapes/rna.py")
    if ref_rna is not None:
        assert set(flexs.landscapes.rna.registry()) == set(ref_rna.registry())

    # AAV registry matches the reference's hard-coded set.
    assert set(flexs.landscapes.additive_aav_packaging.registry()) == {
        "heart",
        "lung",
        "kidney",
        "liver",
        "blood",
        "spleen",
    }
    assert set(flexs.landscapes.rosetta.registry()) == {"3msi", "3mx7"}


def test_public_api_surface_matches_reference():
    """Every public name the reference package exports must exist here.

    The lists mirror the reference's __init__ exports verbatim
    (reference flexs/__init__.py:3-11, baselines/models/__init__.py:2-16,
    baselines/explorers/__init__.py:2-11, landscapes/__init__.py:2-7,
    utils/sequence_utils.py:20-108) so that "existing FLEXS experiment
    code ports by changing the import" stays true by construction.
    """
    import flexs_tpu.baselines.explorers as explorers
    import flexs_tpu.baselines.models as models
    import flexs_tpu.landscapes as landscapes
    import flexs_tpu.utils.sequence_utils as su

    surface = {
        flexs: [
            "Landscape", "Model", "LandscapeAsModel", "Ensemble",
            "Explorer", "baselines", "evaluate", "landscapes", "types",
        ],
        explorers: [
            "Adalead", "BO", "GPR_BO", "CbAS", "VAE", "CMAES", "DQN",
            "DynaPPO", "DynaPPOMutative", "GeneticAlgorithm", "PPO",
            "Random", "environments",
        ],
        models: [
            "AdaptiveEnsemble", "CNN", "GlobalEpistasisModel",
            "KerasModel", "MLP", "NoisyAbstractModel", "LinearRegression",
            "LogisticRegression", "RandomForest",
        ],
        landscapes: [
            "rna", "AdditiveAAVPackaging", "BertGFPBrightness",
            "RNABinding", "RosettaFolding", "TFBinding",
        ],
        su: [
            "construct_mutant_from_sample", "string_to_one_hot",
            "one_hot_to_string", "generate_single_mutants",
            "generate_random_sequences", "generate_random_mutant",
        ],
    }
    missing = [
        f"{mod.__name__}.{name}"
        for mod, names in surface.items()
        for name in names
        if not hasattr(mod, name)
    ]
    assert not missing, missing
