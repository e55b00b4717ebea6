"""Native (C++) scorer agreement tests against the JAX device kernels."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu import native
from flexs_tpu.alphabet import Alphabet
from flexs_tpu.landscapes import rna, rosetta
from flexs_tpu.ops import rna_duplex
from flexs_tpu.utils import sequence_utils as s_utils


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


def test_rosetta_native_matches_device(lib):
    land = rosetta.RosettaFolding(**rosetta.registry()["3msi"]["params"])
    aa = Alphabet(flexs.AAS)
    seqs = s_utils.generate_random_sequences(
        66, 64, flexs.AAS, rng=np.random.default_rng(0)
    ) + [land.wt_sequence]
    tokens = aa.encode(seqs)
    device = np.asarray(land.fitness_from_tokens(tokens))
    host = native.rosetta_score_batch(land, tokens)
    np.testing.assert_allclose(host, device, rtol=1e-4, atol=1e-5)


def test_rna_native_matches_device(lib):
    rna_alpha = Alphabet(flexs.RNAA)
    target = rna.registry()["L14_RNA1"]["params"]["targets"][0]
    seqs = s_utils.generate_random_sequences(
        14, 64, flexs.RNAA, rng=np.random.default_rng(1)
    )
    tokens = rna_alpha.encode(seqs)
    t_tokens = rna_alpha.encode_one(target)
    params = rna_duplex.DuplexParams.calibrated()
    device = np.asarray(rna_duplex.duplex_energy_batch(tokens, t_tokens, params))
    host = native.rna_duplex_energy_batch(tokens, t_tokens, params)
    np.testing.assert_allclose(host, device, rtol=1e-4, atol=1e-3)
