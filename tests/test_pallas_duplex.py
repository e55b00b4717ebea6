"""Pallas duplex-DP kernel agreement tests (interpret mode on CPU mesh)."""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.alphabet import Alphabet
from flexs_tpu.landscapes import rna
from flexs_tpu.ops import rna_duplex as rd
from flexs_tpu.ops.pallas_duplex import duplex_energy_batch_pallas
from flexs_tpu.utils import sequence_utils as s_utils

A = Alphabet(flexs.RNAA)
TARGET = rna.registry()["L14_RNA1"]["params"]["targets"][0]


@pytest.mark.parametrize("length,batch", [(14, 16), (50, 8)])
def test_pallas_matches_xla(length, batch):
    seqs = s_utils.generate_random_sequences(
        length, batch, flexs.RNAA, rng=np.random.default_rng(0)
    )
    tokens = A.encode(seqs)
    t_tokens = A.encode_one(TARGET)
    params = rd.DuplexParams.calibrated()
    ref = np.asarray(rd.duplex_energy_batch(tokens, t_tokens, params))
    pal = np.asarray(duplex_energy_batch_pallas(tokens, t_tokens, params))
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-4)


def test_pallas_handles_unpairable_sequence():
    # Poly-C against a GC-free region can still pair (C-G); use a sequence
    # of all A against an all-A target region -> no pairs -> energy 0.
    tokens = A.encode(["AAAAAAAAAAAAAA"])
    target = A.encode_one("A" * 20)
    out = np.asarray(duplex_energy_batch_pallas(tokens, target))
    assert out[0] == 0.0


def test_landscape_pallas_fitness_matches_xla():
    """The fused-runner Pallas oracle == the XLA slab oracle at the
    landscape level (multi-target mean, normalization, conserved-region
    zeroing) — the contract behind `RNABinding.device_fitness()`'s
    TPU-backend switch."""
    import jax

    reg = rna.registry()
    targets = reg["L14_RNA1+2"]["params"]["targets"]
    land = rna.RNABinding(
        targets=targets,
        seq_length=14,
        conserved_region={"start": 2, "pattern": "CCGG"},
    )
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 4, size=(8, land.seq_length)).astype(np.int32)
    toks[0, 2:6] = A.encode_one("CCGG")  # one conserved-satisfying row
    import jax.numpy as jnp

    toks = jnp.asarray(toks)
    a = np.asarray(rna._rna_binding_fitness_pallas(land._fitness_params, toks))
    b = np.asarray(jax.jit(rna._rna_binding_fitness)(land._fitness_params, toks))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # Off TPU, device_fitness must select the XLA fn (interpret-mode
    # Pallas is far slower than the slab scan).
    fn, _ = land.device_fitness()
    assert fn is rna._rna_binding_fitness
