"""RNA binding and folding landscapes (ViennaRNA rebuilt on device).

Parity contract (reference flexs/landscapes/rna.py):
  * `RNABinding(targets, seq_length, conserved_region)` — fitness is the
    mean over targets of duplex binding energy normalized by the perfect-
    complement minimum energy scaled to seq_length (:75-85, :108-112);
    sequences violating the conserved region score 0 (:98-105); name
    "RNABinding_T{targets}_L{seq_length}" (:64).
  * `RNAFolding(norm_value)` — fitness = -MFE / norm_value (:15-27).
  * `registry()` — 4 hidden 100-nt targets, starts for L in {14, 50, 100},
    single-target, two-target, and conserved two-target problems, 36 in
    total (:119-210; target/start strings reproduced verbatim — they are
    benchmark data, not code).

TPU-first design: the ViennaRNA C calls (one per sequence per target,
reference rna.py:110) are replaced by the batched device DP of
flexs_tpu.ops.rna_duplex — a whole proposal batch scores in one jitted
call per target, and `device_fitness()` exposes the pure-fn form for the
fused runner and sweep engine.  The energy model is calibrated against
oracle outputs shipped with the reference (scripts/calibrate_rna.py).
"""
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.alphabet import RNAA, Alphabet
from flexs_tpu.landscape import Landscape
from flexs_tpu.ops import rna_duplex, rna_fold
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.types import SEQUENCES_TYPE

_RNA = Alphabet(RNAA)
_COMPLEMENTS = {"A": "U", "C": "G", "G": "C", "U": "A"}


def _rna_binding_fitness(params, tokens):
    """Pure fitness: mean over targets of normalized duplex energy.

    params = (targets_rev [T, L2], energy-model pytree, norms [T],
              conserved_pattern [L1] (-1 where unconstrained)).
    Module-level for stable jit identity (fused runners key on it).
    """
    targets_rev, em, norms, conserved = params
    maxloop = em["interior_cost"].shape[0] - 2

    def one_target(target_rev, norm):
        e = rna_duplex.duplex_energy_from_slabs(tokens, target_rev, em, maxloop)
        return e / norm

    fit = jnp.mean(jax.vmap(one_target)(targets_rev, norms), axis=0)
    ok = jnp.all((conserved < 0) | (tokens == conserved[None, :]), axis=1)
    return jnp.where(ok, fit, 0.0)


def _rna_binding_fitness_pallas(params, tokens):
    """`_rna_binding_fitness` with the Pallas duplex kernel as the oracle.

    Bit-exact vs the slab path (the kernel's contract, gated every bench
    run); a fused 10-round L100 Adalead run drops 1.98 s -> 0.96 s with
    it (measured A/B, median of 3).  Selected by
    `RNABinding.device_fitness()` on the TPU backend only — in interpret
    mode (CPU tests) the kernel is much slower than the XLA slab scan.
    """
    from flexs_tpu.ops import pallas_duplex

    targets_rev, em, norms, conserved = params
    maxloop = em["interior_cost"].shape[0] - 2
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted

    def one_target(target_rev, norm):
        e = pallas_duplex._pallas_duplex_batch(
            tokens, target_rev, em, maxloop, interpret
        )
        return e / norm

    fit = jnp.mean(jax.vmap(one_target)(targets_rev, norms), axis=0)
    ok = jnp.all((conserved < 0) | (tokens == conserved[None, :]), axis=1)
    return jnp.where(ok, fit, 0.0)


class RNABinding(Landscape):
    """RNA binding affinity to one or more hidden targets."""

    def __init__(
        self,
        targets: List[str],
        seq_length: int,
        conserved_region: Optional[Dict] = None,
        params: Optional[rna_duplex.DuplexParams] = None,
        use_pallas: bool = False,
    ):
        """Create an RNABinding landscape.

        Args:
            targets: Binding-target RNA strings; fitness is the mean of the
                per-target normalized binding energies.
            seq_length: Length of sequences to be evaluated.
            conserved_region: Optional `{"start": int, "pattern": str}`;
                violating sequences score 0 ("swampland").
            params: Duplex energy parameters (default: calibrated set).
            use_pallas: Score direct `get_fitness` batches through the
                Pallas VMEM-window kernel (flexs_tpu.ops.pallas_duplex)
                instead of the XLA scan path.  Independent of this flag,
                the fused-runner `device_fitness` path picks the Pallas
                kernel automatically on the TPU backend.
        """
        super().__init__(name=f"RNABinding_T{targets}_L{seq_length}")

        self.targets = targets
        self.seq_length = seq_length
        self.conserved_region = conserved_region
        self.use_pallas = use_pallas
        self.params = params or rna_duplex.DuplexParams.calibrated()

        self.norm_values = self.compute_min_binding_energies()

        # Assemble the traced fitness params once.
        target_rev = jnp.asarray(
            np.stack([_RNA.encode_one(t)[::-1] for t in targets])
        )
        conserved = np.full(seq_length, -1, np.int32)
        if conserved_region is not None:
            start = conserved_region["start"]
            pattern = _RNA.encode_one(conserved_region["pattern"])
            conserved[start : start + len(pattern)] = pattern
        self._fitness_params = (
            target_rev,
            self.params.energy_model(),
            jnp.asarray(self.norm_values, jnp.float32),
            jnp.asarray(conserved),
        )
        self._jit_fitness = jax.jit(_rna_binding_fitness)

    def compute_min_binding_energies(self) -> np.ndarray:
        """Lowest possible binding energy per target (perfect complement)."""
        energies = []
        for target in self.targets:
            complement = "".join(_COMPLEMENTS[x] for x in target)[::-1]
            e = float(
                rna_duplex.duplex_energy_batch(
                    _RNA.encode([complement]),
                    _RNA.encode_one(target),
                    self.params,
                )[0]
            )
            energies.append(e * self.seq_length / len(target))
        return np.array(energies)

    def fitness_from_tokens(self, tokens) -> jnp.ndarray:
        """Device fast path over int[batch, L] RNA tokens."""
        if self.use_pallas:
            return self._pallas_fitness(tokens)
        return self._jit_fitness(self._fitness_params, jnp.asarray(tokens))

    def _pallas_fitness(self, tokens) -> jnp.ndarray:
        # Reuse the device-cached params (reversed target tokens + energy
        # model): re-encoding targets per call uploaded a fresh host
        # array per target per call (~40 ms each through the relay).
        return _rna_binding_fitness_pallas(
            self._fitness_params, jnp.asarray(tokens)
        )

    def device_fitness(self):
        """(pure fitness fn, params) pair for fused device runners.

        On the TPU backend the oracle is the Pallas kernel (bit-exact,
        ~2.4x faster end-to-end in fused runs); elsewhere the XLA slab
        scan (fast under interpret-mode-free CPU testing).
        """
        if jax.default_backend() == "tpu":
            return _rna_binding_fitness_pallas, self._fitness_params
        return _rna_binding_fitness, self._fitness_params

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        seqs = list(sequences)
        for seq in seqs:
            if len(seq) != self.seq_length:
                raise ValueError(
                    f"All sequences in `sequences` must be of length "
                    f"{self.seq_length}"
                )
        tokens = _RNA.encode(seqs)
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        scores = self.fitness_from_tokens(pad_rows(tokens, bucket))
        return np.asarray(scores[:n], dtype=np.float64)


class RNAFolding(Landscape):
    """RNA folding stability landscape (negative MFE).

    The oracle is the Turner-structured Zuker DP of
    flexs_tpu.ops.rna_fold (hairpin size curve, bulge/interior/1x1 terms
    from the calibrated duplex tables, affine multiloop closure,
    dangles=2 helix-end mismatches, tetraloop/triloop bonuses) — the
    device analog of the reference's `RNA.fold` call (reference
    rna.py:15-27).  Absolute calibration vs `RNA.fold` remains blocked in
    this environment (BASELINE.md); structural fidelity is test-pinned
    against an independent NumPy Zuker implementation and the
    Turner-model orderings Nussinov+stack provably got wrong.
    """

    def __init__(self, norm_value: float = 1, params=None):
        """Create an RNAFolding landscape.

        Args:
            norm_value: Normalization divisor (fitness = -MFE / norm).
            params: Duplex energy parameters the fold model derives its
                sequence-dependent tables from (default: calibrated set).
        """
        super().__init__(name="RNAFolding")
        self.norm_value = norm_value
        p = params or rna_duplex.DuplexParams.calibrated()
        self._fold_em = rna_fold.fold_energy_model(p)

    def fitness_from_tokens(self, tokens) -> jnp.ndarray:
        return _folding_fitness_fn(
            (self._fold_em, jnp.float32(self.norm_value)), jnp.asarray(tokens)
        )

    def device_fitness(self):
        """(pure fitness fn, params) pair for fused device runners."""
        return _folding_fitness_fn, (
            self._fold_em,
            jnp.float32(self.norm_value),
        )

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        # The reference RNAFolding folds each string independently
        # (reference rna.py:15-27, no fixed length) — batch per length so
        # mixed-length queries work on the rectangular token path.
        seqs = list(sequences)
        out = np.empty(len(seqs), np.float64)
        by_len: Dict[int, list] = {}
        for i, s in enumerate(seqs):
            by_len.setdefault(len(s), []).append(i)
        for idxs in by_len.values():
            tokens = _RNA.encode([seqs[i] for i in idxs])
            out[idxs] = np.asarray(
                self.fitness_from_tokens(tokens), dtype=np.float64
            )
        return out


def _folding_fitness_fn(params, tokens):
    """Module-level pure fn (stable jit-cache identity across instances)."""
    em, norm = params
    maxloop = em["interior_cost"].shape[0] - 2
    return -rna_fold.zuker_mfe_batch(tokens, em, maxloop) / norm


def registry() -> Dict[str, Dict]:
    """Return the benchmark problems (reference rna.py:119-210 verbatim)."""
    targets = [
        "GAACGAGGCACAUUCCGGCUCGCCCGGCCCAUGUGAGCAUGGGCCGGACCCCGUCCGCGCGGGGCCCCCGCGCGGACGGGGGCGAGCCGGAAUGUGCCUC",  # noqa: E501
        "GAGGCACAUUCCGGCUCGCCCCCGUCCGCGCGGGGGCCCCGCGCGGACGGGGUCCGGCCCGCGCGGGGCCCCCGCGCGGGAGCCGGAAUGUGCCUCGUUC",  # noqa: E501
        "CCGGUGAUACUGUUAGUGGUCACGGUGCAUUUAUAGCGCUAAAGUACAGUCUUCCCCUGUUGAACGGCGCCAUUGCAUACAGGGCCAGCCGCGUAACGCC",  # noqa: E501
        "UAAGAGAGCGUAAAAAUAGAGAUAUGUUCUUGGGUCAGGGCUAUGCGUACCCCAUGAGAGUAAAUCAUACCCCCAAUGGGCUUCGGCGGAAAUUCACUUA",  # noqa: E501
    ]

    starts = {
        14: {
            1: "AUGGGCCGGACCCC",
            2: "GCCCCGCCGGAAUG",
            3: "UCUUGGGGACUUUU",
            4: "GGAUAACAAUUCAU",
            5: "CCCAUGCGCGAUCA",
        },
        50: {
            1: "GAACGAGGCACAUUCCGGCUCGCCCGGCCCAUGUGAGCAUGGGCCGGACC",
            2: "CCGUCCGCGCGGGGCCCCCGCGCGGACGGGGGCGAGCCGGAAUGUGCCUC",
            3: "AUGUUUCUUUUAUUUAUCUGAGCAUGGGCGGGGCAUUUGCCCAUGCAAUU",
            4: "UAAACGAUGCUUUUGCGCCUGCAUGUGGGUUAGCCGAGUAUCAUGGCAAU",
            5: "AGGGAAGAUUAGAUUACUCUUAUAUGACGUAGGAGAGAGUGCGGUUAAGA",
        },
        100: {
            1: "GAACGAGGCACAUUCCGGCUCGCCCGGCCCAUGUGAGCAUGGGCCGGACCCCGUCCGCGCGGGGCCCCCGCGCGGACGGGGGCGAGCCGGAAUGUGCCUC",  # noqa: E501
            2: "AGCAUCUCGCCGUGGGGGCGGGCCCGGCCCAUGUGAGCAUGCGUAGGUUUAUCCCAUAGAGGACCCCGGGAGAACUGUCCAAUUGGCUCCUAGCCCACGC",  # noqa: E501
            3: "GGCGGAUACUAGACCCUAUUGGCCCGGCCCAUGUGAGCAUGGCCCCAGAUCUUCCGCUCACUCGCAUAUUCCCUCCGGUUAAGUUGCCGUUUAUGAAGAU",  # noqa: E501
            4: "UUGCAGGUCCCUACACCUCCGGCCCGGCCCAUGUGACCAUGAAUAGUCCACAUAAAAACCGUGAUGGCCAGUGCAGUUGAUUCCGUGCUCUGUACCCUUU",  # noqa: E501
            5: "UGGCGAUGAGCCGAGCCGCCAUCGGACCAUGUGCAAUGUAGCCGUUCGUAGCCAUUAGGUGAUACCACAGAGUCUUAUGCGGUUUCACGUUGAGAUUGCA",  # noqa: E501
        },
    }

    problems = {}

    for t in range(len(targets)):
        for length, start in starts.items():
            problems[f"L{length}_RNA{t + 1}"] = {
                "params": {"targets": [targets[t]], "seq_length": length},
                "starts": start,
            }

    for t1 in range(len(targets)):
        for t2 in range(t1 + 1, len(targets)):
            for length, start in starts.items():
                problems[f"L{length}_RNA{t1 + 1}+{t2 + 1}"] = {
                    "params": {
                        "targets": [targets[t1], targets[t2]],
                        "seq_length": length,
                    },
                    "starts": start,
                }

    for t1 in range(len(targets)):
        for t2 in range(t1 + 1, len(targets)):
            problems[f"C20_L100_RNA{t1 + 1}+{t2 + 1}"] = {
                "params": {
                    "targets": [targets[t1], targets[t2]],
                    "seq_length": 100,
                    "conserved_region": {
                        "start": 21,
                        "pattern": "GCCCGGCCCAUGUGAGCAUG",
                    },
                },
                "starts": starts[100],
            }

    return problems
