"""Additive AAV packaging landscape ("rough Mt. Fuji").

Parity contract (reference landscapes/additive_aav_packaging.py):
  * `AdditiveAAVPackaging(phenotype, minimum_fitness_multiplier, start,
    end, noise)` — name "AdditiveAAVPackaging_phenotype={p}" (:55); fitness
    of a sequence is the SUM of per-position per-residue log2 fitness
    values over [start, end) (:101-107), normalized by
    `max_possible * (mfm + 1)` with `mfm * max_possible` added first
    (:109-113), plus optional Gaussian noise, clipped at 0 (:114-116).
  * `compute_max_possible` picks, per position, the best residue whose
    `log2_packaging_v_wt > -6` (:80-98).
  * `registry()` — 6 phenotypes over region 450-540 (:121-147).
  * `AAV2_WT` capsid sequence reproduced verbatim (it is data, :9-21).

Data: the reference's measured `AAV2_single_subs.json` is stripped from
the mounted tree (.MISSING_LARGE_BLOBS); scripts/build_aav_data.py
generates a documented schema-identical synthetic substitute (same
positions, residues, phenotype keys, viability cutoff semantics).

TPU-first design: the per-position dict walk of the reference (:101-107)
becomes a single [L, 20] fitness-matrix gather-and-sum on device; the
whole proposal batch scores in one jitted call, and `device_fitness()`
plugs into the fused runner / sweep engine (noise=0 path — the registry
problems are noiseless).
"""
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.alphabet import AAS, Alphabet
from flexs_tpu.landscape import Landscape
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.types import SEQUENCES_TYPE

AAV2_WT = (
    "MAADGYLPDWLEDTLSEGIRQWWKLKPGPPPPKPAERHKDDSRGLVLPGYKYLGPFNGLD"
    "KGEPVNEADAAALEHDKAYDRQLDSGDNPYLKYNHADAEFQERLKEDTSFGGNLGRAVFQ"
    "AKKRVLEPLGLVEEPVKTAPGKKRPVEHSPVEPDSSSGTGKAGQQPARKRLNFGQTGDAD"
    "SVPDPQPLGQPPAAPSGLGTNTMATGSGAPMADNNEGADGVGNSSGNWHCDSTWMGDRVI"
    "TTSTRTWALPTYNNHLYKQISSQSGASNDNHYFGYSTPWGYFDFNRFHCHFSPRDWQRLI"
    "NNNWGFRPKRLNFKLFNIQVKEVTQNDGTTTIANNLTSTVQVFTDSEYQLPYVLGSAHQG"
    "CLPPFPADVFMVPQYGYLTLNNGSQAVGRSSFYCLEYFPSQMLRTGNNFTFSYTFEDVPF"
    "HSSYAHSQSLDRLMNPLIDQYLYYLSRTNTPSGTTTQSRLQFSQAGASDIRDQSRNWLPG"
    "PCYRQQRVSKTSADNNNSEYSWTGATKYHLNGRDSLVNPGPAMASHKDDEEKFFPQSGVL"
    "IFGKQGSEKTNVDIEKVMITDEEEIRTTNPVATEQYGSVSTNLQRGNRQAATADVNTQGV"
    "LPGMVWQDRDVYLQGPIWAKIPHTDGHFHPSPLMGGFGLKHPPPQILIKNTPVPANPSTT"
    "FSAAKFASFITQYSTGQVSVEIEWELQKENSKRWNPEIQYTSNYNKSVNVDFTVDTNGVY"
    "SEPRPIGTRYLTRNL"
)

_AA = Alphabet(AAS)
_DATA_FILE = os.path.join(
    os.path.dirname(__file__),
    "data",
    "additive_aav_packaging",
    "AAV2_single_subs.json",
)


def _aav_fitness_unclipped(params, tokens):
    """Normalized additive fitness BEFORE the zero clip (noise hooks here)."""
    fit_matrix, offset, norm = params
    raw = jnp.take_along_axis(
        fit_matrix[None, :, :],
        tokens[:, :, None],
        axis=2,
    ).sum(axis=(1, 2))
    return (raw + offset) / norm


def _aav_fitness(params, tokens):
    """Pure device fitness: one-hot gather-sum over the fitness matrix.

    params = (fit_matrix f32[L, 20], offset, norm): fitness =
    (sum_l fit_matrix[l, tok_l] + offset) / norm, clipped at 0 (the
    reference's noiseless path, additive_aav_packaging.py:109-116).
    Module-level for stable jit identity in fused runners.
    """
    return jnp.maximum(_aav_fitness_unclipped(params, tokens), 0.0)


class AdditiveAAVPackaging(Landscape):
    """Additive landscape from AAV2 capsid single-substitution data.

    Attributes:
        wild_type: AAV2 wild-type substring between `start` and `end`.
    """

    def __init__(
        self,
        phenotype: str = "heart",
        minimum_fitness_multiplier: float = 1,
        start: int = 0,
        end: int = 735,
        noise: float = 0,
        seed: Optional[int] = None,
    ):
        """Create an AdditiveAAVPackaging landscape.

        Args:
            phenotype: One of "heart", "lung", "kidney", "liver", "blood",
                "spleen".
            start: Starting index of the AAV subsequence to evaluate.
            end: Ending index of the AAV subsequence to evaluate.
            noise: Standard deviation of Gaussian noise added to fitness.
            seed: Seed for the noise generator (reference is unseeded).
        """
        super().__init__(f"AdditiveAAVPackaging_phenotype={phenotype}")

        self.sequences = {}
        self.phenotype = f"log2_{phenotype}_v_wt"
        self.mfm = minimum_fitness_multiplier
        self.start = start
        self.end = end
        self.noise = noise
        self.wild_type = AAV2_WT[start:end]
        self._rng = np.random.default_rng(seed)

        if not os.path.exists(_DATA_FILE):
            raise FileNotFoundError(
                f"{_DATA_FILE} not found; generate it with "
                "scripts/build_aav_data.py"
            )
        with open(_DATA_FILE) as f:
            self.data = {
                int(pos): val
                for pos, val in json.load(f).items()
                if self.start <= int(pos) < self.end
            }

        self.top_seq, self.max_possible = self.compute_max_possible()

        # Dense [L, 20] device fitness matrix (absent residues score 0,
        # matching the reference's `if s in self.data[...]` skip, :104).
        length = end - start
        matrix = np.zeros((length, len(AAS)), np.float32)
        for i in range(length):
            per_aa = self.data.get(self.start + i, {})
            for aa, entry in per_aa.items():
                if aa in AAS:
                    matrix[i, AAS.index(aa)] = entry[self.phenotype]
        self._fitness_params = (
            jnp.asarray(matrix),
            jnp.float32(self.mfm * self.max_possible),
            jnp.float32(self.max_possible * (self.mfm + 1)),
        )
        self._jit_fitness = jax.jit(_aav_fitness)
        self._jit_fitness_unclipped = jax.jit(_aav_fitness_unclipped)

    def compute_max_possible(self):
        """Best viable residue per position (packaging > -6 cutoff)."""
        best_seq = ""
        max_fitness = 0.0
        for pos in self.data:
            current_max = -10.0
            current_best = "M"
            for aa in self.data[pos]:
                current_fit = self.data[pos][aa][self.phenotype]
                if (
                    current_fit > current_max
                    and self.data[pos][aa]["log2_packaging_v_wt"] > -6
                ):
                    current_best = aa
                    current_max = current_fit
            best_seq += current_best
            max_fitness += current_max
        return best_seq, max_fitness

    def fitness_from_tokens(self, tokens) -> jnp.ndarray:
        """Noiseless device fast path over int[batch, L] AA tokens."""
        return self._jit_fitness(self._fitness_params, jnp.asarray(tokens))

    def device_fitness(self):
        """(pure fitness fn, params) pair for fused device runners.

        Only valid for noiseless landscapes: the device path scores the
        deterministic additive model, and silently dropping the Gaussian
        `noise` would make fused runs measure a DIFFERENT landscape than
        the host explorer baseline.
        """
        if self.noise:
            raise ValueError(
                "device_fitness() is noiseless; construct "
                "AdditiveAAVPackaging(noise=0) for fused runs or use the "
                "host get_fitness path"
            )
        return _aav_fitness, self._fitness_params

    def _get_raw_fitness(self, seq: str) -> float:
        total = 0.0
        for i, s in enumerate(seq):
            if s in self.data.get(self.start + i, {}):
                total += self.data[self.start + i][s][self.phenotype]
        return total + self.mfm * self.max_possible

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        seqs = list(sequences)
        if not seqs:  # reference returns an empty array for an empty batch
            return np.array([])
        tokens = _AA.encode(seqs)
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        base = np.asarray(
            self._jit_fitness_unclipped(
                self._fitness_params, jnp.asarray(pad_rows(tokens, bucket))
            )[:n],
            dtype=np.float64,
        )
        if self.noise:
            base = base + self._rng.normal(scale=self.noise, size=n)
        return np.maximum(base, 0.0)


def registry() -> Dict[str, Dict]:
    """Return problems (reference additive_aav_packaging.py:121-147)."""
    return {
        name: {"params": {"phenotype": name, "start": 450, "end": 540}}
        for name in ["heart", "lung", "kidney", "liver", "blood", "spleen"]
    }
