"""Rosetta-style folding landscape: centroid energy over a fixed backbone.

Parity contract (reference flexs/landscapes/rosetta.py):
  * `RosettaFolding(pdb_file, sigmoid_center, sigmoid_norm_value)` — name
    "RosettaFolding"; `wt_pose` sequence from the PDB; fitness =
    sigmoid((-E - center) / norm) (:173-177); `get_folding_energy(seq)`
    raises on length mismatch (:152-171).
  * `registry()` — 3msi (66-aa) and 3mx7 (90-aa) problems with the same
    starting sequences and sigmoid parameters (:180-228).

Native rebuild (SURVEY.md §2.4): PyRosetta's `cen_std` centroid score
function is a statistical potential over a fixed backbone — residue
environment (burial) terms plus residue-pair contact terms.  Because the
backbone never moves (the reference mutates residues in place,
rosetta.py:117-150), the energy is LINEAR in per-(burial-bin, residue) and
per-(distance-bin, residue-pair) tables:

    E(s) = sum_i ENV[bbin_i, s_i] + sum_{(i,j) contacts} PAIR[dbin_ij, s_i, s_j]

The tables are fitted by ridge regression against ~38k PyRosetta-scored
3msi sequences shipped with the reference (paper_code/cloud/runs/3msi/*,
see scripts/calibrate_rosetta.py; holdout metrics recorded there and gated
in tests/test_rosetta_landscape.py).  The tables are structure-independent,
so the same potential scores 3mx7.

On TPU, scoring a batch is two gathers and two sums — one jitted call; a
C++ scorer for host-side/embedding use lives in native/ (same tables, same
features, bit-identical energies).
"""
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.alphabet import AAS, Alphabet
from flexs_tpu.landscape import Landscape
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.ops.pdb import Structure, parse_pdb
from flexs_tpu.types import SEQUENCES_TYPE

_AA = Alphabet(AAS)
_DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "rosetta")
_PARAMS_FILE = os.path.join(_DATA_DIR, "centroid_potential.npz")

# Feature geometry (shared by the JAX path, the calibrator, and the C++
# scorer — change in lockstep).
BURIAL_RADIUS = 10.0  # CB neighbors within this radius define burial
NUM_BURIAL_BINS = 8
BURIAL_BIN_WIDTH = 3  # bin = min(count // width, bins - 1)
CONTACT_BINS = np.array([4.5, 5.5, 6.5, 7.5, 8.5, 10.0], np.float32)
MIN_SEQ_SEP = 2  # |i - j| >= this for pair terms


def compute_features(structure: Structure):
    """(burial_bins i32[L], pair index arrays) from fixed CB geometry."""
    cb = structure.cb
    dists = np.linalg.norm(cb[:, None, :] - cb[None, :, :], axis=2)
    L = len(cb)

    neighbor_count = ((dists < BURIAL_RADIUS).sum(axis=1) - 1).astype(np.int64)
    burial_bins = np.minimum(neighbor_count // BURIAL_BIN_WIDTH, NUM_BURIAL_BINS - 1)

    pair_i, pair_j, pair_bins = [], [], []
    for i in range(L):
        for j in range(i + MIN_SEQ_SEP, L):
            d = dists[i, j]
            if d < CONTACT_BINS[-1]:
                pair_i.append(i)
                pair_j.append(j)
                pair_bins.append(int(np.searchsorted(CONTACT_BINS, d)))
    return (
        burial_bins.astype(np.int32),
        np.asarray(pair_i, np.int32),
        np.asarray(pair_j, np.int32),
        np.asarray(pair_bins, np.int32),
    )


def default_potential():
    """Physics-prior potential used when no fitted tables exist.

    Hydropathy-driven burial preference + a crude hydrophobic contact
    bonus.  The fitted tables (centroid_potential.npz) supersede this.
    """
    # Kyte-Doolittle hydropathy in AAS order.
    kd = {
        "I": 4.5, "V": 4.2, "L": 3.8, "F": 2.8, "C": 2.5, "M": 1.9, "A": 1.8,
        "G": -0.4, "T": -0.7, "S": -0.8, "W": -0.9, "Y": -1.3, "P": -1.6,
        "H": -3.2, "E": -3.5, "Q": -3.5, "D": -3.5, "N": -3.5, "K": -3.9,
        "R": -4.5,
    }
    hydro = np.array([kd[a] for a in AAS], np.float32) / 4.5
    burial = (np.arange(NUM_BURIAL_BINS, dtype=np.float32) / (NUM_BURIAL_BINS - 1))
    env = -np.outer(burial - 0.5, hydro)  # buried hydrophobic = favorable
    contact = -0.2 * np.outer(hydro, hydro)  # like-likes-like
    pair = np.stack([contact * (1 - b / len(CONTACT_BINS)) for b in range(len(CONTACT_BINS))])
    return env.astype(np.float32), pair.astype(np.float32), 0.0, 1.0


def load_potential():
    """(env [B, 20], pair [D, 20, 20], energy_offset, energy_scale)."""
    if os.path.exists(_PARAMS_FILE):
        with np.load(_PARAMS_FILE) as d:
            return (
                d["env"].astype(np.float32),
                d["pair"].astype(np.float32),
                float(d["offset"]),
                float(d["scale"]),
            )
    return default_potential()


def _rosetta_fitness(params, tokens):
    """Pure device fitness over int[B, L] AA tokens.

    params = (env_site f32[L, 20], pair_table f32[P, 20, 20], pair_i,
    pair_j, consts f32[2] = (sigmoid_center, sigmoid_norm)).
    env_site already folds the burial-bin lookup per position; the pair
    table is pre-gathered per contact.  Module-level for stable jit
    identity in fused runners.
    """
    env_site, pair_table, pair_i, pair_j, consts = params
    center, norm = consts[0], consts[1]

    env_e = jnp.take_along_axis(
        env_site[None, :, :], tokens[:, :, None], axis=2
    ).sum(axis=(1, 2))

    ai = tokens[:, pair_i]  # [B, P]
    aj = tokens[:, pair_j]
    p = jnp.arange(pair_table.shape[0])
    pair_e = pair_table[p[None, :], ai, aj].sum(axis=1)

    energy = env_e + pair_e
    return jax.nn.sigmoid((-energy - center) / norm)


class RosettaFolding(Landscape):
    """Centroid folding energy of substitutions on a fixed backbone.

    Attributes:
        wt_sequence: Native sequence parsed from the PDB.
    """

    def __init__(
        self,
        pdb_file: str,
        sigmoid_center: float,
        sigmoid_norm_value: float,
        chain: Optional[str] = None,
    ):
        """Create a RosettaFolding landscape from a PDB structure."""
        super().__init__("RosettaFolding")

        self.structure = parse_pdb(pdb_file, chain=chain)
        self.wt_sequence = self.structure.sequence
        self.sigmoid_center = sigmoid_center
        self.sigmoid_norm_value = sigmoid_norm_value

        burial_bins, pair_i, pair_j, pair_bins = compute_features(self.structure)
        env, pair, offset, scale = load_potential()

        length = len(self.wt_sequence)
        # Fold burial-bin lookup into a per-site [L, 20] table, and the
        # per-contact distance bin into a [P, 20, 20] table; distribute the
        # fitted offset/scale over sites so E keeps PyRosetta's scale.
        env_site = env[burial_bins] * scale
        env_site = env_site + offset / max(length, 1)
        pair_site = pair[pair_bins] * scale

        self._fitness_params = (
            jnp.asarray(env_site),
            jnp.asarray(pair_site),
            jnp.asarray(pair_i),
            jnp.asarray(pair_j),
            jnp.array([sigmoid_center, sigmoid_norm_value], jnp.float32),
        )
        self._jit_fitness = jax.jit(_rosetta_fitness)

    def get_folding_energy(self, sequence: str) -> float:
        """Centroid energy of `sequence` threaded onto the backbone."""
        if len(sequence) != len(self.wt_sequence):
            raise ValueError(
                "`sequence` must be of the same length as original protein "
                "in .pdb file"
            )
        env_site, pair_site, pair_i, pair_j, _ = self._fitness_params
        tokens = jnp.asarray(_AA.encode([sequence]))
        env_e = jnp.take_along_axis(
            env_site[None, :, :], tokens[:, :, None], axis=2
        ).sum()
        ai, aj = tokens[0, pair_i], tokens[0, pair_j]
        p = jnp.arange(pair_site.shape[0])
        return float(env_e + pair_site[p, ai, aj].sum())

    def fitness_from_tokens(self, tokens) -> jnp.ndarray:
        """Device fast path over int[batch, L] AA tokens."""
        return self._jit_fitness(self._fitness_params, jnp.asarray(tokens))

    def device_fitness(self):
        """(pure fitness fn, params) pair for fused device runners."""
        return _rosetta_fitness, self._fitness_params

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        seqs = list(sequences)
        if not seqs:  # reference returns an empty result for an empty batch
            return np.array([])
        for s in seqs:
            if len(s) != len(self.wt_sequence):
                raise ValueError(
                    "`sequence` must be of the same length as original "
                    "protein in .pdb file"
                )
        tokens = _AA.encode(seqs)
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        return np.asarray(
            self.fitness_from_tokens(pad_rows(tokens, bucket))[:n], np.float64
        )


def registry() -> Dict[str, Dict]:
    """Return problems (reference rosetta.py:180-228; starts verbatim)."""
    return {
        "3msi": {
            "params": {
                "pdb_file": f"{_DATA_DIR}/3msi.pdb",
                "sigmoid_center": -3,
                "sigmoid_norm_value": 12,
            },
            "starts": {
                "ed_3_wt": "MAQASVVANQLIPINTHLTLVMMRSEVVTYVHIPAEDIPRLVSMDVNRAVPLGTTLMPDMVKGYAA",  # noqa: E501
                "ed_5_wt": "MAQASVVFNQLIPINTHLTLVMMRFEVVTPVGCPAMDIPRLVSQQVNRAVPLGTTLMPDMVKGYAA",  # noqa: E501
                "ed_7_wt": "WAQRSVVANQLIPINTGLTLVMMRSELVTGVGAPAEDIPRLVSMQVNRAVPLGTTNMPDMVKGYAA",  # noqa: E501
                "ed_12_wt": "RAQESVVANQLIPILTHLTQKMSRRFVVTPVGIPAEDIPRLVNAQVDRAVPLGTTLMPDMDKGYAA",  # noqa: E501
                "ed_27_wt": "MRRYSVIAYQERPINLHSTLTFNRSEVPWPVNRPASDAPRLVSMQNNRSVPLGTKLPEDPVCRYAL",  # noqa: E501
            },
        },
        "3mx7": {
            "params": {
                "pdb_file": f"{_DATA_DIR}/3mx7.pdb",
                "sigmoid_center": -3,
                "sigmoid_norm_value": 12,
            },
            "starts": {
                "ed_2_wt": "MTDLVAVWDVALSDGHHKIEFEHGTTSGKRVVYVDGKESIRKEWMFKLVGKETFYVGAAKTKATINIDAISGFAYEYTLEINGKSLKKYM",  # noqa: E501
                "ed_5_wt": "MTDLVAVWFYALSDGVHKIEFEHGTTSGKRVVYVDGKEEIRKEWMFKLVGKETFYVGAAKTKATINIWAISGFAIEYTLTINGKSLKKYM",  # noqa: E501
                "ed_7_wt": "MTDLVAYWDVANSDGVHKISFEHGTTSGKRVVYVDGKEEIRKEGMFKLVGRETFYVGAAKTKATINIDAGSGFAYEYTLEINGKVLKKYM",  # noqa: E501
                "ed_13_wt": "VTDKSAVWDVALSDGVHKIEFEHGTTSIKRVVYVQGKEENRKEWQFKGVGKETFYVGAAKRKATINIDAKSGFAYEVTLEINQKSLKQYM",  # noqa: E501
                "ed_29_wt": "STDLVEVMRIACSDGVHKIEFEHGTTSGMRVHYKDLKEEGRKPHRFKLEGNFQWYENCHKTKAIINITAIMGFAYWYFLEWNGKSLKKYM",  # noqa: E501
            },
        },
    }
