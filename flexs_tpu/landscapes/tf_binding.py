"""TF binding landscape: full 4^8 lookup tables as device gathers.

Parity contract (reference flexs/landscapes/tf_binding.py):
  * Experimental E-scores for every 8-mer DNA sequence, min-max normalized to
    [0, 1] (tf_binding.py:32-41); both strands map to the same score
    (tf_binding.py:40-41).
  * `registry()` exposes one problem per Barrera et al. (2016) data file with
    the same 14 fixed starting sequences (tf_binding.py:47-93).

TPU-first design: instead of a Python dict lookup per sequence
(tf_binding.py:43-44), each landscape is a dense float32[4^8] score table;
a batch of sequences becomes a base-4 index vector and fitness is one device
gather.  All 158+ landscapes pack into one [num_landscapes, 65536] array
(`data/tf_binding.npz`) so a sweep over landscapes is a single sharded
gather over the leading axis (see flexs_tpu/runtime/jit_runner.py).

The packed table is built from the reference's raw TSV measurements by
`scripts/build_tf_binding_data.py`.
"""
import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.alphabet import DNAA, Alphabet
from flexs_tpu.landscape import Landscape
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.types import SEQUENCES_TYPE

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
_PACKED_FILE = os.path.join(_DATA_DIR, "tf_binding.npz")

_DNA = Alphabet(DNAA)

# 14 fixed starting sequences, identical to reference tf_binding.py:75-90.
STARTS = [
    "GCTCGAGC",
    "GCGCGCGC",
    "TGCGCGCC",
    "ATATAGCC",
    "GTTTGGTA",
    "ATTATGTT",
    "CAGTTTTT",
    "AAAAATTT",
    "AAAAACGC",
    "GTTGTTTT",
    "TGCTTTTT",
    "AAAGATAG",
    "CCTTCTTT",
    "AAAGAGAG",
]


@functools.lru_cache(maxsize=1)
def _packed_tables():
    """Load (names, memmapped [N, 65536] score tables) once per process."""
    if not os.path.exists(_PACKED_FILE):
        raise FileNotFoundError(
            f"Packed TF-binding tables not found at {_PACKED_FILE}. "
            "Run scripts/build_tf_binding_data.py to generate them from the "
            "raw Barrera et al. (2016) TSV measurements."
        )
    with np.load(_PACKED_FILE) as data:
        names = [str(n) for n in data["names"]]
        tables = data["tables"]
    return names, tables


@functools.lru_cache(maxsize=1)
def _device_tables():
    """(names, the stacked tables resident on device) — uploaded ONCE.

    A fresh host array costs ~40 ms through the remote TPU relay
    regardless of size (CLAUDE.md); constructing many TFBinding instances
    (benchmarks, sweeps) must not re-upload 256 KB score rows each time.
    """
    names, tables = _packed_tables()
    return names, jnp.asarray(tables)


def _tokens_to_index(tokens) -> jnp.ndarray:
    """Base-4 index of int[batch, 8] DNA tokens (alphabet order TGCA)."""
    tokens = jnp.asarray(tokens)
    powers = 4 ** jnp.arange(tokens.shape[-1] - 1, -1, -1, dtype=jnp.int32)
    return jnp.sum(tokens * powers, axis=-1)


@jax.jit
def _gather_scores(table, idx):
    return table[idx]


def device_fitness_fn(table, tokens) -> jnp.ndarray:
    """Pure, jit-stable fitness: score table gather over token indices.

    Module-level so fused runners (flexs_tpu.runtime.jit_runner) can key
    their jit caches on a stable function identity; `table` is traced, so
    sweeps vmap over stacked tables.
    """
    return table[_tokens_to_index(tokens)]


def table_from_tsv(landscape_file: str) -> np.ndarray:
    """Build a dense float32[4^8] score table from a reference-format TSV.

    Mirrors the normalization of reference tf_binding.py:32-41: min-max
    normalize the E-score column, map both strands ("8-mer", "8-mer.1") to
    the same normalized score.
    """
    import pandas as pd

    data = pd.read_csv(landscape_file, sep="\t")
    score = data["E-score"].to_numpy(dtype=np.float64)
    norm_score = (score - score.min()) / (score.max() - score.min())

    table = np.zeros(4**8, dtype=np.float32)
    for col in ("8-mer", "8-mer.1"):
        seqs = data[col].to_list()
        idx = np.asarray(_tokens_to_index(_DNA.encode(seqs)))
        table[idx] = norm_score
    return table


class TFBinding(Landscape):
    """Binding affinity of 8-mer DNA sequences to a transcription factor.

    Construct either from a packed table entry (`name="SIX6_REF_R1"`), from a
    reference-format TSV (`landscape_file=...`), or from an explicit
    `table` array.
    """

    def __init__(
        self,
        landscape_file: Optional[str] = None,
        name: Optional[str] = None,
        table: Optional[np.ndarray] = None,
    ):
        """Create a TFBinding landscape from one of the three sources."""
        super().__init__(name="TF_Binding")

        if table is not None:
            self.table = jnp.asarray(table, dtype=jnp.float32)
        elif landscape_file is not None:
            self.table = jnp.asarray(table_from_tsv(landscape_file))
        elif name is not None:
            names, tables = _device_tables()
            try:
                i = names.index(name)
            except ValueError:
                raise ValueError(
                    f"Unknown TF-binding landscape {name!r}; "
                    f"known: {names[:5]}... ({len(names)} total)"
                ) from None
            self.table = tables[i]  # device-side slice, no host upload
        else:
            raise ValueError("Provide one of `landscape_file`, `name`, `table`")

    def fitness_from_tokens(self, tokens) -> jnp.ndarray:
        """Device fast path: gather scores for int[batch, 8] DNA tokens."""
        return _gather_scores(self.table, _tokens_to_index(tokens))

    def device_fitness(self):
        """(pure fitness fn, params) pair for fused device runners."""
        return device_fitness_fn, self.table

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        tokens = _DNA.encode(list(sequences))
        # Bucket the batch axis so repeated odd-sized host calls reuse one
        # compiled gather instead of recompiling per batch size.
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        scores = self.fitness_from_tokens(pad_rows(tokens, bucket))
        return np.asarray(scores[:n], dtype=np.float64)


def registry() -> Dict[str, Dict]:
    """Return problems {name: {"params": ..., "starts": [...]}}.

    One problem per packed landscape, with the reference's fixed starting
    sequences (tf_binding.py:47-93).
    """
    names, _ = _packed_tables()
    return {
        problem_name: {"params": {"name": problem_name}, "starts": list(STARTS)}
        for problem_name in names
    }
