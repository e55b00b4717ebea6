"""Alphabets and fast string<->token codecs.

The reference (flexs/utils/sequence_utils.py:7-17) represents sequences as
Python strings everywhere and one-hot encodes them with a Python loop.  On
TPU, strings only exist at the I/O edge: all compute runs on fixed-shape
integer token arrays.  This module provides the codec.

Design notes (TPU-first):
  * Encoding uses a 256-entry lookup table indexed by raw byte values, so a
    batch of B length-L strings encodes in one vectorized numpy gather
    (O(B*L), no Python-level per-char loop).
  * Tokens are int32 on device (int8 tiles on TPU have a (32, 128) min tile
    which wastes VMEM for short sequences; int32 keeps gathers simple and
    XLA-friendly).  One-hot expansion happens on device right before MXU work.
"""
from __future__ import annotations

from typing import Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Canonical alphabets, byte-identical to reference sequence_utils.py:7-17.
AAS = "ILVAGMFYWEDQNHCRKSTP"
"""Amino acid alphabet for proteins (length 20 - no stop codon)."""

RNAA = "UGCA"
"""RNA alphabet (4 base pairs)."""

DNAA = "TGCA"
"""DNA alphabet (4 base pairs)."""

BA = "01"
"""Binary alphabet '01'."""


class Alphabet:
    """A fixed symbol set plus vectorized string<->token codecs.

    Attributes:
        letters: The alphabet string; index in this string == token id.
    """

    def __init__(self, letters: str):
        if len(set(letters)) != len(letters):
            raise ValueError(f"Alphabet has duplicate letters: {letters!r}")
        self.letters = letters
        self._byte_to_token = np.full(256, -1, dtype=np.int32)
        for i, ch in enumerate(letters):
            self._byte_to_token[ord(ch)] = i
        self._token_to_byte = np.frombuffer(
            letters.encode("ascii"), dtype=np.uint8
        ).copy()

    def __len__(self) -> int:
        return len(self.letters)

    def __repr__(self) -> str:
        return f"Alphabet({self.letters!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Alphabet):
            return self.letters == other.letters
        if isinstance(other, str):
            return self.letters == other
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.letters)

    # -- encoding ----------------------------------------------------------
    def encode(self, sequences: Iterable[str]) -> np.ndarray:
        """Encode equal-length strings into an int32[batch, L] token array."""
        if isinstance(sequences, str):
            raise TypeError("encode() expects a batch of strings, not one string")
        seqs: Sequence[str] = (
            sequences if isinstance(sequences, (list, tuple)) else list(sequences)
        )
        if len(seqs) == 0:
            return np.zeros((0, 0), dtype=np.int32)
        joined = "".join(seqs).encode("ascii")
        raw = np.frombuffer(joined, dtype=np.uint8)
        length = len(seqs[0])
        if raw.size != length * len(seqs):
            raise ValueError("All sequences in a batch must have equal length")
        tokens = self._byte_to_token[raw].reshape(len(seqs), length)
        if (tokens < 0).any():
            bad = sorted(set(chr(b) for b in raw[self._byte_to_token[raw] < 0]))
            raise ValueError(f"Characters {bad} not in alphabet {self.letters!r}")
        return tokens

    def encode_one(self, sequence: str) -> np.ndarray:
        """Encode a single string into an int32[L] token array."""
        return self.encode([sequence])[0]

    # -- decoding ----------------------------------------------------------
    def decode(self, tokens) -> List[str]:
        """Decode an int[batch, L] token array into a list of strings."""
        tokens = np.asarray(tokens)
        if tokens.ndim == 1:
            tokens = tokens[None]
        raw = self._token_to_byte[tokens.astype(np.int64)]
        return [row.tobytes().decode("ascii") for row in raw]

    def decode_one(self, tokens) -> str:
        """Decode an int[L] token array into a string."""
        return self.decode(np.asarray(tokens)[None])[0]

    # -- device helpers ----------------------------------------------------
    def one_hot(self, tokens, dtype=jnp.float32) -> jnp.ndarray:
        """One-hot expand tokens to [..., len(alphabet)] on device."""
        return jax.nn.one_hot(jnp.asarray(tokens), len(self), dtype=dtype)


def as_alphabet(alphabet) -> Alphabet:
    """Coerce a string or Alphabet into an Alphabet."""
    if isinstance(alphabet, Alphabet):
        return alphabet
    return Alphabet(alphabet)
