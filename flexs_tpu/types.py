"""Common type aliases for flexs_tpu.

Parity: reference `flexs/types.py:6` defines SEQUENCES_TYPE as a union of a
list of sequence strings or a numpy array of them.  We keep that public
contract and add TOKENS_TYPE for the device-side integer-token representation
that every TPU code path uses internally.
"""
from typing import List, Union

import jax
import numpy as np

#: A batch of sequences as strings (host representation, I/O edge only).
SEQUENCES_TYPE = Union[List[str], np.ndarray]

#: A batch of sequences as integer token arrays `int8/int32[batch, length]`
#: (device representation used by all compute paths).
TOKENS_TYPE = Union[np.ndarray, jax.Array]
