"""Landscape base class.

Parity contract (reference flexs/landscape.py:20-45):
  * `Landscape(name)` sets `self.cost = 0` and `self.name = name`.
  * `get_fitness(sequences)` increments `self.cost` by `len(sequences)` and
    delegates to the subclass `_fitness_function`.
  * Subclasses override `_fitness_function`, never `get_fitness`.

TPU-first additions:
  * Subclasses that run on device implement `fitness_from_tokens(tokens)`
    (a jit-friendly pure function over int32[batch, L] token arrays) and get
    `_fitness_function` for free via the string codec.  Explorers that stay
    entirely on device can call `fitness_from_tokens` directly and account
    cost themselves through `add_cost`.
"""
import abc

import numpy as np

from flexs_tpu.types import SEQUENCES_TYPE


class Landscape(abc.ABC):
    """Base class for all landscapes and for `flexs_tpu.Model`.

    Attributes:
        cost (int): Number of sequences whose fitness has been evaluated.
        name (str): Human-readable landscape name used in run logs.
    """

    def __init__(self, name: str):
        """Create Landscape, setting `name` and setting `cost` to zero."""
        self.cost = 0
        self.name = name

    @abc.abstractmethod
    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        pass

    def get_fitness(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        """Score a list/array of sequence strings.

        Increments `self.cost` by the batch size then evaluates, exactly as
        reference landscape.py:29-45.  Do not override; override
        `_fitness_function` instead.
        """
        self.cost += len(sequences)
        return self._fitness_function(sequences)

    # -- TPU-native extensions ----------------------------------------------
    def add_cost(self, n: int) -> None:
        """Account `n` oracle queries made through a device-side fast path."""
        self.cost += int(n)

    def fitness_from_tokens(self, tokens) -> np.ndarray:
        """Score int[batch, L] token arrays WITHOUT cost accounting.

        Device-side landscapes override this; the default raises so that
        string-only landscapes are still valid.  Callers on the fully-jitted
        path pair it with `add_cost`.
        """
        raise NotImplementedError(
            f"{type(self).__name__} does not implement a token fast path"
        )
