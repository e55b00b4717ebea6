"""Baseline multilayer perceptron surrogate.

Parity contract (reference baselines/models/mlp.py:21-44): Flatten ->
3 x Dense(hidden_size, relu) -> Dense(1); Adam + MSE; default name
"MLP_hidden_size_{h}".
"""
from typing import Optional

import flax.linen as nn

from flexs_tpu.baselines.models.flax_model import FlaxModel


class MLPModule(nn.Module):
    """Flatten then three relu dense layers and a linear head."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        for _ in range(3):
            x = nn.relu(nn.Dense(self.hidden_size)(x))
        return nn.Dense(1)(x)


class MLP(FlaxModel):
    """A baseline MLP with three dense layers and relu activations."""

    def __init__(
        self,
        seq_len: int,
        hidden_size: int,
        alphabet: str,
        loss=None,
        name: Optional[str] = None,
        batch_size: int = 256,
        epochs: int = 20,
        **kwargs,
    ):
        """Create an MLP."""
        if name is None:
            name = f"MLP_hidden_size_{hidden_size}"

        extra = {} if loss is None else {"loss": loss}
        super().__init__(
            MLPModule(hidden_size=hidden_size),
            alphabet=alphabet,
            name=name,
            batch_size=batch_size,
            epochs=epochs,
            **extra,
            **kwargs,
        )
