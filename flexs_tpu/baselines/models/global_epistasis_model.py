"""Global epistasis surrogate.

Parity contract (reference baselines/models/global_epistasis_model.py:26-48):
Flatten -> Dense(1, relu) (the additive "trait" bottleneck) -> Dense(h, relu)
-> Dense(h, relu) -> Dense(1) (the nonlinear link); Adam + MSE.  The
reference's default name is "MLP_hidden_size_{h}" (global_epistasis_model.py:41
— kept verbatim for log-format parity).
"""
from typing import Optional

import flax.linen as nn

from flexs_tpu.baselines.models.flax_model import FlaxModel


class GlobalEpistasisModule(nn.Module):
    """Scalar additive trait followed by a nonlinear link network."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1)(x))
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        return nn.Dense(1)(x)


class GlobalEpistasisModel(FlaxModel):
    """Weighted sum of input features followed by dense layers."""

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
        """Create a global epistasis model."""
        if name is None:
            name = f"MLP_hidden_size_{hidden_size}"

        extra = {} if loss is None else {"loss": loss}
        super().__init__(
            GlobalEpistasisModule(hidden_size=hidden_size),
            alphabet=alphabet,
            name=name,
            batch_size=batch_size,
            epochs=epochs,
            **extra,
            **kwargs,
        )
