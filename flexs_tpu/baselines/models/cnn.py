"""Baseline CNN surrogate.

Parity contract (reference baselines/models/cnn.py:23-67): Conv1D(filters,
k=5, valid, relu) -> Conv1D(filters, k=5, same, relu) -> MaxPool1D(1)
(identity at stride 1; kept for structural parity) -> Conv1D(filters,
k=len(alphabet)-1, same, relu) -> GlobalMaxPool -> Dense(h, relu) ->
Dense(h, relu) -> Dropout(0.25) -> Dense(1); Adam + MSE; default name
"CNN_hidden_size_{h}_num_filters_{f}".

TPU note: convs over one-hot [B, L, A] inputs lower to MXU matmuls under
XLA; bf16 accumulation is unnecessary at these tiny sizes, so params stay
f32 for exact round-to-round reproducibility.
"""
from typing import Optional

import flax.linen as nn

from flexs_tpu.baselines.models.flax_model import FlaxModel


class CNNModule(nn.Module):
    """Three conv layers, two dense layers, dropout before the head."""

    num_filters: int
    hidden_size: int
    alphabet_size: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(self.num_filters, (self.kernel_size,), padding="VALID")(x))
        x = nn.relu(nn.Conv(self.num_filters, (self.kernel_size,), padding="SAME")(x))
        x = nn.relu(
            nn.Conv(self.num_filters, (max(self.alphabet_size - 1, 1),), padding="SAME")(x)
        )
        x = x.max(axis=1)  # global max pool over sequence positions
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        x = nn.Dropout(0.25, deterministic=not train)(x)
        return nn.Dense(1)(x)


class CNN(FlaxModel):
    """A baseline CNN model with 3 conv layers and 2 dense layers."""

    def __init__(
        self,
        seq_len: int,
        num_filters: int,
        hidden_size: int,
        alphabet: str,
        loss=None,
        kernel_size: int = 5,
        name: Optional[str] = None,
        batch_size: int = 256,
        epochs: int = 20,
        **kwargs,
    ):
        """Create the CNN."""
        module = CNNModule(
            num_filters=num_filters,
            hidden_size=hidden_size,
            alphabet_size=len(alphabet),
            kernel_size=kernel_size,
        )

        if name is None:
            name = f"CNN_hidden_size_{hidden_size}_num_filters_{num_filters}"

        extra = {} if loss is None else {"loss": loss}
        super().__init__(
            module,
            alphabet=alphabet,
            name=name,
            batch_size=batch_size,
            epochs=epochs,
            **extra,
            **kwargs,
        )
