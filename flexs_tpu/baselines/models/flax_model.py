"""FlaxModel: the TPU-native equivalent of the reference's KerasModel.

Parity contract (reference baselines/models/keras_model.py):
  * Wraps a neural net mapping one-hot [batch, L, A] -> [batch, 1]; `train`
    one-hot encodes sequences and fits for `epochs` epochs at `batch_size`
    (keras_model.py:49-67; defaults 256/20); `_fitness_function` predicts and
    `nan_to_num`s the squeezed output (keras_model.py:69-79).
  * The model is warm-started: each round continues training the same
    parameters (keras `fit` semantics).

TPU-first design: the whole multi-epoch fit is ONE jitted program — a
`lax.scan` over epochs around a `lax.scan` over fixed-shape minibatches,
with per-epoch on-device shuffling (`jax.random.permutation`).  The dataset
is padded to a power-of-two row bucket with a sample-weight mask so the
measured set can grow every round while only O(log N) program shapes are
ever compiled.  Optimizer state (Adam, lr=1e-3 as Keras' default) lives on
device between rounds.

Multi-chip: pass `mesh=jax.sharding.Mesh(..., ("data",))` to shard the batch
axis of both training and prediction across devices (pure data parallelism —
these surrogates are tiny, so sharding parameters would waste ICI bandwidth;
see SURVEY.md §2.5).
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.model import Model
from flexs_tpu.ops.padding import next_bucket, pad_rows
from flexs_tpu.types import SEQUENCES_TYPE


def mse_loss(preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample squared error."""
    return jnp.square(preds - labels)


class FlaxModel(Model):
    """A wrapper around flax modules (one-hot [B, L, A] in, [B, 1] out)."""

    def __init__(
        self,
        module,
        alphabet: str,
        name: str,
        batch_size: int = 256,
        epochs: int = 20,
        learning_rate: float = 1e-3,
        loss: Callable = mse_loss,
        seed: int = 0,
        mesh: Optional[Mesh] = None,
        custom_train_function: Optional[Callable] = None,
        custom_predict_function: Optional[Callable] = None,
    ):
        """Wrap a flax linen module.

        Args:
            module: A flax `nn.Module`; `apply` must accept a `train` kwarg
                (for dropout) and an `rngs={"dropout": ...}` when training.
            alphabet: Alphabet string or `Alphabet`.
            name: Human-readable model description (used for logging).
            batch_size: Minibatch size for fit/predict (reference default 256).
            epochs: Epochs per `train` call (reference default 20).
            learning_rate: Adam learning rate (Keras default 1e-3).
            loss: Per-sample loss `(preds, labels) -> losses`.
            seed: PRNG seed for init/dropout/shuffling.
            mesh: Optional device mesh with a "data" axis for batch sharding.
            custom_train_function: Optional override called as
                `(one_hots, labels)` instead of the built-in fit (reference
                keras_model.py:33-36).
            custom_predict_function: Optional override called as
                `(one_hots) -> predictions` (reference keras_model.py:37-38).
        """
        super().__init__(name)

        self.module = module
        self.alphabet = as_alphabet(alphabet)
        self.batch_size = batch_size
        self.epochs = epochs
        self.loss = loss
        self.mesh = mesh
        self.custom_train_function = custom_train_function
        self.custom_predict_function = custom_predict_function

        self._tx = optax.adam(learning_rate)
        self._params = None
        self._opt_state = None
        self._key = jax.random.PRNGKey(seed)

        self._fit = jax.jit(self._fit_impl, donate_argnums=(0, 1))
        self._predict = jax.jit(self._predict_impl)

    # -- device programs ----------------------------------------------------
    def _forward(self, params, x, train: bool, dropout_key=None):
        rngs = {"dropout": dropout_key} if dropout_key is not None else None
        out = self.module.apply(params, x, train=train, rngs=rngs)
        return out.reshape(out.shape[0])

    def _fit_impl(self, params, opt_state, x, y, weight, key):
        """One full fit: scan(epochs) x scan(shuffled minibatches)."""
        num_batches = x.shape[0] // self.batch_size

        def minibatch_step(carry, idx):
            params, opt_state, key = carry
            key, dkey = jax.random.split(key)
            xb, yb, wb = x[idx], y[idx], weight[idx]

            def batch_loss(p):
                preds = self._forward(p, xb, train=True, dropout_key=dkey)
                return jnp.sum(self.loss(preds, yb) * wb) / (jnp.sum(wb) + 1e-9)

            loss_val, grads = jax.value_and_grad(batch_loss)(params)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss_val

        def epoch_step(carry, _):
            params, opt_state, key = carry
            key, pkey = jax.random.split(key)
            perm = jax.random.permutation(pkey, x.shape[0])
            batches = perm.reshape(num_batches, self.batch_size)
            carry, losses = jax.lax.scan(
                minibatch_step, (params, opt_state, key), batches
            )
            return carry, jnp.mean(losses)

        (params, opt_state, _), losses = jax.lax.scan(
            epoch_step, (params, opt_state, key), None, length=self.epochs
        )
        return params, opt_state, losses

    def _predict_impl(self, params, x):
        return self._forward(params, x, train=False)

    # -- data plumbing ------------------------------------------------------
    def _one_hot_batch(self, sequences, bucket_min: int = 64, multiple: int = 1):
        tokens = self.alphabet.encode(list(sequences))
        n = len(tokens)
        bucket = next_bucket(n, minimum=bucket_min)
        # Training needs the bucket divisible by batch_size so every epoch is
        # a fixed grid of full minibatches (padding carries zero weight).
        bucket = ((bucket + multiple - 1) // multiple) * multiple
        tokens = pad_rows(tokens, bucket)
        x = jax.nn.one_hot(
            jnp.asarray(tokens), len(self.alphabet), dtype=jnp.float32
        )
        return x, n

    def _shard(self, *arrays):
        """Lay out batch-leading arrays over the mesh's data axis (if any)."""
        if self.mesh is None:
            return arrays
        sharding = NamedSharding(self.mesh, P("data"))
        return tuple(jax.device_put(a, sharding) for a in arrays)

    def _ensure_init(self, x):
        if self._params is None:
            self._key, init_key = jax.random.split(self._key)
            self._params = self.module.init(
                {"params": init_key, "dropout": init_key}, x[:1], train=False
            )
            self._opt_state = self._tx.init(self._params)
            if self.mesh is not None:
                replicated = NamedSharding(self.mesh, P())
                self._params = jax.device_put(self._params, replicated)
                self._opt_state = jax.device_put(self._opt_state, replicated)

    # -- public API ---------------------------------------------------------
    def train(self, sequences: SEQUENCES_TYPE, labels, verbose: bool = False):
        """Fit for `self.epochs` epochs at `self.batch_size` (warm start)."""
        if self.custom_train_function is not None:
            tokens = self.alphabet.encode(list(sequences))
            one_hots = jax.nn.one_hot(
                jnp.asarray(tokens), len(self.alphabet), dtype=jnp.float32
            )
            self.custom_train_function(one_hots, np.asarray(labels))
            return

        x, n = self._one_hot_batch(
            sequences, bucket_min=self.batch_size, multiple=self.batch_size
        )
        y = pad_rows(np.asarray(labels, dtype=np.float32), x.shape[0])
        weight = pad_rows(np.ones(n, dtype=np.float32), x.shape[0])
        x, y, w = self._shard(x, jnp.asarray(y), jnp.asarray(weight))

        self._ensure_init(x)
        self._key, fit_key = jax.random.split(self._key)
        self._params, self._opt_state, losses = self._fit(
            self._params, self._opt_state, x, y, w, fit_key
        )
        if verbose:
            print(f"{self.name}: epoch losses {np.asarray(losses)}")

    def _fitness_function(self, sequences: SEQUENCES_TYPE) -> np.ndarray:
        if self.custom_predict_function is not None:
            tokens = self.alphabet.encode(list(sequences))
            one_hots = jax.nn.one_hot(
                jnp.asarray(tokens), len(self.alphabet), dtype=jnp.float32
            )
            return np.nan_to_num(
                np.asarray(self.custom_predict_function(one_hots), np.float64)
            ).reshape(-1)

        x, n = self._one_hot_batch(sequences)
        (x,) = self._shard(x)
        self._ensure_init(x)
        preds = self._predict(self._params, x)
        return np.nan_to_num(np.asarray(preds[:n], dtype=np.float64))

    def fitness_from_tokens(self, tokens) -> np.ndarray:
        """Token fast path: one-hot on device, no string round-trip.

        Pads rows to the power-of-two bucket so large enumerations (e.g.
        GPR_BO's full-space scoring) reuse a handful of compiled shapes.
        """
        tokens = np.asarray(tokens)
        n = len(tokens)
        bucket = next_bucket(n, minimum=64)
        x = jax.nn.one_hot(
            jnp.asarray(pad_rows(tokens, bucket)), len(self.alphabet), jnp.float32
        )
        (x,) = self._shard(x)
        self._ensure_init(x)
        preds = self._predict(self._params, x)
        return np.nan_to_num(np.asarray(preds[:n], dtype=np.float64))
