"""VAE generative model for CbAS/DbAS.

Parity contract (reference flexs/utils/VAE_utils.py):
  * Architecture (:40-62): encoder Dense(inter, elu) -> Dropout(0.3) ->
    Dense(inter, elu) -> BatchNorm -> Dense(inter, elu) -> (z_mean,
    z_log_var) -> reparameterized z; decoder Dense(inter, elu) ->
    Dense(inter, elu) -> Dropout(0.3) -> Dense(inter, elu) ->
    Dense(original_dim, sigmoid).
  * Loss (:74-92): original_dim * mean BCE + KL, Adam(lr=1e-4,
    clipvalue=0.5) (:128).
  * `train_model(samples, weights)` (:132-151): fit `epochs` epochs at
    `batch_size` with early stopping on training loss (patience 3) and a
    validation split of 0.2.  Deviation: the reference's custom Keras
    train_step drops the sample weights on the floor; here they weight the
    per-sample loss, which is the CbAS paper's actual weighted-MLE update.
  * `generate(n, existing, ...)` (:153-187): decode ONE latent draw into a
    PWM, then Boltzmann-sample sequences starting at temperature 0.001,
    multiplying by 1.3 per rejected (repeated/existing) draw.  Deviation:
    the reference reshapes the position-major decoder output to
    (alphabet, length), scrambling the PWM (VAE_utils.py:168-171); here the
    reshape keeps the (length, alphabet) layout the one-hot was written in.
  * `calculate_log_probability(seqs, vae)` (:189-217): sum over positions
    of log normalized per-residue reconstruction probability.

TPU-first design: training is a jitted scan over minibatches per epoch;
Boltzmann sampling draws whole candidate batches per temperature instead of
one sequence per Python loop iteration.
"""
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.ops.padding import next_bucket, pad_rows


class VAEModule(nn.Module):
    """Encoder/decoder pair matching the reference VAE architecture."""

    original_dim: int
    intermediate_dim: int
    latent_dim: int

    def setup(self):
        self.enc1 = nn.Dense(self.intermediate_dim)
        self.enc_drop = nn.Dropout(0.3)
        self.enc2 = nn.Dense(self.intermediate_dim)
        self.enc_bn = nn.BatchNorm()
        self.enc3 = nn.Dense(self.intermediate_dim)
        self.z_mean_layer = nn.Dense(self.latent_dim)
        self.z_log_var_layer = nn.Dense(self.latent_dim)

        self.dec1 = nn.Dense(self.intermediate_dim)
        self.dec2 = nn.Dense(self.intermediate_dim)
        self.dec_drop = nn.Dropout(0.3)
        self.dec3 = nn.Dense(self.intermediate_dim)
        self.dec_out = nn.Dense(self.original_dim)

    def encode(self, x, train: bool = False):
        x = nn.elu(self.enc1(x))
        x = self.enc_drop(x, deterministic=not train)
        x = nn.elu(self.enc2(x))
        x = self.enc_bn(x, use_running_average=not train)
        x = nn.elu(self.enc3(x))
        return self.z_mean_layer(x), self.z_log_var_layer(x)

    def decode(self, z, train: bool = False):
        x = nn.elu(self.dec1(z))
        x = nn.elu(self.dec2(x))
        x = self.dec_drop(x, deterministic=not train)
        x = nn.elu(self.dec3(x))
        return nn.sigmoid(self.dec_out(x))

    def __call__(self, x, rng, train: bool = False):
        z_mean, z_log_var = self.encode(x, train=train)
        eps = jax.random.normal(rng, z_mean.shape)
        z = z_mean + jnp.exp(0.5 * z_log_var) * eps
        return self.decode(z, train=train), z_mean, z_log_var


def pwm_to_boltzmann_weights(prob_weight_matrix: np.ndarray, temp: float):
    """Column-normalized Boltzmann weights of a PWM at temperature `temp`.

    Matches reference VAE_utils.py:220-233 (softmax of pwm/temp per
    position), computed as one vectorized softmax.
    """
    w = np.asarray(prob_weight_matrix, dtype=np.float64) / temp
    w = w - w.max(axis=0, keepdims=True)
    e = np.exp(w)
    return e / e.sum(axis=0, keepdims=True)


class VAE:
    """VAE wrapper exposing the train/generate/log-prob interface for CbAS."""

    def __init__(
        self,
        seq_length: int,
        alphabet: str,
        batch_size: int = 10,
        latent_dim: int = 2,
        intermediate_dim: int = 250,
        epochs: int = 10,
        epsilon_std: float = 1.0,
        beta: float = 1,
        validation_split: float = 0.2,
        verbose: bool = True,
        seed: int = 0,
    ):
        """Create the VAE."""
        self.batch_size = batch_size
        self.latent_dim = latent_dim
        self.intermediate_dim = intermediate_dim
        self.epochs = epochs
        self.epsilon_std = epsilon_std
        self.beta = beta
        self.validation_split = validation_split
        self.verbose = verbose
        self.name = f"VAE_latent_dim={latent_dim}_intermediate_dim={intermediate_dim}"

        self.alphabet = as_alphabet(alphabet)
        self.seq_length = seq_length
        self.original_dim = len(self.alphabet) * seq_length

        self.module = VAEModule(
            self.original_dim, intermediate_dim, latent_dim
        )
        self._tx = optax.chain(
            optax.clip(0.5), optax.adam(1e-4)
        )  # keras Adam(lr=1e-4, clipvalue=0.5)
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._key, init_key = jax.random.split(self._key)
        self.variables = self.module.init(
            {"params": init_key, "dropout": init_key},
            jnp.zeros((1, self.original_dim), jnp.float32),
            init_key,
            train=False,
        )
        self._opt_state = self._tx.init(self.variables["params"])
        self._epoch_fn = jax.jit(self._epoch_impl)
        self._decode_one = jax.jit(
            lambda variables, z: self.module.apply(
                variables, z, train=False, method=VAEModule.decode
            )
        )
        self._reconstruct = jax.jit(self._reconstruct_impl)

    # -- weights (for the CbAS vae_0 snapshot) ------------------------------
    def get_weights(self):
        """Snapshot all variables (params + batch stats)."""
        return jax.tree.map(lambda x: x, self.variables)

    def set_weights(self, weights):
        """Restore a snapshot taken with `get_weights`."""
        self.variables = weights

    # -- training -----------------------------------------------------------
    def _one_hot(self, samples) -> np.ndarray:
        tokens = self.alphabet.encode(list(samples))
        eye = np.eye(len(self.alphabet), dtype=np.float32)
        return eye[tokens].reshape(len(tokens), -1)

    def _epoch_impl(self, variables, opt_state, x, w, key):
        """One epoch: shuffled fixed-shape minibatch scan (masked by w)."""
        num_batches = x.shape[0] // self.batch_size

        def loss_fn(params, batch_stats, xb, wb, rng):
            drop_rng, z_rng = jax.random.split(rng)
            (recon, z_mean, z_log_var), updates = self.module.apply(
                {"params": params, "batch_stats": batch_stats},
                xb,
                z_rng,
                train=True,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            eps = 1e-7
            bce = -(
                xb * jnp.log(recon + eps) + (1 - xb) * jnp.log(1 - recon + eps)
            ).mean(axis=1)
            denom = jnp.sum(wb) + 1e-9
            recon_loss = self.original_dim * jnp.sum(bce * wb) / denom
            kl = -0.5 * (1 + z_log_var - jnp.square(z_mean) - jnp.exp(z_log_var))
            kl_loss = jnp.sum(kl.mean(axis=1) * wb) / denom
            return recon_loss + self.beta * kl_loss, updates["batch_stats"]

        def step(carry, idx):
            variables, opt_state, key = carry
            key, rng = jax.random.split(key)
            xb, wb = x[idx], w[idx]
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"], variables["batch_stats"], xb, wb, rng
            )
            updates, opt_state = self._tx.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            return (
                {"params": params, "batch_stats": new_stats},
                opt_state,
                key,
            ), loss

        key, pkey = jax.random.split(key)
        perm = jax.random.permutation(pkey, x.shape[0])
        batches = perm.reshape(num_batches, self.batch_size)
        (variables, opt_state, _), losses = jax.lax.scan(
            step, (variables, opt_state, key), batches
        )
        return variables, opt_state, jnp.mean(losses)

    def train_model(self, samples, weights):
        """Train on weighted samples with early stopping (patience 3)."""
        x = self._one_hot(samples)
        w = np.asarray(weights, dtype=np.float32)

        # Hold out the trailing validation fraction (keras semantics).
        n_train = max(self.batch_size, int(len(x) * (1 - self.validation_split)))
        n_train = min(n_train, len(x))
        x, w = x[:n_train], w[:n_train]

        bucket = next_bucket(n_train, minimum=self.batch_size)
        bucket = ((bucket + self.batch_size - 1) // self.batch_size) * self.batch_size
        # Pad by REPEATING real rows at weight 0 (not zero rows): padding
        # is shuffled into every minibatch, so all-zero one-hots would
        # pollute the BatchNorm batch statistics and running averages
        # that calculate_log_probability later uses.  Repeats carry real
        # activation statistics and contribute no gradient.
        pad = bucket - n_train
        if pad:
            pidx = np.arange(pad) % n_train
            x = np.concatenate([x, x[pidx]])
            w = np.concatenate([w, np.zeros(pad, np.float32)])
        x = jnp.asarray(x)
        w = jnp.asarray(w)

        best_loss, patience = np.inf, 0
        for _ in range(self.epochs):
            self._key, ekey = jax.random.split(self._key)
            self.variables, self._opt_state, loss = self._epoch_fn(
                self.variables, self._opt_state, x, w, ekey
            )
            loss = float(loss)
            if self.verbose:
                print(f"{self.name}: loss {loss:.4f}")
            if loss < best_loss - 1e-12:
                best_loss, patience = loss, 0
            else:
                patience += 1
                if patience >= 3:
                    break

    # -- generation ---------------------------------------------------------
    def generate(
        self, n_samples: int, existing_samples, existing_weights=None
    ) -> List[str]:
        """Generate `n_samples` novel sequences by Boltzmann-sampling a PWM.

        Decodes a single latent normal draw into a PWM, then draws batches
        at escalating temperature until `n_samples` sequences not in
        `existing_samples` are collected.
        """
        z = self._rng.standard_normal((1, self.latent_dim)).astype(np.float32)
        pwm_flat = np.asarray(self._decode_one(self.variables, jnp.asarray(z)))[0]
        pwm = pwm_flat.reshape(self.seq_length, len(self.alphabet)).T  # [A, L]

        if np.isnan(pwm).any() or np.isinf(pwm).any():
            raise ValueError("NaN and/or inf in the reconstruction matrix")

        existing = set(existing_samples)
        proposals: List[str] = []
        seen = set()
        temperature = 0.001
        max_rounds = 200

        for _ in range(max_rounds):
            if len(proposals) >= n_samples:
                break
            weights = pwm_to_boltzmann_weights(pwm, temperature)  # [A, L]
            need = n_samples - len(proposals)
            # Vectorized categorical draw per position for a whole batch.
            cum = np.cumsum(weights.T, axis=1)  # [L, A]
            u = self._rng.random((need, self.seq_length, 1))
            tokens = (u > cum[None, :, :]).sum(axis=2).astype(np.int32)
            # cumsum can end at 1 - O(1e-15); a draw in that gap would
            # emit token == len(alphabet) and index out of the alphabet.
            tokens = np.minimum(tokens, len(self.alphabet) - 1)
            batch = self.alphabet.decode(tokens)
            rejections = 0
            for s in batch:
                if s not in existing and s not in seen:
                    seen.add(s)
                    proposals.append(s)
                else:
                    rejections += 1
            # Reference escalates temperature 1.3x per rejected draw —
            # but it draws ONE AT A TIME, so escalation stops as soon as
            # the warmer PWM starts yielding novel draws.  A whole batch
            # drawn at one (possibly argmax-collapsed) temperature can
            # reject ~everything at once, and 1.3**99 ~ 2e8 would blow
            # straight past the diversification point into uniform
            # sampling; cap the per-batch exponent (documented deviation:
            # batched escalation, bounded per batch, unbounded overall).
            if rejections:
                temperature *= 1.3 ** min(rejections, 20)

        if len(proposals) < n_samples:
            raise RuntimeError(
                f"VAE.generate could not find {n_samples} novel sequences"
            )
        return proposals[:n_samples]

    # -- scoring ------------------------------------------------------------
    def _reconstruct_impl(self, variables, x):
        """Deterministic reconstruction: decode(z_mean(encode(x)))."""
        z_mean, _ = self.module.apply(
            variables, x, train=False, method=VAEModule.encode
        )
        return self.module.apply(
            variables, z_mean, train=False, method=VAEModule.decode
        )

    def calculate_log_probability(self, sequences, vae=None) -> np.ndarray:
        """Log probability of reconstructing each sequence.

        `vae` may be a variables snapshot (the CbAS vae_0) or None for the
        current weights.

        Documented deviation: reconstruction decodes the DETERMINISTIC
        z_mean, where the reference's `vae.predict` routes through the
        stochastic Sampling layer (VAE_utils.py:189-217 upstream) — one
        z ~ N(z_mean, z_sd) per call.  The deterministic form makes CbAS
        importance weights reproducible; it is the mode of the
        reference's noisy estimate.
        """
        variables = vae if vae is not None else self.variables
        x = self._one_hot(sequences)
        n = len(x)
        bucket = next_bucket(n, minimum=64)
        decoded = np.asarray(
            self._reconstruct(variables, jnp.asarray(pad_rows(x, bucket)))
        )[:n]
        decoded = decoded.reshape(n, self.seq_length, len(self.alphabet))
        one_hots = x.reshape(n, self.seq_length, len(self.alphabet))

        per_res_probs = (decoded * one_hots).max(axis=2) / decoded.sum(axis=2)
        log_probs = np.log(1e-9 + per_res_probs).sum(axis=1)
        return np.nan_to_num(log_probs)
