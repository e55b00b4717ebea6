"""DQN explorer.

Parity contract (reference baselines/explorers/dqn.py):
  * name "DQN_Explorer" (:88).
  * Q network: Linear(2*A*L -> A*L) -> BN -> Linear(A*L -> L) -> BN ->
    Linear(L -> 1), relu everywhere including the head (:23-44).  The
    reference instantiates the net in eval() mode and never switches to
    train mode, so its batch norms always run with the initial running
    stats (mean 0 / var 1) — i.e. they are affine no-ops; replicated here
    with `use_running_average=True` and frozen stats.
  * Q(s, a) for ALL one-hot actions of a state batch via the repeat trick:
    concat(state x identity-action grid) through one forward (:140-149).
  * epsilon-greedy mutation walk over a single state; "staying in place"
    masked out by zeroing moves at currently-set one-hot positions
    (:190-244); epsilon = max(0.1, 0.5 - cost/(batch*rounds)) (:252-255).
  * PER memory (alpha 0.6); Q-network trained for `train_epochs` epochs
    with a FRESH Adam optimizer each time `model.cost` crosses a multiple
    of `sequences_batch_size` (:170-186, :268-273); TD target = r + gamma *
    max_a' Q(s', a') from the same network; L1 gradient-norm clipping at
    1.0 (:183).
  * Proposes top `sequences_batch_size` generated sequences by model score.

TPU-first design: each walk step runs as ONE jitted program (all-action
Q values + greedy argmax), and a training call is one jitted
scan over `train_epochs` minibatch updates — the reference pays a torch
graph per epoch plus Python segment-tree sampling per batch.
"""
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.explorer import Explorer
from flexs_tpu.model import Model
from flexs_tpu.utils.replay_buffers import PrioritizedReplayBuffer


class QNetwork(nn.Module):
    """Q(s, a) network over concatenated one-hot state and action."""

    seq_len: int
    alphabet_len: int

    @nn.compact
    def __call__(self, x):
        dim = self.alphabet_len * self.seq_len
        x = nn.relu(nn.Dense(dim)(x))
        x = nn.BatchNorm(use_running_average=True)(x)
        x = nn.relu(nn.Dense(self.seq_len)(x))
        x = nn.BatchNorm(use_running_average=True)(x)
        return nn.relu(nn.Dense(1)(x))


def _clip_by_l1_norm(max_norm: float):
    """Optax transform: scale gradients so their global L1 norm <= max_norm."""

    def update_fn(updates, state, params=None):
        del params
        norm = jax.tree.reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g)), updates, jnp.float32(0)
        )
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-12))
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


class DQN(Explorer):
    """DQN explorer: epsilon-greedy mutation walk guided by a Q network."""

    def __init__(
        self,
        model: Model,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        alphabet: str,
        log_file: Optional[str] = None,
        memory_size: int = 100000,
        train_epochs: int = 20,
        gamma: float = 0.9,
        seed: int = 0,
        device: str = "tpu",
    ):
        """Create the DQN explorer.

        Args:
            memory_size: Size of agent replay memory.
            train_epochs: Minibatch updates per training call.
            gamma: Discount factor.
            seed: PRNG seed (the reference uses unseeded global randomness).
            device: Kept for reference API parity; computation always runs
                on the default JAX backend.
        """
        name = "DQN_Explorer"
        super().__init__(
            model,
            name,
            rounds,
            sequences_batch_size,
            model_queries_per_batch,
            starting_sequence,
            log_file,
        )
        self.alphabet = as_alphabet(alphabet)
        self.alphabet_size = len(self.alphabet)
        self.memory_size = memory_size
        self.gamma = gamma
        self.best_fitness = 0
        self.train_epochs = train_epochs
        self.epsilon_min = 0.1
        self.top_sequence = []
        self.num_actions = 0

        self.seq_len = len(starting_sequence)
        self._dim = self.alphabet_size * self.seq_len
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

        self.state = None
        self.memory = None
        self._params = None

        self._q_module = QNetwork(self.seq_len, self.alphabet_size)
        self._all_action_q = jax.jit(self._all_action_q_impl)
        self._train = jax.jit(self._train_impl)

    # -- device programs ----------------------------------------------------
    def _all_action_q_impl(self, params, states):
        """Q values of every one-hot action for a batch of states.

        states: f32[B, dim]  ->  f32[B, dim] of Q(s, a) per action.
        """
        b = states.shape[0]
        states_rep = jnp.repeat(states, self._dim, axis=0)
        actions_rep = jnp.tile(jnp.eye(self._dim, dtype=jnp.float32), (b, 1))
        x = jnp.concatenate([states_rep, actions_rep], axis=1)
        q = self._q_module.apply(params, x)
        return q.reshape(b, self._dim)

    def _train_impl(self, params, obs, acts, rews, next_obs, weights):
        """`train_epochs` Adam steps on stacked PER batches (one scan)."""
        tx = optax.chain(_clip_by_l1_norm(1.0), optax.adam(1e-3))
        opt_state = tx.init(params)

        def loss_fn(p, batch):
            obs_b, acts_b, rews_b, next_b, w_b = batch
            sa = jnp.concatenate([obs_b, acts_b], axis=1)
            q_sa = self._q_module.apply(p, sa).reshape(-1)
            next_q = self._all_action_q_impl(p, next_b)
            target = jax.lax.stop_gradient(
                jnp.max(next_q, axis=1) * self.gamma + rews_b
            )
            # Reference uses unweighted MSELoss (:167-171); IS weights from
            # PER are sampled but unused there — kept identical.
            del w_b
            return jnp.mean(jnp.square(q_sa - target))

        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), (obs, acts, rews, next_obs, weights)
        )
        return params, jnp.mean(losses)

    # -- setup --------------------------------------------------------------
    def initialize_data_structures(self):
        """(Re)build state, Q network parameters, and replay memory."""
        one_hot = np.zeros((self.seq_len, self.alphabet_size), dtype=np.float32)
        tokens = self.alphabet.encode_one(self.starting_sequence)
        one_hot[np.arange(self.seq_len), tokens] = 1
        self.state = one_hot

        self._key, init_key = jax.random.split(self._key)
        self._params = self._q_module.init(
            init_key, jnp.zeros((1, 2 * self._dim), jnp.float32)
        )
        self.memory = PrioritizedReplayBuffer(
            self._dim,
            self.memory_size,
            self.sequences_batch_size,
            0.6,
            seed=int(self._rng.integers(2**31)),
        )

    def train_actor(self, train_epochs: int) -> float:
        """Train the Q network on `train_epochs` PER batches."""
        batches = [self.memory.sample_batch() for _ in range(train_epochs)]
        stack = lambda k: jnp.asarray(  # noqa: E731
            np.stack([b[k] for b in batches]), jnp.float32
        )
        self._params, loss = self._train(
            self._params,
            stack("obs"),
            stack("acts"),
            stack("rews"),
            stack("next_obs"),
            stack("weights"),
        )
        return float(loss)

    # -- walk ---------------------------------------------------------------
    def get_action_and_mutant(self, epsilon: float):
        """Pick an action (epsilon-greedy over masked Q values), mutate state."""
        q = np.asarray(
            self._all_action_q(self._params, jnp.asarray(self.state.reshape(1, -1)))
        ).reshape(self.seq_len, self.alphabet_size)

        # Mask out "stay in place" moves.
        moves = q * (1 - self.state)

        if moves.sum() > 0:
            if self._rng.random() < epsilon:
                nz = np.argwhere(moves != 0)
                x, y = nz[self._rng.integers(len(nz))]
            else:
                x, y = np.unravel_index(np.argmax(moves), moves.shape)
            action = np.zeros_like(moves)
            action[x, y] = moves[x, y]
        else:
            # Fresh networks can output all zeros; take a uniform move.
            action = np.zeros_like(moves)
            action[
                self._rng.integers(self.seq_len),
                self._rng.integers(self.alphabet_size),
            ] = 1

        mutant = self.state.copy()
        (pos,) = np.nonzero(action.sum(axis=1))
        mutant[pos] = 0
        mutant[pos, np.argmax(action[pos], axis=1)] = 1
        self.state = mutant
        return action, mutant

    def propose_sequences(
        self, measured_sequences_data: pd.DataFrame
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Propose top `sequences_batch_size` sequences for evaluation.

        TPU-first restructuring of the reference's per-step loop
        (reference dqn.py:258-297): the epsilon-greedy walk is
        reward-INDEPENDENT (the state always moves to the chosen mutant,
        :225-243), so the walk rolls forward `sequences_batch_size` steps
        at a time and each chunk's mutants are scored in ONE batched model
        call instead of one singleton call per step.  Q training fires
        after each chunk — the same every-`sequences_batch_size`-queries
        cadence as the reference's cost-modulus trigger (:268-273).
        Documented deviation: epsilon anneals per chunk rather than per
        step (same schedule sampled more coarsely), and best-fitness /
        PER storage update after each chunk's scoring instead of per step.
        """
        if self.num_actions == 0:
            self.initialize_data_structures()

        all_measured_seqs = set(measured_sequences_data["sequence"].values)
        sequences = {}

        remaining = self.model_queries_per_batch
        while remaining > 0:
            n_steps = min(self.sequences_batch_size, remaining)
            eps = max(
                self.epsilon_min,
                0.5 - self.model.cost / (self.sequences_batch_size * self.rounds),
            )
            # Phase 1: roll the walk (Q-network only, no oracle queries).
            prev_states = np.empty((n_steps, self.seq_len, self.alphabet_size))
            actions = np.empty_like(prev_states)
            next_states = np.empty_like(prev_states)
            for i in range(n_steps):
                prev_states[i] = self.state
                actions[i], next_states[i] = self.get_action_and_mutant(eps)
            # Phase 2: one batched scoring call for the whole chunk.
            tokens = np.argmax(next_states, axis=2).astype(np.int32)
            strings = self.alphabet.decode(tokens)
            rewards = np.asarray(self.model.get_fitness(strings), dtype=np.float64)
            remaining -= n_steps
            # Phase 3: bookkeeping + PER storage + train trigger.
            for i, seq in enumerate(strings):
                sequences[seq] = rewards[i]
                if seq not in all_measured_seqs:
                    if rewards[i] >= self.best_fitness:
                        self.top_sequence.append(
                            (rewards[i], next_states[i], self.model.cost)
                        )
                    self.best_fitness = max(self.best_fitness, float(rewards[i]))
                    self.memory.store(
                        prev_states[i].ravel(),
                        actions[i].ravel(),
                        float(rewards[i]),
                        next_states[i].ravel(),
                    )
                    all_measured_seqs.add(seq)
            if len(self.memory) >= self.sequences_batch_size:
                self.train_actor(self.train_epochs)
            self.num_actions += n_steps

        new_seqs = np.array(list(sequences.keys()))
        preds = np.array(list(sequences.values()))
        sorted_order = np.argsort(preds)[: -self.sequences_batch_size : -1]

        return new_seqs[sorted_order], preds[sorted_order]
