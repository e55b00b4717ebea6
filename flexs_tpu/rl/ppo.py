"""Minimal pure-JAX PPO agent (actor-critic, clipped surrogate objective).

Replaces the reference's TF-Agents PPOAgent (reference ppo.py:80-91,
dyna_ppo.py:193-211: actor/value nets with fc_layer_params=[128], Adam,
10 train epochs per batch).  TF-Agents' default PPO variant penalizes KL
adaptively; this implementation uses the standard clipped surrogate
(epsilon 0.2) with GAE(lambda) advantages — a documented re-design, same
algorithmic family, far simpler to fuse into device programs.

The agent is stateless-functional inside: parameters and optimizer state
live in `self._state`; `act` and `train` are jitted device calls.
"""
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class ActorCritic(nn.Module):
    """Separate fc actor and critic towers over flattened observations."""

    num_actions: int
    fc_layers: Sequence[int] = (128,)

    @nn.compact
    def __call__(self, obs):
        a = obs
        for width in self.fc_layers:
            a = nn.tanh(nn.Dense(width)(a))
        logits = nn.Dense(self.num_actions)(a)

        v = obs
        for width in self.fc_layers:
            v = nn.tanh(nn.Dense(width)(v))
        value = nn.Dense(1)(v)
        return logits, value.squeeze(-1)


class PPOAgent:
    """Clipped-surrogate PPO over integer action spaces."""

    def __init__(
        self,
        obs_dim: int,
        num_actions: int,
        fc_layers: Sequence[int] = (128,),
        learning_rate: float = 3e-4,
        train_epochs: int = 10,
        clip_eps: float = 0.2,
        gamma: float = 0.99,
        gae_lambda: float = 0.95,
        value_coef: float = 0.5,
        entropy_coef: float = 0.01,
        normalize_observations: bool = True,
        seed: int = 0,
    ):
        """Create the agent.

        Defaults follow standard PPO practice (lr 3e-4, small entropy
        bonus, running observation normalization — TF-Agents normalizes
        observations/rewards by default too; the reference's 1e-5 Adam
        barely moves the policy within a FLEXS budget).
        """
        self.num_actions = num_actions
        self.gamma = gamma
        self.gae_lambda = gae_lambda
        self.train_epochs = train_epochs
        self.clip_eps = clip_eps
        self.value_coef = value_coef
        self.entropy_coef = entropy_coef

        self.normalize_observations = normalize_observations
        self._obs_count = 1e-4
        self._obs_mean = np.zeros(obs_dim, np.float64)
        self._obs_m2 = np.ones(obs_dim, np.float64)

        self._net = ActorCritic(num_actions, tuple(fc_layers))
        self._tx = optax.adam(learning_rate)
        self._key = jax.random.PRNGKey(seed)
        self._key, init_key = jax.random.split(self._key)
        self.params = self._net.init(init_key, jnp.zeros((1, obs_dim), jnp.float32))
        self._opt_state = self._tx.init(self.params)

        self._act = jax.jit(self._act_impl)
        self._update = jax.jit(self._update_impl)

    # -- observation normalization -------------------------------------------
    def _update_obs_stats(self, obs: np.ndarray):
        # Chan's parallel Welford combine: one vectorized batch update,
        # numerically identical to the row-at-a-time recursion (which
        # cost thousands of Python-level iterations per train call).
        obs = np.asarray(obs, np.float64)
        n_b = obs.shape[0]
        if n_b == 0:
            return
        mean_b = obs.mean(axis=0)
        m2_b = ((obs - mean_b) ** 2).sum(axis=0)
        n_a = self._obs_count
        total = n_a + n_b
        delta = mean_b - self._obs_mean
        self._obs_mean = self._obs_mean + delta * (n_b / total)
        self._obs_m2 = self._obs_m2 + m2_b + delta**2 * (n_a * n_b / total)
        self._obs_count = total

    def _normalize(self, obs):
        if not self.normalize_observations:
            return obs
        var = self._obs_m2 / max(self._obs_count, 1.0)
        return (obs - self._obs_mean) / np.sqrt(var + 1e-8)

    # -- acting -------------------------------------------------------------
    def _act_impl(self, params, obs, key, action_mask):
        logits, value = self._net.apply(params, obs)
        logits = jnp.where(action_mask, logits, -jnp.inf)
        action = jax.random.categorical(key, logits)
        logprob = jax.nn.log_softmax(logits)[
            jnp.arange(obs.shape[0]), action
        ]
        return action, logprob, value

    def act(self, obs: np.ndarray, action_mask: Optional[np.ndarray] = None):
        """Sample actions for a [B, obs_dim] observation batch.

        Returns (actions, logprobs, values) as numpy arrays.
        """
        obs = jnp.asarray(self._normalize(np.asarray(obs)), jnp.float32)
        if action_mask is None:
            mask = jnp.ones((obs.shape[0], self.num_actions), bool)
        else:
            mask = jnp.asarray(action_mask, bool)
        self._key, act_key = jax.random.split(self._key)
        action, logprob, value = self._act(self.params, obs, act_key, mask)
        return np.asarray(action), np.asarray(logprob), np.asarray(value)

    # -- training -----------------------------------------------------------
    def compute_gae(self, rewards, values, dones, last_value=0.0):
        """GAE(lambda) advantages + returns over a flat step sequence.

        `dones[t]` marks the step that ENDS an episode; bootstrapping stops
        there.
        """
        T = len(rewards)
        adv = np.zeros(T, np.float32)
        last_adv = 0.0
        next_value = last_value
        for t in reversed(range(T)):
            # dones[t] == the episode ends AFTER action t: the (1 - done)
            # factor cuts both the bootstrap and the advantage recursion at
            # the boundary.
            nonterminal = 1.0 - float(dones[t])
            delta = rewards[t] + self.gamma * next_value * nonterminal - values[t]
            last_adv = delta + self.gamma * self.gae_lambda * nonterminal * last_adv
            adv[t] = last_adv
            next_value = values[t]
        returns = adv + values
        return adv, returns

    def _update_impl(self, params, opt_state, obs, actions, old_logprobs, adv, returns, masks):
        def loss_fn(p):
            logits, values = self._net.apply(p, obs)
            logits = jnp.where(masks, logits, -jnp.inf)
            logps = jax.nn.log_softmax(logits)
            logprob = logps[jnp.arange(obs.shape[0]), actions]
            ratio = jnp.exp(logprob - old_logprobs)
            clipped = jnp.clip(ratio, 1 - self.clip_eps, 1 + self.clip_eps)
            policy_loss = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
            value_loss = jnp.mean(jnp.square(values - returns))
            # Sanitize BEFORE multiplying: probs * logps is 0 * -inf =
            # NaN at masked entries, and a NaN in the untaken where-branch
            # still poisons the log_softmax VJP (NaN grads on the first
            # update with any False mask).
            safe_logps = jnp.where(masks, logps, 0.0)
            entropy = -jnp.mean(
                jnp.sum(jnp.exp(safe_logps) * safe_logps * masks, axis=1)
            )
            return (
                policy_loss
                + self.value_coef * value_loss
                - self.entropy_coef * entropy
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def train(self, batch: Dict[str, np.ndarray]) -> float:
        """Run `train_epochs` full-batch PPO updates on a trajectory batch.

        batch keys: obs [T, obs_dim], actions [T], logprobs [T],
        rewards [T], dones [T], values [T]; optional masks [T, A].
        """
        adv, returns = self.compute_gae(
            np.asarray(batch["rewards"], np.float32),
            np.asarray(batch["values"], np.float32),
            np.asarray(batch["dones"]),
        )
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        # Normalize with the stats in effect at COLLECTION time (act()
        # used them for old_logprobs/values), so the PPO ratio is exactly
        # 1 at epoch 0; fold this batch into the stats afterwards for
        # the next collection phase.
        obs = jnp.asarray(self._normalize(np.asarray(batch["obs"])), jnp.float32)
        self._update_obs_stats(batch["obs"])
        actions = jnp.asarray(batch["actions"], jnp.int32)
        old_logprobs = jnp.asarray(batch["logprobs"], jnp.float32)
        masks = batch.get("masks")
        if masks is None:
            masks = jnp.ones((obs.shape[0], self.num_actions), bool)
        else:
            masks = jnp.asarray(masks, bool)

        loss = np.nan
        for _ in range(self.train_epochs):
            self.params, self._opt_state, loss = self._update(
                self.params,
                self._opt_state,
                obs,
                actions,
                old_logprobs,
                jnp.asarray(adv),
                jnp.asarray(returns),
                masks,
            )
        return float(loss)
