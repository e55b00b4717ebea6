"""Fully-jitted PPO + NoisyAbstractModel runs.

The host PPO explorer (baselines/explorers/ppo.py, cited against the
reference there) walks ONE mutation environment with singleton policy and
model calls — thousands of tiny dispatches per round.  This runner fuses
the whole experiment into one device program: every policy forward, NAM
query, episode-termination check, reseed draw, GAE computation, and the
10-epoch PPO update all run inside a `lax.scan`-over-rounds /
`while_loop`-over-steps program.

Semantics per host explorer / environment:
  * env step (environments/ppo.py:81-109): no-op action (residue already
    there) terminates with reward 0 and NO model query; otherwise the
    mutant is scored (1 query); revisiting a sequence within the episode
    terminates with reward -1; a fitness decrease terminates with reward =
    fitness; otherwise reward = fitness and the walk continues.
  * episode boundary: the final sequence and its fitness are recorded and
    the walk reseeds from a uniform choice among recorded sequences within
    90% of the best recorded fitness (ppo.py:73-82).
  * after the budget is spent: ONE PPO training call on the round's whole
    trajectory — GAE(0.99, 0.95) advantages, advantage normalization,
    running observation normalization (Welford, updated per round), 10
    full-batch clipped-surrogate epochs with Adam(3e-4) (rl/ppo.py).
  * proposals: top `sequences_batch_size` recorded sequences by recorded
    fitness, novel vs measured data.
"""
import time
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.ops import packed_hamming
from flexs_tpu.rl.ppo import ActorCritic
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime import surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import RunResult, device_run_args, fetch_run_result, _dists_to_cache, _masked_append


@partial(
    jax.jit,
    static_argnames=("cfg", "fitness_fn", "train_epochs"),
)
def run_ppo_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    train_epochs: int = 10,
    learning_rate: float = 3e-4,
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    clip_eps: float = 0.2,
    value_coef: float = 0.5,
    entropy_coef: float = 0.01,
) -> RunResult:
    """Run a full PPO + NAM experiment on device."""
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    dim = L * A
    num_actions = dim
    ss = jnp.asarray(signal_strength, jnp.float32)

    # Each loop iteration either queries (reset / real step) or records a
    # free no-op step that forces a reset (>= 1 query) next iteration.
    traj_cap = 2 * budget + 4
    rec_cap = budget + 2  # every episode costs >= 1 query
    ep_cap = budget + 2
    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (budget + B) + 1

    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

    net = ActorCritic(num_actions, (128,))
    tx = optax.adam(learning_rate)

    def one_hot_flat(tokens):
        return jax.nn.one_hot(tokens, A, dtype=jnp.float32).reshape(-1)

    # --- NAM query of ONE sequence (dqn_runner pattern) ----------------------
    def nam_query_one(cache, costs, tokens, key, surr=None):
        """Surrogate mode: a fresh forward through the carried net (it
        retrains between rounds, so stale cached predictions must never be
        served); the cache still tracks seen sequences; no landscape cost
        accrues."""
        cache_tokens, cache_pk, cache_vals, cache_truth, n_cache = cache
        model_cost, landscape_cost = costs

        tokens_b = tokens[None]
        pk = pack(tokens_b)
        dists = _dists_to_cache(pk, cache_pk, n_cache, bits, per_word)[0]
        min_dist = jnp.min(dists)
        nearest = jnp.argmin(dists)
        cached = min_dist == 0

        if cfg.surrogate is not None:
            signal = surrogate_lib.predict(cfg.surrogate, A, surr, tokens_b)[0]
            value = signal
        elif cfg.perfect_model:
            signal = fitness_fn(fitness_params, tokens_b)[0]
            value = jnp.where(cached, cache_vals[nearest], signal)
        else:
            signal = fitness_fn(fitness_params, tokens_b)[0]
            key, k_exp, k_choice = jax.random.split(key, 3)
            expo = jax.random.exponential(k_exp, ())
            rand_idx = jax.random.randint(k_choice, (), 0, jnp.maximum(n_cache, 1))
            neighbor_truth = cache_truth[nearest]
            noise = jnp.where(
                neighbor_truth >= 0, expo * neighbor_truth, cache_vals[rand_idx]
            )
            alpha = jnp.power(ss, min_dist)
            value = jnp.where(
                cached, cache_vals[nearest], alpha * signal + (1 - alpha) * noise
            )

        insert = jnp.logical_not(cached)
        cache_tokens, _, n_cache, (cache_pk, cache_vals, cache_truth) = (
            _masked_append(
                cache_tokens,
                tokens_b,
                n_cache,
                insert[None],
                aux_bufs=(cache_pk, cache_vals, cache_truth),
                aux_rows=(pk, value[None], signal[None]),
            )
        )
        model_cost = model_cost + 1
        if not cfg.perfect_model and cfg.surrogate is None:
            landscape_cost = landscape_cost + 2 * insert.astype(jnp.int32)
        return (
            (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
            (model_cost, landscape_cost),
            value,
        )

    # --- initial state --------------------------------------------------------
    start_truth = fitness_fn(fitness_params, start_tokens[None])[0]

    measured_tokens = jnp.zeros((measured_cap, L), jnp.int32).at[0].set(start_tokens)
    measured_truth = (
        jnp.full((measured_cap,), -jnp.inf, jnp.float32).at[0].set(start_truth)
    )
    n_measured = jnp.int32(1)

    cache_tokens = jnp.zeros((cache_cap, L), jnp.int32).at[0].set(start_tokens)
    cache_pk = jnp.zeros((cache_cap, words), jnp.uint32).at[0].set(
        pack(start_tokens[None])[0]
    )
    cache_vals = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache_truth = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache = (cache_tokens, cache_pk, cache_vals, cache_truth, jnp.int32(1))

    key, init_key = jax.random.split(key)
    params = net.init(init_key, jnp.zeros((1, dim), jnp.float32))
    opt_state = tx.init(params)
    # Running observation normalization (Welford; rl/ppo.py:91-102).
    obs_stats = (
        jnp.float32(1e-4),  # count
        jnp.zeros((dim,), jnp.float32),  # mean
        jnp.ones((dim,), jnp.float32),  # m2
    )

    def normalize(obs_stats, obs):
        count, mean, m2 = obs_stats
        var = m2 / jnp.maximum(count, 1.0)
        return (obs - mean) / jnp.sqrt(var + 1e-8)

    def update_obs_stats(obs_stats, obs, mask):
        """Merge a masked batch into the running Welford accumulator."""
        count, mean, m2 = obs_stats
        n_b = jnp.sum(mask)
        w = mask.astype(jnp.float32)[:, None]
        mean_b = jnp.sum(obs * w, axis=0) / jnp.maximum(n_b, 1)
        m2_b = jnp.sum(jnp.square(obs - mean_b) * w, axis=0)
        delta = mean_b - mean
        tot = count + n_b
        new_mean = mean + delta * n_b / tot
        new_m2 = m2 + m2_b + jnp.square(delta) * count * n_b / tot
        return (tot, new_mean, new_m2)

    def round_body(carry, _):
        (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
            costs,
            params,
            opt_state,
            obs_stats,
            seed_tokens,
            surr_state,
            key,
        ) = carry
        round_start_cost = costs[0]

        # Surrogate mode: warm-started multi-epoch fit on the measured
        # buffer at round start (reference explorer.py:157-160).
        if cfg.surrogate is not None:
            key, k_fit = jax.random.split(key)
            surr_state = surrogate_lib.train(
                cfg.surrogate, A, surr_state,
                measured_tokens, measured_truth, n_measured, k_fit,
            )

        traj = {
            "obs_tokens": jnp.zeros((traj_cap, L), jnp.int32),
            "actions": jnp.zeros((traj_cap,), jnp.int32),
            "logprobs": jnp.zeros((traj_cap,), jnp.float32),
            "rewards": jnp.zeros((traj_cap,), jnp.float32),
            "dones": jnp.zeros((traj_cap,), bool),
            "values": jnp.zeros((traj_cap,), jnp.float32),
        }
        rec_tokens = jnp.zeros((rec_cap, L), jnp.int32)
        rec_pk = jnp.zeros((rec_cap, words), jnp.uint32)
        rec_fit = jnp.full((rec_cap,), -jnp.inf, jnp.float32)
        n_rec = jnp.int32(0)
        ep_pk = jnp.zeros((ep_cap, words), jnp.uint32)

        def step_cond(state):
            return state["costs"][0] - round_start_cost < budget

        def step_body(state):
            key = state["key"]
            cache, costs = state["cache"], state["costs"]
            traj, n_traj = state["traj"], state["n_traj"]
            walk, fitness = state["walk"], state["fitness"]
            prev_fitness, n_steps = state["prev_fitness"], state["n_steps"]
            ep_pk, n_ep = state["ep_pk"], state["n_ep"]
            rec_tokens, rec_pk, rec_fit, n_rec = (
                state["rec_tokens"],
                state["rec_pk"],
                state["rec_fit"],
                state["n_rec"],
            )
            seed_tokens = state["seed_tokens"]

            def do_reset(args):
                (cache, costs, key) = args
                key, k_nam = jax.random.split(key)
                cache, costs, fit = nam_query_one(
                    cache, costs, seed_tokens, k_nam, surr_state
                )
                return (
                    cache,
                    costs,
                    key,
                    seed_tokens,
                    fit,
                    jnp.float32(-jnp.inf),
                    jnp.int32(0),
                    jnp.zeros_like(ep_pk),
                    jnp.int32(0),
                )

            def no_reset(args):
                (cache, costs, key) = args
                return (
                    cache,
                    costs,
                    key,
                    walk,
                    fitness,
                    prev_fitness,
                    n_steps,
                    ep_pk,
                    n_ep,
                )

            (cache, costs, key, walk, fitness, prev_fitness, n_steps, ep_pk,
             n_ep) = jax.lax.cond(
                state["needs_reset"], do_reset, no_reset,
                (cache, costs, key),
            )

            # Policy forward on the (normalized) one-hot observation.
            obs = one_hot_flat(walk)
            logits, value = net.apply(
                params, normalize(obs_stats, obs)[None]
            )
            key, k_act = jax.random.split(key)
            action = jax.random.categorical(k_act, logits[0])
            logprob = jax.nn.log_softmax(logits[0])[action]

            pos, res = action // A, action % A
            no_op = walk[pos] == res
            new_walk = walk.at[pos].set(res)

            # Score the mutant (skipped entirely on a no-op, which costs
            # nothing and terminates the episode — env.step:91-92).
            def score(args):
                cache, costs, key = args
                key, k_nam = jax.random.split(key)
                cache, costs, fit = nam_query_one(
                    cache, costs, new_walk, k_nam, surr_state
                )
                return cache, costs, key, fit

            cache, costs, key, new_fitness = jax.lax.cond(
                no_op,
                lambda args: (args[0], args[1], args[2], fitness),
                score,
                (cache, costs, key),
            )

            new_pk = pack(new_walk[None])
            ep_d = _dists_to_cache(new_pk, ep_pk, n_ep, bits, per_word)[0]
            revisit = ~no_op & (jnp.min(ep_d) == 0)
            decreased = ~no_op & ~revisit & (new_fitness < prev_fitness)
            budget_done = costs[0] - round_start_cost >= budget
            hit_cap = n_steps + 1 >= budget
            done = no_op | revisit | decreased | budget_done | hit_cap

            reward = jnp.where(
                no_op, 0.0, jnp.where(revisit, -1.0, new_fitness)
            )

            # Record the step into the trajectory.
            traj = {
                "obs_tokens": traj["obs_tokens"].at[n_traj].set(walk, mode="drop"),
                "actions": traj["actions"].at[n_traj].set(
                    action.astype(jnp.int32), mode="drop"
                ),
                "logprobs": traj["logprobs"].at[n_traj].set(logprob, mode="drop"),
                "rewards": traj["rewards"].at[n_traj].set(reward, mode="drop"),
                "dones": traj["dones"].at[n_traj].set(done, mode="drop"),
                "values": traj["values"].at[n_traj].set(value[0], mode="drop"),
            }
            n_traj = jnp.minimum(n_traj + 1, traj_cap - 1)

            # Episode bookkeeping.
            ep_pk = ep_pk.at[n_ep].set(new_pk[0], mode="drop")
            n_ep = jnp.minimum(n_ep + 1, ep_cap - 1)
            walk = jnp.where(no_op, walk, new_walk)
            fitness = jnp.where(no_op, fitness, new_fitness)
            prev_fitness = jnp.where(
                done, prev_fitness, jnp.maximum(prev_fitness, new_fitness)
            )

            # Episode boundary: record the final sequence; reseed from the
            # >= 90%-of-best pool.
            def record(args):
                rec_tokens, rec_pk, rec_fit, n_rec, seed_tokens, key = args
                final_pk = pack(walk[None])
                d = _dists_to_cache(final_pk, rec_pk, n_rec, bits, per_word)[0]
                exists = jnp.min(d) == 0
                pos = jnp.argmin(d)
                # Overwrite the recorded fitness if already present (host
                # dict assignment), else append.
                rec_fit = jnp.where(
                    exists, rec_fit.at[pos].set(fitness), rec_fit
                )
                rec_tokens, _, n_rec, (rec_pk, rec_fit) = _masked_append(
                    rec_tokens,
                    walk[None],
                    n_rec,
                    (~exists)[None],
                    aux_bufs=(rec_pk, rec_fit),
                    aux_rows=(final_pk, fitness[None]),
                )
                top = jnp.max(rec_fit, initial=-jnp.inf, where=jnp.arange(rec_cap) < n_rec)
                live = jnp.arange(rec_cap) < n_rec
                in_pool = live & (rec_fit >= 0.9 * top)
                # 0.9*top > top when top < 0 empties the pool; the
                # reference then falls back to a uniform choice over ALL
                # recorded sequences (reference ppo.py:108-113).
                in_pool = jnp.where(jnp.any(in_pool), in_pool, live)
                key, k_choice = jax.random.split(key)
                pick = jax.random.categorical(
                    k_choice, jnp.where(in_pool, 0.0, -jnp.inf)
                )
                return rec_tokens, rec_pk, rec_fit, n_rec, rec_tokens[pick], key

            rec_tokens, rec_pk, rec_fit, n_rec, seed_tokens, key = jax.lax.cond(
                done,
                record,
                lambda args: args,
                (rec_tokens, rec_pk, rec_fit, n_rec, seed_tokens, key),
            )

            return {
                "cache": cache,
                "costs": costs,
                "traj": traj,
                "n_traj": n_traj,
                "walk": walk,
                "fitness": fitness,
                "prev_fitness": prev_fitness,
                "n_steps": n_steps + 1,
                "ep_pk": ep_pk,
                "n_ep": n_ep,
                "rec_tokens": rec_tokens,
                "rec_pk": rec_pk,
                "rec_fit": rec_fit,
                "n_rec": n_rec,
                "seed_tokens": seed_tokens,
                "needs_reset": done,
                "key": key,
            }

        state = {
            "cache": cache,
            "costs": costs,
            "traj": traj,
            "n_traj": jnp.int32(0),
            "walk": seed_tokens,
            "fitness": jnp.float32(0.0),
            "prev_fitness": jnp.float32(-jnp.inf),
            "n_steps": jnp.int32(0),
            "ep_pk": ep_pk,
            "n_ep": jnp.int32(0),
            "rec_tokens": rec_tokens,
            "rec_pk": rec_pk,
            "rec_fit": rec_fit,
            "n_rec": n_rec,
            "seed_tokens": seed_tokens,
            "needs_reset": jnp.bool_(True),
            "key": key,
        }
        state = jax.lax.while_loop(step_cond, step_body, state)
        cache, costs, key = state["cache"], state["costs"], state["key"]
        traj, n_traj = state["traj"], state["n_traj"]
        rec_tokens, rec_pk, rec_fit, n_rec = (
            state["rec_tokens"],
            state["rec_pk"],
            state["rec_fit"],
            state["n_rec"],
        )
        seed_tokens = state["seed_tokens"]

        # --- ONE PPO training call on the round's trajectory ----------------
        valid = jnp.arange(traj_cap) < n_traj
        obs = jax.nn.one_hot(traj["obs_tokens"], A, dtype=jnp.float32).reshape(
            traj_cap, dim
        )

        # GAE(lambda) with episode cuts (rl/ppo.py:129-149), masked rows
        # treated as terminal zero-reward states.
        rewards = jnp.where(valid, traj["rewards"], 0.0)
        values = jnp.where(valid, traj["values"], 0.0)
        dones = jnp.where(valid, traj["dones"], True)

        def gae_step(carry, x):
            last_adv, next_value = carry
            reward, value, done = x
            nonterminal = 1.0 - done.astype(jnp.float32)
            delta = reward + gamma * next_value * nonterminal - value
            last_adv = delta + gamma * gae_lambda * nonterminal * last_adv
            return (last_adv, value), last_adv

        _, adv = jax.lax.scan(
            gae_step,
            (jnp.float32(0.0), jnp.float32(0.0)),
            (rewards, values, dones),
            reverse=True,
        )
        returns = adv + values
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        adv_mean = jnp.sum(jnp.where(valid, adv, 0.0)) / n_valid
        adv_var = jnp.sum(jnp.where(valid, jnp.square(adv - adv_mean), 0.0)) / n_valid
        adv = (adv - adv_mean) / (jnp.sqrt(adv_var) + 1e-8)

        obs_stats = update_obs_stats(obs_stats, obs, valid)
        obs_n = normalize(obs_stats, obs)

        def ppo_epoch(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                logits, vals = net.apply(p, obs_n)
                logps = jax.nn.log_softmax(logits)
                logprob = logps[jnp.arange(traj_cap), traj["actions"]]
                ratio = jnp.exp(logprob - traj["logprobs"])
                clipped = jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps)
                w = valid.astype(jnp.float32)
                policy_loss = -jnp.sum(
                    jnp.minimum(ratio * adv, clipped * adv) * w
                ) / n_valid
                value_loss = jnp.sum(jnp.square(vals - returns) * w) / n_valid
                probs = jnp.exp(logps)
                entropy = -jnp.sum(
                    jnp.sum(probs * logps, axis=1) * w
                ) / n_valid
                return (
                    policy_loss + value_coef * value_loss - entropy_coef * entropy
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), _ = jax.lax.scan(
            ppo_epoch, (params, opt_state), None, length=train_epochs
        )

        # --- proposals: top B recorded novel sequences ----------------------
        meas_pk = pack(measured_tokens)
        d = packed_hamming.packed_hamming_matrix(rec_pk, meas_pk, bits, per_word)
        d = jnp.where(jnp.arange(measured_cap)[None, :] < n_measured, d, 10**6)
        novel = (jnp.min(d, axis=1) > 0) & (jnp.arange(rec_cap) < n_rec)
        masked_fit = jnp.where(novel, rec_fit, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(masked_fit, B)
        valid_prop = jnp.isfinite(top_vals)
        proposals = rec_tokens[top_idx]
        truth = jnp.where(
            valid_prop, fitness_fn(fitness_params, proposals), -jnp.inf
        )
        model_cost, landscape_cost = costs
        landscape_cost = landscape_cost + jnp.sum(valid_prop)

        measured_tokens, _, n_measured, (measured_truth,) = _masked_append(
            measured_tokens,
            proposals,
            n_measured,
            valid_prop,
            aux_bufs=(measured_truth,),
            aux_rows=(truth,),
        )

        # NAM train semantics: the next round's model must return TRUTH
        # for measured sequences (reference noisy_abstract_model.py:62-67;
        # the family invariant in jit_runner.py) — overwrite each
        # proposal's cache row.
        c_tokens, c_pk, c_vals, c_truth, c_n = cache
        pd_ = _dists_to_cache(pack(proposals), c_pk, c_n, bits, per_word)
        at = jnp.argmin(pd_, axis=1).astype(jnp.int32)
        hit = (jnp.min(pd_, axis=1) == 0) & valid_prop
        c_vals = c_vals.at[jnp.where(hit, at, cache_cap - 1)].set(
            jnp.where(hit, truth, c_vals[cache_cap - 1])
        )
        cache = (c_tokens, c_pk, c_vals, c_truth, c_n)

        out = (proposals, top_vals, truth, valid_prop, model_cost, landscape_cost)
        return (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
            (model_cost, landscape_cost),
            params,
            opt_state,
            obs_stats,
            seed_tokens,
            surr_state,
            key,
        ), out

    if cfg.surrogate is not None:
        key, k_init = jax.random.split(key)
        surr0 = surrogate_lib.init_state(
            cfg.surrogate, A, L, k_init, capacity=measured_cap
        )
    else:
        surr0 = ()

    init = (
        measured_tokens,
        measured_truth,
        n_measured,
        cache,
        (jnp.int32(0), jnp.int32(1)),
        params,
        opt_state,
        obs_stats,
        start_tokens,
        surr0,
        key,
    )
    _, outs = jax.lax.scan(round_body, init, None, length=R)
    return RunResult(*outs, start_truth=start_truth)


class DevicePPONAM:
    """(df, metadata) wrapper over `run_ppo_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        train_epochs: int = 10,
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        seed: int = 0,
    ):
        """Create the fused PPO runner for `landscape`.

        `model="surrogate"` carries an in-program trained empirical net
        (default = the paper's CNN) that supplies the per-step rewards.
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec()
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.signal_strength = (
            1.0 if model in ("perfect", "surrogate") else signal_strength
        )
        self.train_epochs = train_epochs
        self.seed = seed
        self.name = "DevicePPO_Agent"
        if model == "perfect":
            self.model_name = f"LandscapeAsModel={landscape.name}"
        elif model == "surrogate":
            self.model_name = surrogate_spec.model_name
        else:
            self.model_name = f"NAMb_ss{signal_strength}"
        self.cfg = jit_runner.AdaleadConfig(
            rounds=rounds,
            sequences_batch_size=sequences_batch_size,
            model_queries_per_batch=model_queries_per_batch,
            alphabet_size=len(self.alphabet),
            perfect_model=(model == "perfect"),
            surrogate=surrogate_spec if model == "surrogate" else None,
        )
        self._fitness_fn, self._fitness_params = landscape.device_fitness()

    def run(self, verbose: bool = True) -> Tuple[pd.DataFrame, dict]:
        """Execute the fused PPO experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_ppo_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            train_epochs=self.train_epochs,
        )
        result = fetch_run_result(result)
        self.landscape.add_cost(int(result.landscape_cost[-1]))

        rows = {
            "sequence": [self.starting_sequence],
            "model_score": [np.nan],
            "true_score": [float(result.start_truth)],
            "round": [0],
            "model_cost": [0],
            "measurement_cost": [1],
        }
        measured = 1
        for r in range(self.cfg.rounds):
            valid = result.proposal_valid[r]
            seqs = self.alphabet.decode(result.proposal_tokens[r][valid])
            measured += len(seqs)
            rows["sequence"].extend(seqs)
            rows["model_score"].extend(result.proposal_preds[r][valid].tolist())
            rows["true_score"].extend(result.proposal_truth[r][valid].tolist())
            rows["round"].extend([r + 1] * len(seqs))
            rows["model_cost"].extend([int(result.model_cost[r])] * len(seqs))
            rows["measurement_cost"].extend([measured] * len(seqs))
        df = pd.DataFrame(rows)

        metadata = {
            "exp_name": self.name,
            "model_name": self.model_name,
            "landscape_name": self.landscape.name,
            "rounds": self.cfg.rounds,
            "sequences_batch_size": self.cfg.sequences_batch_size,
            "model_queries_per_batch": self.cfg.model_queries_per_batch,
        }
        if verbose:
            print(
                f"device PPO run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
