"""Fully-jitted DQN + NoisyAbstractModel runs.

The host DQN explorer (baselines/explorers/dqn.py, cited against the
reference there) walks ONE state with singleton model queries — thousands
of tiny dispatches per round. This runner fuses the whole experiment into
one device program: every epsilon-greedy step (all-action Q forward, move
masking, mutation), NAM scoring, prioritized-replay storage, and each
periodic 20-epoch Q-network training burst run inside a
`lax.scan`-over-rounds / `while_loop`-over-steps program.

Semantics per host explorer:
  * Q(s, a) for all one-hot actions via the repeat trick; "stay in place"
    moves masked out; epsilon = max(0.1, 0.5 - cost/(batch * rounds));
  * transitions stored at max priority when the mutant is novel
    (vs measured + this run's proposals); rewards come from the NAM;
  * the Q network trains for `train_epochs` prioritized batches with a
    FRESH Adam each time `model_cost` crosses a multiple of
    `sequences_batch_size` (L1-clipped gradients);
  * each round proposes the top `sequences_batch_size` novel sequences.

Device representation notes: the replay memory stores token arrays plus
(flat action index, action value) pairs instead of one-hot floats, so a
protein-scale buffer stays tiny; one-hots are reconstructed on the fly
inside the jitted training burst.
"""
import time
from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.baselines.explorers.dqn import QNetwork, _clip_by_l1_norm
from flexs_tpu.ops import packed_hamming
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime import surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import RunResult, device_run_args, fetch_run_result, _dists_to_cache, _masked_append


@partial(
    jax.jit,
    static_argnames=("cfg", "fitness_fn", "memory_size", "train_epochs"),
)
def run_dqn_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    memory_size: int,
    train_epochs: int,
    gamma,
):
    """Run a full DQN + NAM experiment on device."""
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    dim = L * A
    ss = jnp.asarray(signal_strength, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)

    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (budget + 2) + 1
    gen_cap = budget + 2

    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

    q_module = QNetwork(L, A)

    def all_action_q(params, tokens):
        """Q values of every one-hot action for ONE state (int[L])."""
        state = jax.nn.one_hot(tokens, A, dtype=jnp.float32).reshape(dim)
        states_rep = jnp.broadcast_to(state, (dim, dim))
        actions = jnp.eye(dim, dtype=jnp.float32)
        x = jnp.concatenate([states_rep, actions], axis=1)
        return q_module.apply(params, x).reshape(L, A)

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
    n_cache = jnp.int32(1)

    # Replay memory (ring): token states, action (flat idx, value), reward.
    mem = {
        "obs": jnp.zeros((memory_size, L), jnp.int32),
        "next_obs": jnp.zeros((memory_size, L), jnp.int32),
        "act_idx": jnp.zeros((memory_size,), jnp.int32),
        "act_val": jnp.zeros((memory_size,), jnp.float32),
        "rew": jnp.zeros((memory_size,), jnp.float32),
        "prio": jnp.zeros((memory_size,), jnp.float32),
    }
    mem_ptr = jnp.int32(0)
    mem_n = jnp.int32(0)

    key, init_key = jax.random.split(key)
    q_params = q_module.init(init_key, jnp.zeros((1, 2 * dim), jnp.float32))

    def nam_query_one(cache, costs, tokens, key, surr=None):
        """NAM scoring of a single sequence (int[L]).

        Surrogate mode: a fresh forward through the carried net (it
        retrains between rounds, so stale cached predictions must never
        be served); the cache still tracks seen sequences; no landscape
        cost accrues.
        """
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
        cache_tokens, pos, n_cache, (cache_pk, cache_vals, cache_truth) = (
            _masked_append(
                cache_tokens,
                tokens_b,
                n_cache,
                insert[None],
                aux_bufs=(cache_pk, cache_vals, cache_truth),
                aux_rows=(pk, value[None], signal[None]),
            )
        )
        # Cached queries get their EXISTING row (masked appends park at
        # the trash row) so the end-of-round truth write-back lands on
        # the real slot — same correction as jit_runner.nam_query.
        pos = jnp.where(cached, nearest.astype(jnp.int32), pos[0])
        model_cost = model_cost + 1
        if not cfg.perfect_model and cfg.surrogate is None:
            landscape_cost = landscape_cost + 2 * insert.astype(jnp.int32)
        return (
            (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
            (model_cost, landscape_cost),
            value,
            pos,
        )

    def train_burst(q_params, mem, mem_n, key):
        """`train_epochs` PER-sampled Adam steps with a fresh optimizer."""
        tx = optax.chain(_clip_by_l1_norm(1.0), optax.adam(1e-3))
        opt_state = tx.init(q_params)

        def sample(key):
            # Stratified proportional sampling over the priority mass.
            p = jnp.where(jnp.arange(memory_size) < mem_n, mem["prio"], 0.0)
            cum = jnp.cumsum(p)
            total = cum[-1]
            seg = total / B
            u = jax.random.uniform(key, (B,))
            bounds = seg * (jnp.arange(B) + u)
            return jnp.clip(
                jnp.searchsorted(cum, bounds, side="right"), 0, memory_size - 1
            )

        def loss_fn(p, idx):
            obs = jax.nn.one_hot(mem["obs"][idx], A, dtype=jnp.float32).reshape(B, dim)
            next_obs_tok = mem["next_obs"][idx]
            acts = (
                jax.nn.one_hot(mem["act_idx"][idx], dim, dtype=jnp.float32)
                * mem["act_val"][idx][:, None]
            )
            rews = mem["rew"][idx]
            q_sa = q_module.apply(p, jnp.concatenate([obs, acts], axis=1)).reshape(-1)
            next_q = jax.vmap(lambda t: all_action_q(p, t))(next_obs_tok)
            target = jax.lax.stop_gradient(
                jnp.max(next_q.reshape(B, dim), axis=1) * gamma + rews
            )
            return jnp.mean(jnp.square(q_sa - target))

        def step(carry, _):
            p, opt_state, key = carry
            key, k = jax.random.split(key)
            idx = sample(k)
            loss, grads = jax.value_and_grad(loss_fn)(p, idx)
            updates, opt_state = tx.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state, key), loss

        (q_params, _, _), _ = jax.lax.scan(
            step, (q_params, opt_state, key), None, length=train_epochs
        )
        return q_params

    def round_body(carry, _):
        (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
            mem,
            mem_ptr,
            mem_n,
            q_params,
            walk,
            model_cost,
            landscape_cost,
            surr_state,
            key,
        ) = carry
        round_start_cost = model_cost

        # Surrogate mode: warm-started multi-epoch fit on the measured
        # buffer at round start (reference explorer.py:157-160).
        if cfg.surrogate is not None:
            key, k_fit = jax.random.split(key)
            surr_state = surrogate_lib.train(
                cfg.surrogate, A, surr_state,
                measured_tokens, measured_truth, n_measured, k_fit,
            )

        gen_tokens = jnp.zeros((gen_cap, L), jnp.int32)
        gen_preds = jnp.full((gen_cap,), -jnp.inf, jnp.float32)
        gen_pk = jnp.zeros((gen_cap, words), jnp.uint32)
        gen_cache_pos = jnp.zeros((gen_cap,), jnp.int32)
        n_gen = jnp.int32(0)

        meas_pk = pack(measured_tokens)
        # `walk` persists ACROSS rounds (reference dqn.py:283-285: data
        # structures are only initialized when num_actions == 0, i.e.
        # round 1; later rounds continue the walk where it stopped).

        def step_cond(state):
            costs = state[5]
            return costs[0] - round_start_cost < budget

        def step_body(state):
            (
                walk,
                gen_state,
                cache,
                mem_state,
                q_params,
                costs,
                key,
            ) = state
            gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen = gen_state
            mem, mem_ptr, mem_n = mem_state
            model_cost, _ = costs

            eps = jnp.maximum(
                0.1, 0.5 - model_cost.astype(jnp.float32) / (B * R)
            )

            q = all_action_q(q_params, walk)  # [L, A]
            state_oh = jax.nn.one_hot(walk, A, dtype=jnp.float32)
            moves = q * (1 - state_oh)

            key, k_eps, k_rand, k_uni, k_nam = jax.random.split(key, 5)
            nonzero = moves != 0
            # Reference gate is moves.sum() > 0 (dqn.py:201): with all-
            # negative Q values over unmasked moves the reference takes
            # the uniform fallback — any(moves != 0) would instead go
            # greedy and argmax could land on a masked stay-in-place 0.
            any_move = jnp.sum(moves) > 0
            # Random nonzero move (uniform over nonzero entries).
            rand_logits = jnp.where(nonzero, 0.0, -jnp.inf).reshape(-1)
            rand_flat = jax.random.categorical(k_rand, rand_logits)
            greedy_flat = jnp.argmax(moves.reshape(-1))
            flat = jnp.where(jax.random.uniform(k_eps) < eps, rand_flat, greedy_flat)
            uni_flat = jax.random.randint(k_uni, (), 0, dim)
            flat = jnp.where(any_move, flat, uni_flat)

            pos, res = flat // A, flat % A
            act_val = jnp.where(any_move, moves.reshape(-1)[flat], 1.0)
            new_walk = walk.at[pos].set(res)

            cache, costs, reward, cpos = nam_query_one(
                cache, costs, new_walk, k_nam, surr_state
            )

            # Novelty vs measured + this run's proposals (gen pool).
            new_pk = pack(new_walk[None])
            meas_d = packed_hamming.packed_hamming_matrix(
                new_pk, meas_pk, bits, per_word
            )[0]
            meas_d = jnp.where(jnp.arange(measured_cap) < n_measured, meas_d, 10**6)
            gen_d = packed_hamming.packed_hamming_matrix(
                new_pk, gen_pk, bits, per_word
            )[0]
            gen_d = jnp.where(jnp.arange(gen_cap) < n_gen, gen_d, 10**6)
            # Memory stores gate on novelty vs measured AND previously-
            # walked (reference pick_action's all_measured_seqs, which
            # the propose loop grows with every walked sequence).
            novel = (jnp.min(meas_d) > 0) & (jnp.min(gen_d) > 0)
            # The proposal dict records EVERY walked sequence (reference
            # dqn.py:291 sequences[seq] = pred, unconditional) — only
            # in-pool duplicates are skipped (dict key upsert; NAM/
            # perfect values are cached so re-writes are value no-ops).
            fresh_in_gen = jnp.min(gen_d) > 0

            # Store the transition at max priority when novel.
            def store(args):
                mem, mem_ptr, mem_n = args
                max_prio = jnp.maximum(jnp.max(mem["prio"]), 1.0)
                mem = {
                    "obs": mem["obs"].at[mem_ptr].set(walk),
                    "next_obs": mem["next_obs"].at[mem_ptr].set(new_walk),
                    "act_idx": mem["act_idx"].at[mem_ptr].set(flat.astype(jnp.int32)),
                    "act_val": mem["act_val"].at[mem_ptr].set(act_val),
                    "rew": mem["rew"].at[mem_ptr].set(reward),
                    "prio": mem["prio"].at[mem_ptr].set(max_prio),
                }
                return mem, (mem_ptr + 1) % memory_size, jnp.minimum(
                    mem_n + 1, memory_size
                )

            mem, mem_ptr, mem_n = jax.lax.cond(
                novel, store, lambda a: a, (mem, mem_ptr, mem_n)
            )

            gen_tokens, _, n_gen, (gen_preds, gen_pk, gen_cache_pos) = (
                _masked_append(
                    gen_tokens,
                    new_walk[None],
                    n_gen,
                    fresh_in_gen[None],
                    aux_bufs=(gen_preds, gen_pk, gen_cache_pos),
                    aux_rows=(reward[None], new_pk, cpos[None].astype(jnp.int32)),
                )
            )

            # Train when cost crosses a batch boundary and memory suffices.
            model_cost = costs[0]
            should_train = (
                (model_cost > 0)
                & (model_cost % B == 0)
                & (mem_n >= B)
            )
            key, k_train = jax.random.split(key)
            q_params = jax.lax.cond(
                should_train,
                lambda p: train_burst(p, mem, mem_n, k_train),
                lambda p: p,
                q_params,
            )

            return (
                new_walk,
                (gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen),
                cache,
                (mem, mem_ptr, mem_n),
                q_params,
                costs,
                key,
            )

        (
            walk,
            gen_state,
            cache,
            (mem, mem_ptr, mem_n),
            q_params,
            costs,
            key,
        ) = jax.lax.while_loop(
            step_cond,
            step_body,
            (
                walk,
                (gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen),
                cache,
                (mem, mem_ptr, mem_n),
                q_params,
                (model_cost, landscape_cost),
                key,
            ),
        )
        gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen = gen_state
        model_cost, landscape_cost = costs

        masked_preds = jnp.where(jnp.arange(gen_cap) < n_gen, gen_preds, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(masked_preds, B)
        valid = jnp.isfinite(top_vals)
        proposals = gen_tokens[top_idx]
        truth = jnp.where(valid, fitness_fn(fitness_params, proposals), -jnp.inf)
        landscape_cost = landscape_cost + jnp.sum(valid)

        measured_tokens, _, n_measured, (measured_truth,) = _masked_append(
            measured_tokens,
            proposals,
            n_measured,
            valid,
            aux_bufs=(measured_truth,),
            aux_rows=(truth,),
        )
        cache_vals = cache[2].at[gen_cache_pos[top_idx]].set(
            jnp.where(valid, truth, cache[2][gen_cache_pos[top_idx]]),
            mode="drop",
        )
        cache = (cache[0], cache[1], cache_vals, cache[3], cache[4])

        out = (proposals, top_vals, truth, valid, model_cost, landscape_cost)
        return (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
            mem,
            mem_ptr,
            mem_n,
            q_params,
            walk,
            model_cost,
            landscape_cost,
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
        (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
        mem,
        mem_ptr,
        mem_n,
        q_params,
        start_tokens,
        jnp.int32(0),
        jnp.int32(1),
        surr0,
        key,
    )
    _, outs = jax.lax.scan(round_body, init, None, length=R)
    return RunResult(*outs, start_truth=start_truth)


class DeviceDQNNAM:
    """(df, metadata) wrapper over `run_dqn_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        memory_size: int = 4096,
        train_epochs: int = 20,
        gamma: float = 0.9,
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        seed: int = 0,
    ):
        """Create the fused DQN runner for `landscape`.

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
        self.memory_size = memory_size
        self.train_epochs = train_epochs
        self.gamma = gamma
        self.seed = seed
        self.name = "DeviceDQN_Explorer"
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
        """Execute the fused DQN experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_dqn_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            self.memory_size,
            self.train_epochs,
            jnp.float32(self.gamma),
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
                f"device DQN run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
