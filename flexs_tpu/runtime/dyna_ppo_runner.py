"""Fully-jitted constructive DyNA-PPO + NoisyAbstractModel runs.

The host DynaPPO explorer (baselines/explorers/dyna_ppo.py, cited against
the reference there) interleaves batched environment steps, density
lookups, surrogate scoring, and PPO training through Python.  This runner
fuses the whole experiment into one device program with ENTIRELY STATIC
control flow: constructive episodes have a fixed length L and every phase
spends its budget in `ceil(budget / env_batch)` whole batches, so the run
is nested `lax.scan`s — no while_loops at all.

Structure per round (reference dyna_ppo.py:250-307):
  * experiment phase: `ceil(sequences_batch_size / E)` lockstep episode
    batches scored on the TRUE landscape; ONE PPO training call on the
    phase trajectory; recorded sequences cleared (they never become
    proposals);
  * `num_model_rounds` model phases, each spending
    `ceil((model_queries_per_batch / num_model_rounds) / E)` batches
    scored on the surrogate; PPO trains after each phase; sequences
    recorded (deduplicated, last fitness wins);
  * reward = fitness - 0.1 * density, density = sum of fitness/d over all
    previously seen sequences within distance 2 (the env's
    sequence-density cache, environments/dyna_ppo.py:33-67).  Two
    documented deviations: (a) the density radius here is HAMMING, not
    the exact Levenshtein the reference's `editdistance.eval` computes
    and the host env now matches (ops.hamming.banded_edit_distance_matrix)
    — for the equal-length sequences every FLEXS problem generates they
    differ only when a pair is a block-shift-by-one (one del + one ins),
    and keeping the density on the packed XOR+popcount path is what lets
    the in-program cache scale (an exact banded DP costs ~20x per lookup
    and this runner's measured quality is already at 1.000/1.000,
    BASELINE.md).  Measured disagreement rate of the two metrics inside
    the radius (scripts/measure_density_deviation.py, 131k pairs per
    pool): 0 on every protein pool and every L=100 walk; worst case
    9e-4 per pair on L=14 repetitive constructive batches.  Callers who
    want full reference parity anyway can pass density_metric="edit"
    (exact banded Levenshtein inside the program, at the documented
    per-lookup cost);
    (b) densities are computed BEFORE the batch joins the
    cache — the reference updates all_seqs first (environments/
    dyna_ppo.py:142-163 upstream), so same-batch neighbors penalize each
    other there and not here (shared with the host port);
  * proposals: top `sequences_batch_size` recorded model-phase sequences
    by recorded fitness, novel vs measured.

Surrogate: the NoisyAbstractModel / perfect-model pair used across the
fused family (documented deviation — the host DynaPPO keeps the full
11-member r^2-gated ensemble; this runner exists so DynaPPO-style
experiment/model phase scheduling can enter sweeps at device speed).

PPO training matches rl/ppo.py semantics exactly: GAE(0.99, 0.95) per
episode lane, advantage normalization, running observation Welford
normalization updated per training call, 10 FULL-BATCH Adam(3e-4) epochs
— the full-batch gradient is accumulated over fixed-size row chunks so
the [steps, L*(A+1)] one-hot observation matrix never materializes.
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
from flexs_tpu.ops.hamming import banded_edit_distance_matrix
from flexs_tpu.rl.ppo import ActorCritic
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime.jit_runner import (
    RunResult,
    _dists_to_cache,
    _masked_append,
    device_run_args,
    fetch_run_result,
)

_LAM = 0.1  # density penalty (reference environments/dyna_ppo.py)


def _edit_density(tokens, den_tokens, den_fit, n_den):
    """Density over the cache via exact banded Levenshtein (<=2 radius).

    The reference semantics (environments/dyna_ppo.py:106-114): sum of
    fitness/d over cached sequences with 0 < editdistance <= 2.  Dead
    rows are masked explicitly — the trash row (_masked_append)
    accumulates dropped fitnesses, so distance alone can't gate.
    Shared by both fused DynaPPO runners' density_metric="edit" mode.
    """
    d = banded_edit_distance_matrix(tokens, den_tokens, band=2)
    live = jnp.arange(den_tokens.shape[0])[None, :] < n_den
    w = jnp.where(live & (d > 0) & (d <= 2), 1.0 / jnp.maximum(d, 1), 0.0)
    return w @ jnp.nan_to_num(den_fit)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "fitness_fn",
        "env_batch_size",
        "num_model_rounds",
        "train_epochs",
        "density_metric",
    ),
)
def run_dyna_ppo_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    env_batch_size: int = 16,
    num_model_rounds: int = 1,
    train_epochs: int = 10,
    learning_rate: float = 3e-4,
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    clip_eps: float = 0.2,
    value_coef: float = 0.5,
    entropy_coef: float = 0.01,
    density_metric: str = "hamming",
) -> RunResult:
    """Run a full constructive DynaPPO + NAM experiment on device.

    `density_metric` selects the distance inside the density reward's
    <=2 radius: "hamming" (default — the documented fast deviation, see
    the module docstring) or "edit", the reference's exact Levenshtein
    via a banded DP (ops.hamming.banded_edit_distance_matrix) for full
    parity with reference environments/dyna_ppo.py:106-114 at ~20x the
    per-lookup cost.
    """
    if density_metric not in ("hamming", "edit"):
        raise ValueError("density_metric must be 'hamming' or 'edit'")
    use_edit = density_metric == "edit"
    if cfg.surrogate is not None:
        raise ValueError(
            "DynaPPO trains its own internal model ensemble (the r^2-gated "
            "member pool IS the trained surrogate, reference "
            "dyna_ppo.py:57-109); model='surrogate' does not apply. Use "
            "model='nam' or 'perfect'."
        )
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    E = env_batch_size
    obs_dim = L * (A + 1)
    ss = jnp.asarray(signal_strength, jnp.float32)

    n_exp = -(-B // E)
    phase_budget = budget // num_model_rounds
    n_model = -(-phase_budget // E)

    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (num_model_rounds * n_model * E + B) + 1
    den_cap = R * (n_exp + num_model_rounds * n_model) * E + 1
    gen_cap = max(num_model_rounds * n_model * E, B) + 1

    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

    net = ActorCritic(A, (128,))
    tx = optax.adam(learning_rate)

    def build_obs(tokens, t):
        """Constructive observation: residues < t one-hot, >= t masked."""
        pos = jnp.arange(L)
        vis = jnp.where(pos[None, :] < t, tokens, A)  # A = mask column
        return jax.nn.one_hot(vis, A + 1, dtype=jnp.float32).reshape(
            tokens.shape[0], obs_dim
        )

    def normalize(obs_stats, obs):
        count, mean, m2 = obs_stats
        var = m2 / jnp.maximum(count, 1.0)
        return (obs - mean) / jnp.sqrt(var + 1e-8)

    def welford_merge(obs_stats, obs):
        count, mean, m2 = obs_stats
        n_b = obs.shape[0]
        mean_b = jnp.mean(obs, axis=0)
        m2_b = jnp.sum(jnp.square(obs - mean_b), axis=0)
        delta = mean_b - mean
        tot = count + n_b
        new_mean = mean + delta * n_b / tot
        new_m2 = m2 + m2_b + jnp.square(delta) * count * n_b / tot
        return (tot, new_mean, new_m2)

    # --- NAM query (batched; jit_runner semantics) ---------------------------
    def nam_query(cache, costs, tokens, key):
        cache_tokens, cache_pk, cache_vals, cache_truth, n_cache = cache
        model_cost, landscape_cost = costs

        pk = pack(tokens)
        dists = _dists_to_cache(pk, cache_pk, n_cache, bits, per_word)
        min_dist = jnp.min(dists, axis=1)
        nearest = jnp.argmin(dists, axis=1)
        cached = min_dist == 0

        # Within-batch first-occurrence dedup (same scheme as the BO/CbAS
        # runners): identical sequences in one episode batch share ONE
        # noise draw and insert ONE cache row, matching host NAM
        # semantics where the second query is a cache hit.
        eq_self = jnp.all(pk[:, None, :] == pk[None, :, :], axis=-1)
        first_idx = jnp.argmax(eq_self, axis=1)
        dup_earlier = first_idx < jnp.arange(tokens.shape[0])

        signal = fitness_fn(fitness_params, tokens)
        if cfg.perfect_model:
            values = jnp.where(cached, cache_vals[nearest], signal)
        else:
            key, k_exp, k_choice = jax.random.split(key, 3)
            expo = jax.random.exponential(k_exp, (tokens.shape[0],))
            rand_idx = jax.random.randint(
                k_choice, (tokens.shape[0],), 0, jnp.maximum(n_cache, 1)
            )
            neighbor_truth = cache_truth[nearest]
            noise = jnp.where(
                neighbor_truth >= 0, expo * neighbor_truth, cache_vals[rand_idx]
            )
            alpha = jnp.power(ss, min_dist)
            values = jnp.where(
                cached, cache_vals[nearest], alpha * signal + (1 - alpha) * noise
            )

        values = jnp.where(dup_earlier, values[first_idx], values)

        insert = ~cached & ~dup_earlier
        cache_tokens, pos, n_cache, (cache_pk, cache_vals, cache_truth) = (
            _masked_append(
                cache_tokens,
                tokens,
                n_cache,
                insert,
                aux_bufs=(cache_pk, cache_vals, cache_truth),
                aux_rows=(pk, values, signal),
            )
        )
        pos = jnp.where(cached, nearest, pos)
        pos = jnp.where(dup_earlier, pos[first_idx], pos)
        model_cost = model_cost + tokens.shape[0]
        if not cfg.perfect_model:
            landscape_cost = landscape_cost + 2 * jnp.sum(insert)
        return (
            (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
            (model_cost, landscape_cost),
            values,
            pos,
        )

    def upsert(buf_pk, buf_fit, n_buf, pk, fit):
        """Dict-style insert: update fitness if present, else append.

        In-batch duplicates collapse to their first occurrence (host dict
        keeps the last of identical values — same sequence scores the
        same, so the recorded fitness is identical).
        """
        d = _dists_to_cache(pk, buf_pk, n_buf, bits, per_word)
        exists = jnp.min(d, axis=1) == 0
        at = jnp.argmin(d, axis=1)
        buf_fit = buf_fit.at[jnp.where(exists, at, buf_pk.shape[0] - 1)].set(
            jnp.where(exists, fit, buf_fit[-1]), mode="drop"
        )
        eq = jnp.all(pk[:, None, :] == pk[None, :, :], axis=-1)
        dup = jnp.any(
            eq & jnp.tril(jnp.ones_like(eq, dtype=bool), k=-1), axis=1
        )
        insert = ~exists & ~dup
        buf_pk, pos, n_buf, (buf_fit,) = _masked_append(
            buf_pk, pk, n_buf, insert, aux_bufs=(buf_fit,), aux_rows=(fit,)
        )
        pos = jnp.where(exists, at, pos)
        return buf_pk, buf_fit, n_buf, pos, insert

    # --- episode batch --------------------------------------------------------
    def episode_batch(policy, obs_stats, key):
        """One lockstep batch of E constructive episodes.

        Returns (tokens [E, L], actions/logps/values [L, E], key).
        """

        def step_t(carry, t):
            tokens, key = carry
            obs = build_obs(tokens, t)
            logits, value = net.apply(policy, normalize(obs_stats, obs))
            key, k_act = jax.random.split(key)
            action = jax.random.categorical(k_act, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(E), action]
            tokens = tokens.at[:, t].set(action)
            return (tokens, key), (action, logp, value)

        (tokens, key), (actions, logps, values) = jax.lax.scan(
            step_t, (jnp.zeros((E, L), jnp.int32), key), jnp.arange(L)
        )
        return tokens, actions, logps, values, key

    def density_of(den, tokens, pk):
        if use_edit:
            _, den_fit, n_den, den_tokens = den
            return _edit_density(tokens, den_tokens, den_fit, n_den)
        den_pk, den_fit, n_den = den
        d = _dists_to_cache(pk, den_pk, n_den, bits, per_word)
        w = jnp.where((d > 0) & (d <= 2), 1.0 / jnp.maximum(d, 1.0), 0.0)
        return w @ jnp.nan_to_num(den_fit)

    def den_update(den, pk, tokens, fitness):
        """all_seqs[seq] = fitness (exact-match upsert is metric-free)."""
        if use_edit:
            den_pk, den_fit, n_den, den_tokens = den
            den_pk, den_fit, n_den, pos, _ = upsert(
                den_pk, den_fit, n_den, pk, fitness
            )
            # pos routes existing rows to their slot (identical tokens,
            # idempotent) and dropped duplicates to the trash row.
            den_tokens = den_tokens.at[pos].set(tokens, mode="drop")
            return (den_pk, den_fit, n_den, den_tokens)
        den_pk, den_fit, n_den = den
        den_pk, den_fit, n_den, _, _ = upsert(den_pk, den_fit, n_den, pk, fitness)
        return (den_pk, den_fit, n_den)

    # --- PPO training (full-batch via chunked grad accumulation) -------------
    def ppo_train(policy, opt_state, obs_stats, ep_tokens, actions, logps,
                  values, rewards):
        """ep_tokens [N, L]; actions/logps/values [N, L]; rewards [N]."""
        n_lanes = ep_tokens.shape[0]
        total = n_lanes * L

        # GAE per lane: rewards are 0 except the terminal step.
        def lane_gae(vals, reward):
            def bstep(carry, x):
                last_adv, next_value, is_last = carry
                v = x
                r = jnp.where(is_last, reward, 0.0)
                nonterm = jnp.where(is_last, 0.0, 1.0)
                delta = r + gamma * next_value * nonterm - v
                last_adv = delta + gamma * gae_lambda * nonterm * last_adv
                return (last_adv, v, False), last_adv

            (_, _, _), adv = jax.lax.scan(
                bstep, (jnp.float32(0.0), jnp.float32(0.0), True), vals,
                reverse=True,
            )
            return adv

        adv = jax.vmap(lane_gae)(values, rewards)  # [N, L]
        returns = adv + values
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        # Flat row order: lane-major (host stacks [T, E] on axis 1 and
        # concatenates lanes — each lane's L steps contiguous).
        lane_idx = jnp.repeat(jnp.arange(n_lanes), L)
        t_idx = jnp.tile(jnp.arange(L), n_lanes)
        flat_actions = actions.reshape(-1)
        flat_logps = logps.reshape(-1)
        flat_adv = adv.reshape(-1)
        flat_ret = returns.reshape(-1)

        chunk = min(2048, total)
        n_chunks = -(-total // chunk)
        padded = n_chunks * chunk
        pad = padded - total

        def pad_to(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad,), fill, x.dtype)]
            ).reshape(n_chunks, chunk)

        c_lane = pad_to(lane_idx)
        c_t = pad_to(t_idx)
        c_act = pad_to(flat_actions)
        c_logp = pad_to(flat_logps)
        c_adv = pad_to(flat_adv)
        c_ret = pad_to(flat_ret)
        c_w = pad_to(jnp.ones((total,), jnp.float32)) / total

        def chunk_obs(lane, t):
            toks = ep_tokens[lane]  # [chunk, L]
            pos = jnp.arange(L)
            vis = jnp.where(pos[None, :] < t[:, None], toks, A)
            return jax.nn.one_hot(vis, A + 1, dtype=jnp.float32).reshape(
                chunk, obs_dim
            )

        # Pass 1: update the running observation stats (host order: stats
        # absorb the batch before normalization — rl/ppo.py:188).
        def stats_step(stats, xs):
            lane, t, w = xs
            obs = chunk_obs(lane, t)
            # Only real rows: padding rows carry w == 0.
            count, mean, m2 = stats
            wm = (w > 0).astype(jnp.float32)[:, None]
            n_b = jnp.sum(wm)
            mean_b = jnp.sum(obs * wm, axis=0) / jnp.maximum(n_b, 1)
            m2_b = jnp.sum(jnp.square(obs - mean_b) * wm, axis=0)
            delta = mean_b - mean
            tot = count + n_b
            mean = mean + delta * n_b / tot
            m2 = m2 + m2_b + jnp.square(delta) * count * n_b / tot
            return (tot, mean, m2), None

        obs_stats, _ = jax.lax.scan(
            stats_step, obs_stats, (c_lane, c_t, c_w)
        )

        def chunk_loss(p, lane, t, act, old_logp, advc, retc, w):
            obs = normalize(obs_stats, chunk_obs(lane, t))
            logits, vals = net.apply(p, obs)
            logp_all = jax.nn.log_softmax(logits)
            logprob = logp_all[jnp.arange(chunk), act]
            ratio = jnp.exp(logprob - old_logp)
            clipped = jnp.clip(ratio, 1 - clip_eps, 1 + clip_eps)
            policy_loss = -jnp.sum(jnp.minimum(ratio * advc, clipped * advc) * w)
            value_loss = jnp.sum(jnp.square(vals - retc) * w)
            probs = jnp.exp(logp_all)
            entropy = -jnp.sum(jnp.sum(probs * logp_all, axis=1) * w)
            return policy_loss + value_coef * value_loss - entropy_coef * entropy

        def epoch(carry, _):
            policy, opt_state = carry

            def acc_step(g_acc, xs):
                lane, t, act, old_logp, advc, retc, w = xs
                g = jax.grad(chunk_loss)(
                    policy, lane, t, act, old_logp, advc, retc, w
                )
                return jax.tree.map(jnp.add, g_acc, g), None

            zeros = jax.tree.map(jnp.zeros_like, policy)
            grads, _ = jax.lax.scan(
                acc_step, zeros, (c_lane, c_t, c_act, c_logp, c_adv, c_ret, c_w)
            )
            updates, opt_state = tx.update(grads, opt_state, policy)
            return (optax.apply_updates(policy, updates), opt_state), None

        (policy, opt_state), _ = jax.lax.scan(
            epoch, (policy, opt_state), None, length=train_epochs
        )
        return policy, opt_state, obs_stats

    # --- phases ----------------------------------------------------------------
    def run_phase(state, n_batches: int, gt: bool, record: bool):
        """Collect `n_batches` episode batches, then one PPO train call."""
        (policy, opt_state, obs_stats, cache, costs, den, gen, key) = state

        def collect(carry, _):
            cache, costs, den, gen, key = carry
            key, k_ep = jax.random.split(key)
            tokens, actions, logps, values, key = episode_batch(
                policy, obs_stats, k_ep
            )
            pk = pack(tokens)

            if gt:
                fitness = fitness_fn(fitness_params, tokens)
                model_cost, landscape_cost = costs
                costs = (model_cost, landscape_cost + E)
            else:
                key, k_nam = jax.random.split(key)
                cache, costs, fitness, _ = nam_query(cache, costs, tokens, key=k_nam)

            density = density_of(den, tokens, pk)
            den = den_update(den, pk, tokens, fitness)
            rewards = fitness - _LAM * density

            if record:
                gen_pk, gen_fit, n_gen, gen_tokens = gen
                gen_pk, gen_fit, n_gen, pos, insert = upsert(
                    gen_pk, gen_fit, n_gen, pk, fitness
                )
                gen_tokens = gen_tokens.at[pos].set(tokens, mode="drop")
                gen = (gen_pk, gen_fit, n_gen, gen_tokens)

            out = (tokens, actions, logps, values, rewards)
            return (cache, costs, den, gen, key), out

        (cache, costs, den, gen, key), traj = jax.lax.scan(
            collect, (cache, costs, den, gen, key), None, length=n_batches
        )
        tokens_b, actions_b, logps_b, values_b, rewards_b = traj
        # [n, E, L] / [n, L, E] -> lane-major flats.
        ep_tokens = tokens_b.reshape(n_batches * E, L)
        actions = jnp.swapaxes(actions_b, 1, 2).reshape(n_batches * E, L)
        logps = jnp.swapaxes(logps_b, 1, 2).reshape(n_batches * E, L)
        values = jnp.swapaxes(values_b, 1, 2).reshape(n_batches * E, L)
        rewards = rewards_b.reshape(n_batches * E)

        policy, opt_state, obs_stats = ppo_train(
            policy, opt_state, obs_stats, ep_tokens, actions, logps, values,
            rewards,
        )
        return (policy, opt_state, obs_stats, cache, costs, den, gen, key)

    # --- initial state ----------------------------------------------------------
    start_truth = fitness_fn(fitness_params, start_tokens[None])[0]

    measured_tokens = jnp.zeros((measured_cap, L), jnp.int32).at[0].set(start_tokens)
    measured_truth = (
        jnp.full((measured_cap,), -jnp.inf, jnp.float32).at[0].set(start_truth)
    )
    n_measured = jnp.int32(1)

    cache_tokens = jnp.zeros((cache_cap, L), jnp.int32).at[0].set(start_tokens)
    cache_pk0 = jnp.zeros((cache_cap, words), jnp.uint32).at[0].set(
        pack(start_tokens[None])[0]
    )
    cache_vals = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache_truth = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache = (cache_tokens, cache_pk0, cache_vals, cache_truth, jnp.int32(1))

    den = (
        jnp.zeros((den_cap, words), jnp.uint32),
        jnp.zeros((den_cap,), jnp.float32),
        jnp.int32(0),
    )
    if use_edit:
        den = den + (jnp.zeros((den_cap, L), jnp.int32),)

    key, init_key = jax.random.split(key)
    policy = net.init(init_key, jnp.zeros((1, obs_dim), jnp.float32))
    opt_state = tx.init(policy)
    obs_stats = (
        jnp.float32(1e-4),
        jnp.zeros((obs_dim,), jnp.float32),
        jnp.ones((obs_dim,), jnp.float32),
    )

    def round_body(carry, _):
        (
            measured_tokens,
            measured_truth,
            n_measured,
            policy,
            opt_state,
            obs_stats,
            cache,
            costs,
            den,
            key,
        ) = carry

        gen = (
            jnp.zeros((gen_cap, words), jnp.uint32),
            jnp.full((gen_cap,), -jnp.inf, jnp.float32),
            jnp.int32(0),
            jnp.zeros((gen_cap, L), jnp.int32),
        )

        state = (policy, opt_state, obs_stats, cache, costs, den, gen, key)
        # Experiment phase (true landscape; records cleared = not recorded).
        state = run_phase(state, n_exp, gt=True, record=False)
        # Model phases (surrogate; recorded for proposals).
        for _ph in range(num_model_rounds):
            state = run_phase(state, n_model, gt=False, record=True)
        (policy, opt_state, obs_stats, cache, costs, den, gen, key) = state
        gen_pk, gen_fit, n_gen, gen_tokens = gen

        # Top-B recorded novel sequences by surrogate fitness.
        meas_pk = pack(measured_tokens)
        d = packed_hamming.packed_hamming_matrix(gen_pk, meas_pk, bits, per_word)
        d = jnp.where(jnp.arange(measured_cap)[None, :] < n_measured, d, 10**6)
        novel = (jnp.min(d, axis=1) > 0) & (jnp.arange(gen_cap) < n_gen)
        masked_fit = jnp.where(novel, gen_fit, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(masked_fit, B)
        valid = jnp.isfinite(top_vals)
        proposals = gen_tokens[top_idx]
        truth = jnp.where(valid, fitness_fn(fitness_params, proposals), -jnp.inf)
        model_cost, landscape_cost = costs
        landscape_cost = landscape_cost + jnp.sum(valid)

        measured_tokens, _, n_measured, (measured_truth,) = _masked_append(
            measured_tokens, proposals, n_measured, valid,
            aux_bufs=(measured_truth,), aux_rows=(truth,),
        )

        # NAM train semantics: the next round's model must return TRUTH
        # for measured sequences (reference noisy_abstract_model.py:62-67;
        # the family invariant in jit_runner.py) — overwrite each
        # proposal's cache row.
        c_tokens, c_pk, c_vals, c_truth, c_n = cache
        pd_ = _dists_to_cache(pack(proposals), c_pk, c_n, bits, per_word)
        at = jnp.argmin(pd_, axis=1).astype(jnp.int32)
        hit = (jnp.min(pd_, axis=1) == 0) & valid
        c_vals = c_vals.at[jnp.where(hit, at, cache_cap - 1)].set(
            jnp.where(hit, truth, c_vals[cache_cap - 1])
        )
        cache = (c_tokens, c_pk, c_vals, c_truth, c_n)

        out = (proposals, top_vals, truth, valid, model_cost, landscape_cost)
        return (
            measured_tokens,
            measured_truth,
            n_measured,
            policy,
            opt_state,
            obs_stats,
            cache,
            (model_cost, landscape_cost),
            den,
            key,
        ), out

    init = (
        measured_tokens,
        measured_truth,
        n_measured,
        policy,
        opt_state,
        obs_stats,
        cache,
        (jnp.int32(0), jnp.int32(1)),
        den,
        key,
    )
    _, outs = jax.lax.scan(round_body, init, None, length=R)
    return RunResult(*outs, start_truth=start_truth)


class DeviceDynaPPONAM:
    """(df, metadata) wrapper over `run_dyna_ppo_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        env_batch_size: int = 16,
        num_model_rounds: int = 1,
        train_epochs: int = 10,
        signal_strength: float = 0.9,
        model: str = "nam",
        seed: int = 0,
        density_metric: str = "hamming",
    ):
        """Create the fused constructive DynaPPO runner for `landscape`.

        `density_metric`: "hamming" (default fast radius) or "edit"
        (exact reference Levenshtein; see `run_dyna_ppo_nam`).
        """
        if model not in ("nam", "perfect"):
            raise ValueError("model must be 'nam' or 'perfect'")
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.signal_strength = 1.0 if model == "perfect" else signal_strength
        self.env_batch_size = env_batch_size
        self.num_model_rounds = num_model_rounds
        self.train_epochs = train_epochs
        self.density_metric = density_metric
        self.seed = seed
        self.name = f"DeviceDynaPPO_Agent_10_{num_model_rounds}"
        self.model_name = (
            f"LandscapeAsModel={landscape.name}"
            if model == "perfect"
            else f"NAMb_ss{signal_strength}"
        )
        self.cfg = jit_runner.AdaleadConfig(
            rounds=rounds,
            sequences_batch_size=sequences_batch_size,
            model_queries_per_batch=model_queries_per_batch,
            alphabet_size=len(self.alphabet),
            perfect_model=(model == "perfect"),
        )
        self._fitness_fn, self._fitness_params = landscape.device_fitness()

    def run(self, verbose: bool = True) -> Tuple[pd.DataFrame, dict]:
        """Execute the fused DynaPPO experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_dyna_ppo_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            env_batch_size=self.env_batch_size,
            num_model_rounds=self.num_model_rounds,
            train_epochs=self.train_epochs,
            density_metric=self.density_metric,
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
                f"device DynaPPO run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
