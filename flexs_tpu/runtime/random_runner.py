"""Fully-jitted Random-explorer + NoisyAbstractModel runs.

Fuses the host Random explorer (baselines/explorers/random.py, cited
against the reference there) with the NAM surrogate: each round mutates
randomly chosen measured sequences at rate mu/L until
`model_queries_per_batch` novel sequences are scored, then proposes the
top `sequences_batch_size` by model score (elitist mode).  One device
program per experiment, same cache/cost machinery as the other fused
runners.
"""
import time
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.ops import packed_hamming
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime import surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import RunResult, device_run_args, fetch_run_result, _dists_to_cache, _masked_append


@partial(jax.jit, static_argnames=("cfg", "fitness_fn", "batch", "mu", "elitist"))
def run_random_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    batch: int = 64,
    mu: float = 1.0,
    elitist: bool = True,
):
    """Run a full Random-explorer + NAM experiment on device.

    `elitist=True` proposes the top `sequences_batch_size` of the
    generated pool by model score; `elitist=False` proposes a uniform
    random sample drawn WITH replacement (the reference Random's default,
    random.py:83-88 — duplicates are possible and each is measured).
    """
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    ss = jnp.asarray(signal_strength, jnp.float32)
    mu_per_res = mu / L

    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (budget + batch) + 1
    gen_cap = budget + batch + 1

    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

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

    def nam_query(cache, costs, tokens, mask, key, surr=None):
        """NAM semantics identical to jit_runner (see there for citations).

        Surrogate mode: every row is a fresh forward through the carried
        net (it retrains between rounds, so stale cached predictions must
        never be served); the cache still tracks seen sequences for
        novelty rejection, and no landscape cost accrues.
        """
        cache_tokens, cache_pk, cache_vals, cache_truth, n_cache = cache
        model_cost, landscape_cost = costs

        pk = pack(tokens)
        dists = _dists_to_cache(pk, cache_pk, n_cache, bits, per_word)
        min_dist = jnp.min(dists, axis=1)
        nearest = jnp.argmin(dists, axis=1)
        cached = min_dist == 0

        if cfg.surrogate is not None:
            signal = surrogate_lib.predict(cfg.surrogate, A, surr, tokens)
            values = signal
        elif cfg.perfect_model:
            signal = fitness_fn(fitness_params, tokens)
            values = jnp.where(cached, cache_vals[nearest], signal)
        else:
            signal = fitness_fn(fitness_params, tokens)
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

        insert = mask & ~cached
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
        model_cost = model_cost + jnp.sum(mask)
        if not cfg.perfect_model and cfg.surrogate is None:
            landscape_cost = landscape_cost + 2 * jnp.sum(insert)
        return (
            (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
            (model_cost, landscape_cost),
            values,
            pos,
        )

    def round_body(carry, _):
        (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
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
        gen_cache_pos = jnp.zeros((gen_cap,), jnp.int32)
        n_gen = jnp.int32(0)

        def gen_cond(state):
            _, cache, costs, key = state
            return costs[0] - round_start_cost + batch <= budget

        def gen_body(state):
            gen_state, cache, costs, key = state
            gen_tokens, gen_preds, gen_cache_pos, n_gen = gen_state

            key, k_pick, k_mask, k_res, k_nam = jax.random.split(key, 5)
            # Parents: uniform random measured sequences (reference
            # random.py:63-78 uniform mode).
            parent_idx = jax.random.randint(
                k_pick, (batch,), 0, jnp.maximum(n_measured, 1)
            )
            parents = measured_tokens[parent_idx]
            mut_mask = jax.random.uniform(k_mask, parents.shape) < mu_per_res
            rand = jax.random.randint(k_res, parents.shape, 0, A)
            children = jnp.where(mut_mask, rand, parents)

            # Novelty: vs measured + generated (both live in the NAM cache
            # for NAM runs; use the cache directly) and within-batch.
            child_pk = pack(children)
            cache_pk_buf, n_cache_now = cache[1], cache[4]
            novel = (
                jnp.min(
                    _dists_to_cache(
                        child_pk, cache_pk_buf, n_cache_now, bits, per_word
                    ),
                    axis=1,
                )
                > 0
            )
            eq_self = jnp.all(
                child_pk[:, None, :] == child_pk[None, :, :], axis=-1
            )
            dup = jnp.any(jnp.tril(eq_self, k=-1) & novel[None, :], axis=1)
            keep = novel & ~dup

            cache, costs, vals, pos = nam_query(
                cache, costs, children, keep, k_nam, surr_state
            )
            gen_tokens, _, n_gen, (gen_preds, gen_cache_pos) = _masked_append(
                gen_tokens,
                children,
                n_gen,
                keep,
                aux_bufs=(gen_preds, gen_cache_pos),
                aux_rows=(vals, pos.astype(jnp.int32)),
            )
            return (
                (gen_tokens, gen_preds, gen_cache_pos, n_gen),
                cache,
                costs,
                key,
            )

        (gen_state, cache, costs, key) = jax.lax.while_loop(
            gen_cond,
            gen_body,
            (
                (gen_tokens, gen_preds, gen_cache_pos, n_gen),
                cache,
                (model_cost, landscape_cost),
                key,
            ),
        )
        gen_tokens, gen_preds, gen_cache_pos, n_gen = gen_state
        model_cost, landscape_cost = costs

        in_pool = jnp.arange(gen_cap) < n_gen
        if elitist:
            rank_by = jnp.where(in_pool, gen_preds, -jnp.inf)
            _, top_idx = jax.lax.top_k(rank_by, B)
        else:
            key, k_sub = jax.random.split(key)
            # Uniform sample WITH replacement (reference random.py:87 uses
            # rng.integers over the novel pool, so duplicate proposals are
            # possible and each is measured); pool rows 0..n_gen-1 are
            # contiguous by construction.
            top_idx = jax.random.randint(
                k_sub, (B,), 0, jnp.maximum(n_gen, 1)
            )
        top_vals = jnp.where(
            in_pool[top_idx], gen_preds[top_idx], -jnp.inf
        )
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
        jnp.int32(0),
        jnp.int32(1),
        surr0,
        key,
    )
    _, outs = jax.lax.scan(round_body, init, None, length=R)
    return RunResult(*outs, start_truth=start_truth)


class DeviceRandomNAM:
    """(df, metadata) wrapper over `run_random_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        mu: float = 1.0,
        batch: int = 64,
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        elitist: bool = True,
        seed: int = 0,
    ):
        """Create the fused Random runner for `landscape`.

        `model="surrogate"` carries an in-program trained empirical net
        (default = the paper's CNN) that scores the generated pool.
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec()
        self.elitist = elitist
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.signal_strength = (
            1.0 if model in ("perfect", "surrogate") else signal_strength
        )
        self.mu = mu
        self.batch = batch
        self.seed = seed
        self.name = f"DeviceRandom_mu={mu}"
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
        """Execute the fused Random experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_random_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            self.batch,
            self.mu,
            self.elitist,
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
                f"device Random run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
