"""Fully-jitted CMAES + NoisyAbstractModel runs: ask/tell on device.

Fuses the host CMAES explorer (baselines/explorers/cmaes.py, cited against
the reference there) with the NAM surrogate into one device program per
experiment: every generation's sampling (ask), argmax decoding, memoized
scoring, and covariance update (tell) runs inside a single
`lax.scan`-over-rounds / `while_loop`-over-generations program.

Semantics per round (host explorer parity):
  * x0 = one-hot of the best measured sequence; fresh CMA state per round;
  * each generation asks `population_size` solutions, decodes by argmax,
    scores them — repeats of this round's decodes or of measured sequences
    are free cache hits; novel decodes pay one model query (NAM semantics,
    or perfect-model mode);
  * `tell` minimizes by default (the reference quirk) or maximizes with
    `maximize=True`;
  * the round proposes the top `sequences_batch_size` of everything
    generated (seeded with the best measured sequence).
"""
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.ops import cmaes as cma_ops
from flexs_tpu.ops import packed_hamming
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime import surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import RunResult, device_run_args, fetch_run_result, _dists_to_cache, _masked_append


@partial(
    jax.jit,
    static_argnames=("cfg", "fitness_fn", "population_size", "max_iter", "maximize"),
)
def run_cmaes_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    population_size: int,
    max_iter: int,
    initial_variance,
    maximize: bool,
):
    """Run a full CMAES + NAM experiment on device."""
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    P = population_size
    dim = L * A
    ss = jnp.asarray(signal_strength, jnp.float32)
    sigma0 = jnp.sqrt(jnp.asarray(initial_variance, jnp.float32))

    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (budget + 2 * P) + 1
    gen_cap = budget + 2 * P + 2

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
        """Identical model semantics to jit_runner (see there for citations).

        Surrogate mode: every row is a fresh forward through the carried
        net (retrained between rounds); the cache still tracks seen
        sequences so the generated-pool memoization stays exact.
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
        # buffer before proposing (reference explorer.py:157-160).
        if cfg.surrogate is not None:
            key, k_fit = jax.random.split(key)
            surr_state = surrogate_lib.train(
                cfg.surrogate, A, surr_state,
                measured_tokens, measured_truth, n_measured, k_fit,
            )

        # x0 = one-hot of the best measured sequence; seed the generated
        # pool with it (reference cmaes.py:80-92).
        best_idx = jnp.argmax(measured_truth)
        top_tokens = measured_tokens[best_idx]
        top_val = measured_truth[best_idx]
        x0 = jax.nn.one_hot(top_tokens, A, dtype=jnp.float32).reshape(dim)
        es = cma_ops.init(x0, 1.0)
        es = es._replace(sigma=sigma0)

        gen_tokens = jnp.zeros((gen_cap, L), jnp.int32).at[0].set(top_tokens)
        gen_preds = jnp.full((gen_cap,), -jnp.inf, jnp.float32).at[0].set(top_val)
        gen_pk = jnp.zeros((gen_cap, words), jnp.uint32).at[0].set(
            pack(top_tokens[None])[0]
        )
        gen_cache_pos = jnp.zeros((gen_cap,), jnp.int32)
        n_gen = jnp.int32(1)

        meas_pk = pack(measured_tokens)

        def gen_cond(state):
            _, _, _, costs, _, it = state
            model_cost, _ = costs
            return (model_cost - round_start_cost + P <= budget) & (it < max_iter)

        def gen_body(state):
            es, gen_state, cache, costs, key, it = state
            gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen = gen_state

            key, k_ask, k_nam = jax.random.split(key, 3)
            solutions = cma_ops.ask(es, k_ask, P)
            tokens = jnp.argmax(solutions.reshape(P, L, A), axis=2).astype(jnp.int32)
            pk = pack(tokens)

            # Free cache hits: this round's decodes, then measured truths.
            gen_d = packed_hamming.packed_hamming_matrix(pk, gen_pk, bits, per_word)
            gen_d = jnp.where(
                (jnp.arange(gen_cap) < n_gen)[None, :], gen_d, jnp.int32(10**6)
            )
            in_gen = jnp.min(gen_d, axis=1) == 0
            gen_vals = gen_preds[jnp.argmin(gen_d, axis=1)]

            meas_d = packed_hamming.packed_hamming_matrix(
                pk, meas_pk, bits, per_word
            )
            meas_d = jnp.where(
                (jnp.arange(measured_cap) < n_measured)[None, :],
                meas_d,
                jnp.int32(10**6),
            )
            in_meas = jnp.min(meas_d, axis=1) == 0
            meas_vals = measured_truth[jnp.argmin(meas_d, axis=1)]

            # Within-batch duplicates: only the first occurrence pays.
            eq_self = jnp.all(pk[:, None, :] == pk[None, :, :], axis=-1)
            dup_earlier = jnp.any(jnp.tril(eq_self, k=-1), axis=1)

            # Host parity: within-generation duplicates each pay a query;
            # only the generated-pool recording is deduplicated.
            pay = ~in_gen & ~in_meas
            cache, costs, nam_vals, pos = nam_query(
                cache, costs, tokens, pay, k_nam, surr=surr_state
            )

            fitnesses = jnp.where(
                in_gen, gen_vals, jnp.where(in_meas, meas_vals, nam_vals)
            )

            # Record novel decodes (first occurrences) in the generated pool.
            record = ~in_gen & ~dup_earlier
            gen_tokens, _, n_gen, (gen_preds, gen_pk, gen_cache_pos) = (
                _masked_append(
                    gen_tokens,
                    tokens,
                    n_gen,
                    record,
                    aux_bufs=(gen_preds, gen_pk, gen_cache_pos),
                    aux_rows=(fitnesses, pk, pos.astype(jnp.int32)),
                )
            )

            tell_vals = -fitnesses if maximize else fitnesses
            es = cma_ops.tell(es, solutions, tell_vals, P)
            return (
                es,
                (gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen),
                cache,
                costs,
                key,
                it + 1,
            )

        (es, gen_state, cache, costs, key, _) = jax.lax.while_loop(
            gen_cond,
            gen_body,
            (
                es,
                (gen_tokens, gen_preds, gen_pk, gen_cache_pos, n_gen),
                cache,
                (model_cost, landscape_cost),
                key,
                jnp.int32(0),
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


class DeviceCMAESNAM:
    """(df, metadata) wrapper over `run_cmaes_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        population_size: int = 15,
        max_iter: int = 400,
        initial_variance: float = 0.2,
        signal_strength: float = 0.9,
        maximize: bool = False,
        model: str = "nam",
        surrogate_spec: Optional[surrogate_lib.SurrogateSpec] = None,
        seed: int = 0,
    ):
        """Create the fused CMAES runner for `landscape`.

        `model="surrogate"` carries an empirical Flax net (default = the
        paper's 3x-CNN ensemble used for the TF-Bind CMAES runs,
        `Ens(CNN_hidden_size_100_num_filters_32|...)`) retrained on the
        measured set every round inside the device program.
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec(ensemble_size=3)
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.signal_strength = 1.0 if model != "nam" else signal_strength
        self.population_size = population_size
        self.max_iter = max_iter
        self.initial_variance = initial_variance
        self.maximize = maximize
        self.seed = seed
        self.name = f"DeviceCMAES_popsize{population_size}"
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
        """Execute the fused CMAES experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_cmaes_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            self.population_size,
            self.max_iter,
            jnp.float32(self.initial_variance),
            self.maximize,
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
                f"device CMAES run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
