"""Fully-jitted GeneticAlgorithm + NoisyAbstractModel runs.

Fuses the host GeneticAlgorithm explorer (baselines/explorers/
genetic_algorithm.py, itself cited against the reference) with the
NoisyAbstractModel into one device program per experiment, the same way
flexs_tpu.runtime.jit_runner fuses Adalead:

  * initial population drawn from measured data by "top-proportion"
    (uniform over the top K scorers) or "wright-fisher" (softmax(score /
    beta) multinomial) selection;
  * each generation mutates selected parents at rate 1/L, filters against
    the measured/generated sets (packed-Hamming novelty), scores novel
    children through the NAM, and replaces the worst population members;
  * loops while model-cost delta + population_size < budget (reference
    genetic_algorithm.py:115-119);
  * proposes the top `sequences_batch_size` generated sequences.

Shares the NAM cache machinery with the Adalead runner; randomness is
jax.random (distributional parity, as documented there).
"""
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.ops import packed_hamming
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime import surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import RunResult, device_run_args, fetch_run_result, _dists_to_cache, _masked_append


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "fitness_fn",
        "population_size",
        "parent_selection_strategy",
        "children_proportion",
        "parent_selection_proportion",
    ),
)
def run_ga_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    population_size: int,
    parent_selection_strategy: str,
    children_proportion: float,
    parent_selection_proportion: Optional[float],
    beta,
):
    """Run a full GeneticAlgorithm + NAM experiment on device."""
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    P = population_size
    ss = jnp.asarray(signal_strength, jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)
    n_children = max(1, int(children_proportion * P))

    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (budget + P + n_children) + 1
    gen_cap = budget + P + n_children + 1

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
        cache_tokens, cache_pk, cache_vals, cache_truth, n_cache = cache
        model_cost, landscape_cost = costs

        pk = pack(tokens)
        dists = _dists_to_cache(pk, cache_pk, n_cache, bits, per_word)
        min_dist = jnp.min(dists, axis=1)
        nearest = jnp.argmin(dists, axis=1)
        cached = min_dist == 0

        if cfg.surrogate is not None:
            # Fresh forward through the carried net for every row (it
            # retrains between rounds; see jit_runner.nam_query).
            signal = surrogate_lib.predict(cfg.surrogate, A, surr, tokens)
            values = signal
        elif cfg.perfect_model:
            signal = fitness_fn(fitness_params, tokens)
            values = jnp.where(cached, cache_vals[nearest], signal)
        else:
            signal = fitness_fn(fitness_params, tokens)
            neighbor_truth = cache_truth[nearest]
            key, k_exp, k_choice = jax.random.split(key, 3)
            expo = jax.random.exponential(k_exp, (tokens.shape[0],))
            rand_idx = jax.random.randint(
                k_choice, (tokens.shape[0],), 0, jnp.maximum(n_cache, 1)
            )
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

    def choose_parents(scores, valid, count, key):
        """Parent indices by the configured selection strategy."""
        if parent_selection_strategy == "top-proportion":
            k = max(1, int(parent_selection_proportion * P))
            order = jnp.argsort(jnp.where(valid, scores, -jnp.inf))[::-1]
            pool = order[:k]
            picks = jax.random.randint(key, (count,), 0, k)
            return pool[picks]
        # wright-fisher
        logits = jnp.where(valid, scores / beta, -jnp.inf)
        return jax.random.categorical(key, logits, shape=(count,))

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

        # Initial population from measured data.
        key, k_init = jax.random.split(key)
        valid_measured = jnp.arange(measured_cap) < n_measured
        init_idx = choose_parents(measured_truth, valid_measured, P, k_init)
        pop_tokens = measured_tokens[init_idx]
        pop_scores = measured_truth[init_idx]

        gen_tokens = jnp.zeros((gen_cap, L), jnp.int32)
        gen_preds = jnp.full((gen_cap,), -jnp.inf, jnp.float32)
        gen_cache_pos = jnp.zeros((gen_cap,), jnp.int32)
        n_gen = jnp.int32(0)

        def gen_cond(state):
            _, _, _, costs, _ = state
            return costs[0] - round_start_cost + P < budget

        def gen_body(state):
            pop, gen_state, cache, costs, key = state
            pop_tokens, pop_scores = pop
            gen_tokens, gen_preds, gen_cache_pos, n_gen = gen_state

            key, k_sel, k_mask, k_res, k_nam = jax.random.split(key, 5)
            parent_idx = choose_parents(
                pop_scores, jnp.ones(P, bool), n_children, k_sel
            )
            parents = pop_tokens[parent_idx]

            mut_mask = jax.random.uniform(k_mask, parents.shape) < 1.0 / L
            rand = jax.random.randint(k_res, parents.shape, 0, A)
            children = jnp.where(mut_mask, rand, parents)

            # Novelty vs measured + generated (the cache holds both) and
            # within-batch dedup.
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
            dup_earlier = jnp.any(
                jnp.tril(eq_self, k=-1) & novel[None, :], axis=1
            )
            keep = novel & ~dup_earlier

            cache, costs, vals, pos = nam_query(
                cache, costs, children, keep, k_nam, surr=surr_state
            )

            gen_tokens, _, n_gen, (gen_preds, gen_cache_pos) = _masked_append(
                gen_tokens,
                children,
                n_gen,
                keep,
                aux_bufs=(gen_preds, gen_cache_pos),
                aux_rows=(vals, pos.astype(jnp.int32)),
            )

            # Replace the worst population members with the kept children.
            worst = jnp.argsort(pop_scores)  # ascending
            count = jnp.cumsum(keep.astype(jnp.int32))
            slot = jnp.where(keep, count - 1, P + n_children)  # drop slot
            target = jnp.where(slot < P, worst[jnp.minimum(slot, P - 1)], P)
            pop_tokens = pop_tokens.at[target].set(children, mode="drop")
            pop_scores = pop_scores.at[target].set(
                jnp.where(keep, vals, pop_scores[jnp.minimum(target, P - 1)]),
                mode="drop",
            )
            return (
                (pop_tokens, pop_scores),
                (gen_tokens, gen_preds, gen_cache_pos, n_gen),
                cache,
                costs,
                key,
            )

        (_, gen_state, cache, costs, key) = jax.lax.while_loop(
            gen_cond,
            gen_body,
            (
                (pop_tokens, pop_scores),
                (gen_tokens, gen_preds, gen_cache_pos, n_gen),
                cache,
                (model_cost, landscape_cost),
                key,
            ),
        )
        gen_tokens, gen_preds, gen_cache_pos, n_gen = gen_state
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


class DeviceGeneticAlgorithmNAM:
    """(df, metadata) wrapper over `run_ga_nam` (mirrors DeviceAdaleadNAM)."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        population_size: int = 100,
        parent_selection_strategy: str = "wright-fisher",
        children_proportion: float = 0.2,
        parent_selection_proportion: Optional[float] = 0.3,
        beta: float = 0.05,
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        seed: int = 0,
    ):
        """Create the fused GA runner for `landscape`.

        `model="surrogate"` carries an empirical Flax net (default CNN;
        see runtime/surrogate.py) retrained on the measured set every
        round inside the device program.
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec()
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.model = model
        self.signal_strength = 1.0 if model != "nam" else signal_strength
        self.seed = seed
        self.name = (
            f"DeviceGeneticAlgorithm_pop_size={population_size}_"
            f"parents={parent_selection_strategy}"
        )
        self.population_size = population_size
        self.parent_selection_strategy = parent_selection_strategy
        self.children_proportion = children_proportion
        self.parent_selection_proportion = parent_selection_proportion
        self.beta = beta
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
        """Execute the fused GA experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_ga_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            self.population_size,
            self.parent_selection_strategy,
            self.children_proportion,
            self.parent_selection_proportion,
            jnp.float32(self.beta),
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
            "model_name": (
                f"LandscapeAsModel={self.landscape.name}"
                if self.model == "perfect"
                else f"NAMb_ss{self.signal_strength}"
            ),
            "landscape_name": self.landscape.name,
            "rounds": self.cfg.rounds,
            "sequences_batch_size": self.cfg.sequences_batch_size,
            "model_queries_per_batch": self.cfg.model_queries_per_batch,
        }
        if verbose:
            print(
                f"device GA run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
