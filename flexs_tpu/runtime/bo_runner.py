"""Fully-jitted Evo-BO + NoisyAbstractModel runs.

Fuses the batched-lockstep BO explorer (baselines/explorers/bo.py, itself a
TPU redesign of reference baselines/explorers/bo.py:18-257) with the NAM
surrogate into ONE device program per experiment: every round Thompson-seeds
`num_chains` mutation chains from the previous measured batch
(exp(10*fitness) weights, reference bo.py:190-197), then walks them in
lockstep for T = ceil(sequences_batch_size / num_chains) steps.  Each step
screens `candidates` sparse multi-site mutants per chain (each position
flips with probability 1/L, at least one flip — reference bo.py:135-155,
:171-181) in one batched NAM query and advances each chain to its
acquisition argmax.  Visited chain states form the round's proposal pool,
exactly like the reference's visited-state `samples` dict.

Documented deviations (on top of those in baselines/explorers/bo.py):
  * With a single NAM member, both EI (reference bo.py:125-127) and UCB
    (:129-133) acquisition degenerate to ranking by the predicted fitness
    (EI ties-at-zero are broken by raw prediction instead of the
    reference's argmax-takes-first).
  * The PER buffer + ensemble retrain (reference bo.py:86-100,:163-183)
    is the NAM cache here: NAM "training" is caching measured sequences,
    which the fused cache already does (as in every other fused runner).
  * The proposal pool is capped at `sequences_batch_size` by model score
    (the reference proposes ALL visited states and lets `Explorer.run`
    warn when over batch size, reference explorer.py:165-168); shortfall
    from chain collisions is left unfilled instead of padded with random
    sequences (reference bo.py:246-250) — collisions are vanishingly rare
    at 1/L flip rates.
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
from flexs_tpu.runtime.jit_runner import (
    RunResult,
    device_run_args,
    fetch_run_result,
    _dists_to_cache,
    _masked_append,
)


@partial(jax.jit, static_argnames=("cfg", "fitness_fn", "num_chains", "method"))
def run_bo_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    num_chains: int = 10,
    method: str = "EI",
):
    """Run a full Evo-BO + NAM experiment on device.

    Chains x steps x candidates are sized so the per-round state-visit
    count matches `sequences_batch_size` and the screening budget matches
    `model_queries_per_batch`, mirroring the host explorer's lockstep
    redesign of the reference's serial budget loop (reference
    bo.py:228-255).

    With `cfg.surrogate` set, the model is an in-program trained
    CNN/ensemble (runtime/surrogate.py; the reference's BO-CNN runs,
    paper_code/cloud/runs/rosetta_cnn/bo_*_cnn.csv) and the acquisition
    uses TRUE per-member statistics: EI = mean_k(max(v_k - best, 0))
    (reference bo.py:125-127 with best_fitness = running max of chosen
    mean-predictions, bo.py:182-185) and UCB = mean - 0.01 * std
    (bo.py:129-133, including the reference's MINUS-sign quirk).
    Documented deviation: the reference additionally retrains its
    ensemble on the PER memory inside every propose call (bo.py:86-100);
    here the ensemble trains once per round on the measured set (the
    Explorer.run contract), which is the dominant signal.
    """
    if cfg.surrogate is None:
        del method  # single NAM member: EI and UCB rank by prediction.
    B = cfg.sequences_batch_size
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    ss = jnp.asarray(signal_strength, jnp.float32)
    measured_cap = 1 + R * B + 1

    C = min(num_chains, B)
    T = max(1, -(-B // C))  # ceil(B / C) lockstep steps per round
    M = max(1, cfg.model_queries_per_batch // (C * T))  # candidates/chain

    cache_cap = 1 + R * (C * T * M) + 1
    gen_cap = C * T + 1

    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

    start_truth = fitness_fn(fitness_params, start_tokens[None])[0]

    cache_tokens = jnp.zeros((cache_cap, L), jnp.int32).at[0].set(start_tokens)
    cache_pk = jnp.zeros((cache_cap, words), jnp.uint32).at[0].set(
        pack(start_tokens[None])[0]
    )
    cache_vals = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache_truth = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    n_cache = jnp.int32(1)

    def nam_query(cache, costs, tokens, key):
        """NAM semantics identical to jit_runner (see there for citations).

        Within-batch duplicate queries resolve to their FIRST occurrence
        (one noise draw, one cache insert — the host NAM's second query
        would hit the prediction cache), and returned cache positions
        point at the EXISTING row for cached queries, so measured-truth
        writebacks reach the right entry.
        """
        cache_tokens, cache_pk, cache_vals, cache_truth, n_cache = cache
        model_cost, landscape_cost = costs
        n = tokens.shape[0]

        pk = pack(tokens)
        dists = _dists_to_cache(pk, cache_pk, n_cache, bits, per_word)
        min_dist = jnp.min(dists, axis=1)
        nearest = jnp.argmin(dists, axis=1)
        cached = min_dist == 0

        # First occurrence of each distinct candidate within the batch.
        eq_self = jnp.all(pk[:, None, :] == pk[None, :, :], axis=-1)
        idx = jnp.arange(n)
        first_idx = jnp.min(jnp.where(eq_self, idx[None, :], n), axis=1)
        is_first = first_idx == idx

        signal = fitness_fn(fitness_params, tokens)
        if cfg.perfect_model:
            values = jnp.where(cached, cache_vals[nearest], signal)
        else:
            key, k_exp, k_choice = jax.random.split(key, 3)
            expo = jax.random.exponential(k_exp, (n,))
            rand_idx = jax.random.randint(
                k_choice, (n,), 0, jnp.maximum(n_cache, 1)
            )
            neighbor_truth = cache_truth[nearest]
            noise = jnp.where(
                neighbor_truth >= 0, expo * neighbor_truth, cache_vals[rand_idx]
            )
            alpha = jnp.power(ss, min_dist)
            values = jnp.where(
                cached, cache_vals[nearest], alpha * signal + (1 - alpha) * noise
            )
        values = values[first_idx]

        insert = ~cached & is_first
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
        # Every screened candidate costs one model query (reference
        # bo.py:157-160 screens `queries/batch` candidates per action).
        model_cost = model_cost + n
        if not cfg.perfect_model:
            landscape_cost = landscape_cost + 2 * jnp.sum(insert)
        eff_pos = jnp.where(cached, nearest.astype(pos.dtype), pos)[first_idx]
        return (
            (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
            (model_cost, landscape_cost),
            values,
            eff_pos,
        )

    def round_body(carry, _):
        (
            cache,
            model_cost,
            landscape_cost,
            prev_tokens,
            prev_truth,
            prev_valid,
            surr,
            key,
        ) = carry
        surr_state, best_fit, measured = surr

        if cfg.surrogate is not None:
            key, k_fit = jax.random.split(key)
            m_tokens, m_truth, n_m = measured
            surr_state = surrogate_lib.train(
                cfg.surrogate, A, surr_state, m_tokens, m_truth, n_m, k_fit
            )

        key, k_seed = jax.random.split(key)
        # Thompson-sample chain seeds from the previous measured batch with
        # exp(10 * fitness) weights (reference bo.py:190-197); round 1 has
        # only the starting sequence (prev buffers are seeded with it).
        logits = jnp.where(prev_valid, 10.0 * prev_truth, -jnp.inf)
        seed_idx = jax.random.categorical(k_seed, logits, shape=(C,))
        states = prev_tokens[seed_idx]  # int32[C, L]

        gen_tokens = jnp.zeros((gen_cap, L), jnp.int32)
        gen_pk = jnp.zeros((gen_cap, words), jnp.uint32)
        gen_preds = jnp.full((gen_cap,), -jnp.inf, jnp.float32)
        gen_cache_pos = jnp.full((gen_cap,), cache_cap - 1, jnp.int32)
        n_gen = jnp.int32(0)

        def step_body(step_carry, _):
            states, gen_state, cache, costs, best_fit, key = step_carry
            gen_tokens, gen_pk, gen_preds, gen_cache_pos, n_gen = gen_state

            key, k_flip, k_pos, k_res, k_nam = jax.random.split(key, 5)
            # Sparse multi-site mutants: each position flips w.p. 1/L to a
            # uniformly-random DIFFERENT residue; empty actions get one
            # forced flip (reference bo.py:135-155, :180).
            flip = jax.random.uniform(k_flip, (C, M, L)) < (1.0 / L)
            forced = jax.nn.one_hot(
                jax.random.randint(k_pos, (C, M), 0, L), L, dtype=bool
            )
            flip = jnp.where(jnp.any(flip, axis=-1, keepdims=True), flip, forced)
            offsets = jax.random.randint(k_res, (C, M, L), 1, A)
            cur = jnp.broadcast_to(states[:, None, :], (C, M, L))
            mutants = jnp.where(flip, (cur + offsets) % A, cur)

            flat = mutants.reshape(C * M, L)
            if cfg.surrogate is not None and cfg.surrogate.arch == "gp":
                # Exact-GP posterior acquisition: the Gaussian closed
                # forms of the same EI/UCB the member path estimates by
                # sampling — E[max(f - best, 0)] under N(mu, sigma^2),
                # and UCB with the reference's minus-sign quirk
                # (bo.py:129-133) on a real sigma.
                vals, sig = surrogate_lib.posterior(
                    cfg.surrogate, A, surr_state, flat
                )
                if method == "UCB":
                    acq = vals - 0.01 * sig
                else:  # EI
                    safe = jnp.maximum(sig, 1e-12)
                    z = (vals - best_fit) / safe
                    ei = safe * (
                        jax.scipy.stats.norm.pdf(z)
                        + z * jax.scipy.stats.norm.cdf(z)
                    )
                    acq = jnp.where(
                        sig > 1e-12, ei, jnp.maximum(vals - best_fit, 0.0)
                    )
            elif cfg.surrogate is not None:
                # Per-member acquisition over the in-program ensemble
                # (docstring; reference bo.py:125-133, 170-185).
                member_vals = surrogate_lib.predict_members(
                    cfg.surrogate, A, surr_state, flat
                )  # [K, C*M]
                vals = jnp.mean(member_vals, axis=0)
                if method == "UCB":
                    acq = vals - 0.01 * jnp.std(member_vals, axis=0)
                else:  # EI
                    acq = jnp.mean(
                        jnp.maximum(member_vals - best_fit, 0.0), axis=0
                    )
            else:
                cache, costs, vals, pos = nam_query(cache, costs, flat, k_nam)
                # Single NAM member: EI and UCB both reduce to the
                # predicted fitness — module docstring.
                acq = vals
            if cfg.surrogate is not None:
                # Both surrogate paths: charge the model the screen size
                # and park cache positions at the sentinel row (no NAM
                # cache in surrogate mode).
                model_cost_s, landscape_cost_s = costs
                costs = (model_cost_s + C * M, landscape_cost_s)
                pos = jnp.full((C * M,), cache_cap - 1, jnp.int32)

            pick = acq.reshape(C, M).argmax(axis=1)
            take = jnp.arange(C) * M + pick
            chosen = flat[take]  # int32[C, L]
            chosen_vals = vals[take]
            chosen_pos = pos[take].astype(jnp.int32)
            # best_fitness: running max of chosen mean-predictions
            # (reference bo.py:182-185).
            best_fit = jnp.maximum(best_fit, jnp.max(chosen_vals))

            # Visited states join the proposal pool, deduped within the
            # round (the reference's `samples` dict keys, bo.py:262-266).
            chosen_pk = pack(chosen)
            vs_gen = packed_hamming.packed_hamming_matrix(
                chosen_pk, gen_pk, bits, per_word
            )
            in_gen = jnp.any(
                (vs_gen == 0) & (jnp.arange(gen_cap)[None, :] < n_gen), axis=1
            )
            eq_self = jnp.all(chosen_pk[:, None, :] == chosen_pk[None, :, :], axis=-1)
            dup_self = jnp.any(jnp.tril(eq_self, k=-1), axis=1)
            keep = ~in_gen & ~dup_self

            gen_tokens, _, n_gen, (gen_pk, gen_preds, gen_cache_pos) = (
                _masked_append(
                    gen_tokens,
                    chosen,
                    n_gen,
                    keep,
                    aux_bufs=(gen_pk, gen_preds, gen_cache_pos),
                    aux_rows=(chosen_pk, chosen_vals, chosen_pos),
                )
            )
            return (
                chosen,  # advance chains
                (gen_tokens, gen_pk, gen_preds, gen_cache_pos, n_gen),
                cache,
                costs,
                best_fit,
                key,
            ), None

        (states, gen_state, cache, costs, best_fit, key), _ = jax.lax.scan(
            step_body,
            (
                states,
                (gen_tokens, gen_pk, gen_preds, gen_cache_pos, n_gen),
                cache,
                (model_cost, landscape_cost),
                best_fit,
                key,
            ),
            None,
            length=T,
        )
        gen_tokens, gen_pk, gen_preds, gen_cache_pos, n_gen = gen_state
        model_cost, landscape_cost = costs

        masked_preds = jnp.where(jnp.arange(gen_cap) < n_gen, gen_preds, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(masked_preds, B)
        valid = jnp.isfinite(top_vals)
        proposals = gen_tokens[top_idx]
        truth = jnp.where(valid, fitness_fn(fitness_params, proposals), -jnp.inf)
        landscape_cost = landscape_cost + jnp.sum(valid)

        # NAM training = cache measured truth (reference
        # noisy_abstract_model.py:62-67); positions point at existing rows
        # even for revisited sequences (nam_query returns effective pos).
        upd = gen_cache_pos[top_idx]
        cache_vals = cache[2].at[upd].set(
            jnp.where(valid, truth, cache[2][upd]), mode="drop"
        )
        cache_truth = cache[3].at[upd].set(
            jnp.where(valid, truth, cache[3][upd]), mode="drop"
        )
        cache = (cache[0], cache[1], cache_vals, cache_truth, cache[4])

        if cfg.surrogate is not None:
            m_tokens, m_truth, n_m = measured
            m_tokens, _, n_m, (m_truth,) = _masked_append(
                m_tokens, proposals, n_m, valid,
                aux_bufs=(m_truth,), aux_rows=(truth,),
            )
            measured = (m_tokens, m_truth, n_m)

        out = (proposals, top_vals, truth, valid, model_cost, landscape_cost)
        return (
            cache,
            model_cost,
            landscape_cost,
            proposals,
            truth,
            valid,
            (surr_state, best_fit, measured),
            key,
        ), out

    prev_tokens = jnp.zeros((B, L), jnp.int32).at[0].set(start_tokens)
    prev_truth = jnp.full((B,), -jnp.inf, jnp.float32).at[0].set(start_truth)
    prev_valid = jnp.zeros((B,), bool).at[0].set(True)
    if cfg.surrogate is not None:
        key, k_init = jax.random.split(key)
        surr0 = surrogate_lib.init_state(
            cfg.surrogate, A, L, k_init, capacity=measured_cap
        )
        measured0 = (
            jnp.zeros((measured_cap, L), jnp.int32).at[0].set(start_tokens),
            jnp.full((measured_cap,), -jnp.inf, jnp.float32).at[0].set(
                start_truth
            ),
            jnp.int32(1),
        )
        # best_fitness starts at 0 (reference initialize_data_structures).
        surr_init = (surr0, jnp.float32(0.0), measured0)
    else:
        surr_init = ((), jnp.float32(0.0), ())
    init = (
        (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
        jnp.int32(0),
        jnp.int32(1),
        prev_tokens,
        prev_truth,
        prev_valid,
        surr_init,
        key,
    )
    _, outs = jax.lax.scan(round_body, init, None, length=R)
    return RunResult(*outs, start_truth=start_truth)


class DeviceBONAM:
    """(df, metadata) wrapper over `run_bo_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        num_chains: int = 10,
        method: str = "EI",
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        seed: int = 0,
    ):
        """Create the fused Evo-BO runner for `landscape`.

        `model="surrogate"` carries an in-program trained ensemble
        (default = 3x CNN so EI/UCB see a real member spread; the
        reference's own BO-CNN runs used Ens of one CNN, bo_*_cnn.csv).
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if method not in ("EI", "UCB"):
            # Evo-BO supports the reference's two acquisitions
            # (bo.py:125-133); Thompson/Greedy belong to GPR_BO.
            raise ValueError(f"method must be 'EI' or 'UCB', got {method!r}")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec(ensemble_size=3)
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.signal_strength = 1.0 if model != "nam" else signal_strength
        self.num_chains = num_chains
        self.method = method
        self.seed = seed
        self.name = f"DeviceBO_method={method}"
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
        """Execute the fused Evo-BO experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters,
            self.starting_sequence,
            float(self.signal_strength),
            self.seed,
        )
        result = run_bo_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            self.num_chains,
            self.method,
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
                f"device BO run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
