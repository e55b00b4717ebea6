"""Fully-jitted GPR_BO runs over the fully enumerated sequence space.

Fuses the posterior-enumeration explorer (baselines/explorers/bo.py `GPR_BO`,
itself a TPU redesign of reference baselines/explorers/bo.py:260-410) with
the model into ONE device program per experiment.  Every round the ENTIRE
A^L space is scored in fixed-size chunks (one `lax.map` pass — SURVEY.md §7
M3: "the full 4^8 enumeration is a single vmapped scoring pass on TPU"),
ranked by the acquisition (Thompson / Greedy / UCB, reference bo.py:383-431),
and the top `sequences_batch_size` UNMEASURED points become the proposals
(reference bo.py:433-461).  GPR_BO is unbudgeted by design (reference
bo.py:264-266): `model_queries_per_batch` is ignored and the model is
charged the full space size each round, exactly like the host explorer's
`add_cost(n)` (flexs_tpu bo.py:395).

Model modes mirror the rest of the fused family:
  * nam — the NoisyAbstractModel quirk cascade plays out exactly: round 1
    queries the whole space against a cache holding only the start, so
    every point's alpha = ss^(Hamming to start); the predictions are then
    themselves cached (reference noisy_abstract_model.py:95-99), so from
    round 2 on EVERY query is a cache hit and the ranking is frozen apart
    from measured points being overwritten with truth (train semantics,
    reference noisy_abstract_model.py:62-67) — which cannot re-rank
    unmeasured points.  Fresh NAM draws therefore only ever happen in
    round 1, when the cache and the measured set coincide ({start}), so
    the negative-neighbor fallback pool (reference :91-92, random cached
    value) is exactly the measured-truth pool used here.
  * perfect — mu is the true landscape over the space; sigma = 0.
  * surrogate — an in-program trained CNN/ensemble (runtime/surrogate.py);
    sigma = per-member std.  Preserved reference quirk (documented in
    CLAUDE.md and flexs_tpu bo.py:369-377): with a single member sigma is
    identically 0, so Thompson/UCB collapse to greedy argmax over mu —
    only ensemble_size > 1 yields a real posterior spread.

Documented deviations:
  * The host explorer reports the acquisition score as `model_score`
    (reference bo.py:446-457 returns the ranked scores); so does this
    runner — under Thompson that includes the posterior-sample noise.
  * Proposals are the top-k of the masked score vector in one `top_k`
    instead of the reference's ranked linear scan; ties resolve by space
    index rather than scan order.
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

# The host explorer refuses spaces over 20M (bo.py:331-336); the fused
# runner keeps full-space f32 tables in the carry, so cap tighter.
MAX_SPACE = 1 << 20


@partial(
    jax.jit, static_argnames=("cfg", "fitness_fn", "method", "eval_chunk")
)
def run_gpr_bo_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    method: str = "Thompson",
    eval_chunk: int = 4096,
):
    """Run a full GPR_BO experiment on device (see module docstring)."""
    B = cfg.sequences_batch_size
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    S = A**L
    if S > MAX_SPACE:
        raise ValueError(
            f"GPR_BO enumerates the whole space; {A}^{L} = {S} exceeds the "
            f"fused runner's {MAX_SPACE} cap (the host explorer handles up "
            "to 20M)"
        )
    if method not in ("Thompson", "Greedy", "UCB"):
        raise ValueError(f"unknown seq_proposal_method {method!r}")
    ss = jnp.asarray(signal_strength, jnp.float32)

    chunk = min(eval_chunk, S)
    n_chunks = -(-S // chunk)
    s_pad = n_chunks * chunk
    # Big-endian mixed radix, matching the host `_space_tokens`
    # (flexs_tpu bo.py:341-350).
    radix = jnp.asarray(
        [A ** (L - 1 - j) for j in range(L)], jnp.int32
    )

    def idx_to_tokens(idx):
        return (idx[:, None] // radix[None, :]) % A

    measured_cap = 1 + R * B + 1
    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

    start_truth = fitness_fn(fitness_params, start_tokens[None])[0]
    start_idx = jnp.sum(start_tokens * radix)

    m_tokens = jnp.zeros((measured_cap, L), jnp.int32).at[0].set(start_tokens)
    m_pk = jnp.zeros((measured_cap, words), jnp.uint32).at[0].set(
        pack(start_tokens[None])[0]
    )
    m_truth = jnp.zeros((measured_cap,), jnp.float32).at[0].set(start_truth)
    n_m = jnp.int32(1)

    measured_mask = jnp.zeros((s_pad,), bool).at[start_idx].set(True)
    # The NAM prediction cache as full-space tables (the TPU-native shape
    # of the reference's dict: direct mixed-radix indexing, no scans).
    pred_table = jnp.zeros((s_pad,), jnp.float32).at[start_idx].set(
        start_truth
    )
    pred_mask = jnp.zeros((s_pad,), bool).at[start_idx].set(True)

    def round_body(carry, _):
        (
            m_tokens,
            m_pk,
            m_truth,
            n_m,
            measured_mask,
            pred_table,
            pred_mask,
            surr_state,
            model_cost,
            landscape_cost,
            key,
        ) = carry

        if cfg.surrogate is not None:
            key, k_fit = jax.random.split(key)
            surr_state = surrogate_lib.train(
                cfg.surrogate, A, surr_state, m_tokens, m_truth, n_m, k_fit
            )

        key, k_round = jax.random.split(key)

        def score_chunk(c):
            idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
            in_space = idx < S
            tokens_c = idx_to_tokens(jnp.minimum(idx, S - 1))
            kc = jax.random.fold_in(k_round, c)
            k_exp, k_choice, k_thom = jax.random.split(kc, 3)

            if cfg.surrogate is not None and cfg.surrogate.arch == "gp":
                # arch="gp": the exact analytic posterior — a REAL sigma,
                # which the reference's GPR_BO never has
                # (np.std-over-a-scalar quirk, bo.py:319).
                mu, sigma = surrogate_lib.posterior(
                    cfg.surrogate, A, surr_state, tokens_c
                )
                n_fresh = jnp.int32(0)
            elif cfg.surrogate is not None:
                # Ensembles: UNWEIGHTED member mean + member-spread sigma,
                # exactly the reference's statistics (bo.py:318-319
                # np.mean/np.std over member columns — combine weights do
                # not enter GPR_BO even for adaptive ensembles).
                member_vals = surrogate_lib.predict_members(
                    cfg.surrogate, A, surr_state, tokens_c
                )
                mu = jnp.mean(member_vals, axis=0)
                sigma = jnp.std(member_vals, axis=0)
                n_fresh = jnp.int32(0)
            elif cfg.perfect_model:
                mu = fitness_fn(fitness_params, tokens_c)
                sigma = jnp.zeros_like(mu)
                n_fresh = jnp.int32(0)
            else:
                signal = fitness_fn(fitness_params, tokens_c)
                dists = _dists_to_cache(
                    pack(tokens_c), m_pk, n_m, bits, per_word
                )
                min_dist = jnp.min(dists, axis=1)
                nearest = jnp.argmin(dists, axis=1)
                expo = jax.random.exponential(k_exp, (chunk,))
                rand_idx = jax.random.randint(
                    k_choice, (chunk,), 0, jnp.maximum(n_m, 1)
                )
                neighbor_truth = m_truth[nearest]
                noise = jnp.where(
                    neighbor_truth >= 0,
                    expo * neighbor_truth,
                    m_truth[rand_idx],
                )
                alpha = jnp.power(ss, min_dist)
                fresh = alpha * signal + (1 - alpha) * noise
                cached = pred_mask[idx]
                mu = jnp.where(cached, pred_table[idx], fresh)
                sigma = jnp.zeros_like(mu)
                n_fresh = jnp.sum(~cached & in_space)

            if method == "Thompson":
                score = mu + jnp.maximum(sigma, 1e-12) * jax.random.normal(
                    k_thom, (chunk,)
                )
            elif method == "UCB":
                score = mu + 0.01 * sigma
            else:  # Greedy
                score = mu
            score = jnp.where(
                in_space & ~measured_mask[idx], score, -jnp.inf
            )
            return score, mu, n_fresh

        scores, mus, fresh_counts = jax.lax.map(
            score_chunk, jnp.arange(n_chunks, dtype=jnp.int32)
        )
        scores = scores.reshape(s_pad)
        mus = mus.reshape(s_pad)

        model_cost = model_cost + S
        if cfg.surrogate is None and not cfg.perfect_model:
            # Two landscape queries per fresh NAM prediction (reference
            # noisy_abstract_model.py:87-88: signal + neighbor truth).
            landscape_cost = landscape_cost + 2 * jnp.sum(fresh_counts)
            # Predictions cache themselves (reference :95-99).
            pred_table = jnp.where(pred_mask, pred_table, mus)
            pred_mask = jnp.ones_like(pred_mask)

        top_vals, top_idx = jax.lax.top_k(scores, B)
        valid = jnp.isfinite(top_vals)
        proposals = idx_to_tokens(
            jnp.minimum(top_idx, S - 1).astype(jnp.int32)
        )
        truth = jnp.where(
            valid, fitness_fn(fitness_params, proposals), -jnp.inf
        )
        landscape_cost = landscape_cost + jnp.sum(valid)

        measured_mask = measured_mask.at[top_idx].max(valid)
        if cfg.surrogate is None and not cfg.perfect_model:
            # NAM train: measured truth overwrites the cached prediction
            # (reference noisy_abstract_model.py:62-67).
            pred_table = pred_table.at[top_idx].set(
                jnp.where(valid, truth, pred_table[top_idx])
            )
        m_tokens, _, n_m, (m_pk, m_truth) = _masked_append(
            m_tokens,
            proposals,
            n_m,
            valid,
            aux_bufs=(m_pk, m_truth),
            aux_rows=(pack(proposals), truth),
        )

        out = (proposals, top_vals, truth, valid, model_cost, landscape_cost)
        return (
            m_tokens,
            m_pk,
            m_truth,
            n_m,
            measured_mask,
            pred_table,
            pred_mask,
            surr_state,
            model_cost,
            landscape_cost,
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
        m_tokens,
        m_pk,
        m_truth,
        n_m,
        measured_mask,
        pred_table,
        pred_mask,
        surr0,
        jnp.int32(0),
        jnp.int32(1),
        key,
    )
    _, outs = jax.lax.scan(round_body, init, None, length=R)
    return RunResult(*outs, start_truth=start_truth)


class DeviceGPRBONAM:
    """(df, metadata) wrapper over `run_gpr_bo_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        method: str = "Thompson",
        eval_chunk: int = 4096,
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        seed: int = 0,
    ):
        """Create the fused GPR_BO runner for `landscape`.

        `model_queries_per_batch` is accepted for interface parity but
        ignored — GPR_BO is unbudgeted by design (reference bo.py:264-266);
        the model is charged the full space size each round instead.
        `model="surrogate"` defaults to a 3x CNN ensemble so Thompson/UCB
        see a real member spread (single members have sigma = 0, the
        preserved reference quirk).
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec(ensemble_size=3)
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        space = len(self.alphabet) ** len(starting_sequence)
        if space > MAX_SPACE:
            raise ValueError(
                "GPR_BO enumerates the whole space; "
                f"{len(self.alphabet)}^{len(starting_sequence)} is too large"
            )
        self.starting_sequence = starting_sequence
        self.signal_strength = 1.0 if model != "nam" else signal_strength
        self.method = method
        self.eval_chunk = eval_chunk
        self.seed = seed
        self.name = f"DeviceGPR_BO_method={method}"
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
        """Execute the fused GPR_BO experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters,
            self.starting_sequence,
            float(self.signal_strength),
            self.seed,
        )
        result = run_gpr_bo_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            self.method,
            self.eval_chunk,
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
                f"device GPR_BO run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
