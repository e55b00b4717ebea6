"""Evolutionary BO and GP-style BO explorers, redesigned as batched programs.

Parity contract (reference baselines/explorers/bo.py):

`BO` ("Evo_BO", :18-257):
  * name "BO_method={method}"; non-ensemble models are auto-wrapped in an
    identity-combine Ensemble so per-member predictions are visible
    (:55-56).
  * Thompson-sample seeds from the last measured batch (exp(10 * fitness)
    weights, :190-197), optionally recombining it first (:215-219).
  * Candidates are sparse multi-site mutations (each position flips with
    probability 1/L to a uniformly-random different residue, :135-155);
    acquisition is EI (:125-127) or UCB (:129-133) over per-member ensemble
    predictions; chosen transitions go into a PER buffer (:163-183) and the
    ensemble retrains on replayed samples each round (:86-100).
  * Pads the proposal set with random sequences if under batch size
    (:246-250).

TPU-first redesign (replaces the reference's serial one-action-at-a-time
budget loop, reference :228-255): each round runs `num_chains`
Thompson-seeded mutation chains in LOCKSTEP for
T = ceil(sequences_batch_size / num_chains) steps.  Every step screens all
chains' candidate sets in ONE batched ensemble call over
num_chains x candidates sequences, so a round costs T model dispatches
instead of the reference's ~sequences_batch_size serial calls, while
visiting the same number of states on the same per-state screening budget.
Visited chain states form the proposal pool, exactly like the reference's
visited-state samples.

Documented deviations:
  * The reference's uncertainty-reset heuristic (:237-244) compares np.std
    of a SCALAR — always 0.0, so the reset can never fire; the dead
    heuristic is dropped rather than reproduced.
  * Walk depth is split across `num_chains` parallel chains instead of one
    serial chain; the per-round state-visit count and query budget match.
  * best-fitness used by EI advances once per lockstep step (after all
    chains move) instead of after every single action.
  * Candidate action tuples are sampled independently (collisions possible
    but vanishingly rare at 1/L flip rates) instead of being
    rejection-sampled into a uniqueness set (:171-181).

`GPR_BO` (:260-410):
  * name "GPR_BO_Explorer-seq_proposal_method={method}"; enumerates the
    ENTIRE sequence space and scores it (unbudgeted by design, :264-266);
    proposal methods Thompson / Greedy / UCB over the per-member posterior
    (:307-376); proposes the top unmeasured sequences.
  * TPU deviation (documented): the reference scores one sequence per
    `get_fitness` call on a bare string; here the space is enumerated
    directly as int32 tokens and scored through the models' token fast
    path in a few large device calls (no string round-trips; VERDICT r1
    #10), with a string-API fallback for models without a token path.
    Cost accounting matches either way (+= space size).  Per-member
    statistics come from an identity-combine Ensemble when one is
    provided, falling back to zero variance otherwise.
"""
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from flexs_tpu.alphabet import as_alphabet
from flexs_tpu.ensemble import Ensemble
from flexs_tpu.explorer import Explorer
from flexs_tpu.model import Model
from flexs_tpu.utils.replay_buffers import PrioritizedReplayBuffer
from flexs_tpu.utils.sequence_utils import generate_random_sequences


class BO(Explorer):
    """Evolutionary Bayesian optimization explorer (batched lockstep walks)."""

    def __init__(
        self,
        model: Model,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        alphabet: str,
        log_file: Optional[str] = None,
        method: str = "EI",
        recomb_rate: float = 0,
        num_chains: int = 10,
        seed: Optional[int] = None,
    ):
        """Create an Evo_BO explorer.

        Args:
            method: "EI" (expected improvement) or "UCB".
            recomb_rate: Per-position crossover switch probability applied
                to the previous batch before Thompson sampling.
            num_chains: Parallel Thompson-seeded walk chains per round
                (1 reproduces the reference's single serial walk shape;
                more chains = broader seeds, shallower walks, same budget).
            seed: PRNG seed (the reference uses unseeded global numpy).
        """
        name = f"BO_method={method}"
        if not isinstance(model, Ensemble):
            model = Ensemble([model], combine_with=lambda x: x)

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
        self.method = method
        self.recomb_rate = recomb_rate
        self.num_chains = num_chains
        self.best_fitness = 0.0
        self.num_actions = 0
        self.seq_len = len(starting_sequence)
        self.memory = None
        self._rng = np.random.default_rng(seed)

    # -- helpers ------------------------------------------------------------
    def _one_hot(self, tokens: np.ndarray) -> np.ndarray:
        """One-hot [.., L, A] of int tokens (host-side, for PER storage)."""
        eye = np.eye(len(self.alphabet), dtype=np.float64)
        return eye[np.asarray(tokens)]

    def initialize_data_structures(self):
        """Initialize the prioritized replay memory."""
        self.memory = PrioritizedReplayBuffer(
            len(self.alphabet) * self.seq_len,
            100000,
            self.sequences_batch_size,
            0.6,
            seed=int(self._rng.integers(2**31)),
        )

    def train_models(self):
        """Retrain the ensemble on (prioritized) replayed transitions."""
        if len(self.memory) >= self.sequences_batch_size:
            batch = self.memory.sample_batch()
        else:
            self.memory.batch_size = len(self.memory)
            batch = self.memory.sample_batch()
            self.memory.batch_size = self.sequences_batch_size
        states = batch["next_obs"]
        tokens = np.argmax(
            states.reshape(len(states), self.seq_len, len(self.alphabet)), axis=2
        )
        state_seqs = self.alphabet.decode(tokens.astype(np.int32))
        self.model.train(state_seqs, batch["rews"])

    def _recombine_population(self, gen):
        self._rng.shuffle(gen)
        ret = []
        for i in range(0, len(gen) - 1, 2):
            str_a, str_b = [], []
            switch = False
            for ind in range(len(gen[i])):
                if self._rng.random() < self.recomb_rate:
                    switch = not switch
                if switch:
                    str_a.append(gen[i][ind])
                    str_b.append(gen[i + 1][ind])
                else:
                    str_b.append(gen[i][ind])
                    str_a.append(gen[i + 1][ind])
            ret.append("".join(str_a))
            ret.append("".join(str_b))
        return ret

    def EI(self, member_preds: np.ndarray) -> np.ndarray:
        """Expected improvement over the best seen fitness, per candidate.

        member_preds: [num_candidates, num_members].
        """
        return np.maximum(member_preds - self.best_fitness, 0).mean(axis=1)

    @staticmethod
    def UCB(member_preds: np.ndarray) -> np.ndarray:
        """(Pessimistic) confidence bound used by the reference, per candidate."""
        discount = 0.01
        return member_preds.mean(axis=1) - discount * member_preds.std(axis=1)

    def _sample_mutants(self, states: np.ndarray, n_per_chain: int) -> np.ndarray:
        """Sparse multi-site mutants of each chain state.

        states: int[C, L] -> int[C, n_per_chain, L].  Each position mutates
        with probability 1/L to a uniformly-random DIFFERENT residue, and
        every candidate mutates at least one position (the reference
        rejects empty actions, bo.py:180).
        """
        c, length = states.shape
        a = len(self.alphabet)
        flip = self._rng.random((c, n_per_chain, length)) < (1.0 / length)
        none = ~flip.any(axis=2)
        if none.any():
            rows = np.nonzero(none)
            flip[rows[0], rows[1], self._rng.integers(length, size=len(rows[0]))] = True
        # (cur + 1 + U[0, A-2]) % A is uniform over the A-1 other residues.
        offsets = self._rng.integers(1, a, size=(c, n_per_chain, length))
        cur = np.broadcast_to(states[:, None, :], flip.shape)
        return np.where(flip, (cur + offsets) % a, cur).astype(np.int32)

    def Thompson_sample(self, scores: np.ndarray, seqs, size: int):
        """exp(10 * fitness)-weighted sample of `size` seed sequences."""
        weights = np.exp(10 * np.asarray(scores, dtype=np.float64))
        cdf = np.cumsum(weights) / np.sum(weights)
        idx = np.minimum(
            np.searchsorted(cdf, self._rng.uniform(size=size)), len(seqs) - 1
        )
        return [seqs[i] for i in idx]

    def propose_sequences(
        self, measured_sequences: pd.DataFrame
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Run the lockstep chain walks and propose the visited states."""
        chains = min(self.num_chains, self.sequences_batch_size)
        steps = max(1, -(-self.sequences_batch_size // chains))  # ceil
        cands = max(1, self.model_queries_per_batch // (chains * steps))

        if self.num_actions == 0:
            self.initialize_data_structures()
            seeds = [self.starting_sequence] * chains
        else:
            last_round = measured_sequences["round"].max()
            last_batch = measured_sequences[measured_sequences["round"] == last_round]
            seqs = last_batch["sequence"].tolist()
            scores = last_batch["true_score"].to_numpy()
            if self.recomb_rate > 0 and len(seqs) > 1:
                recombined = self._recombine_population(list(seqs))
                known = {s: f for s, f in zip(seqs, scores)}
                novel = [s for s in recombined if s not in known]
                if novel:  # one batched call replaces per-seq singletons
                    novel_scores = np.asarray(self.model.get_fitness(novel)).mean(
                        axis=1
                    )
                    known.update(zip(novel, novel_scores))
                seqs = recombined
                scores = np.array([known[s] for s in seqs])
            seeds = self.Thompson_sample(scores, seqs, chains)

        states = self.alphabet.encode(seeds)  # int32[C, L]
        all_measured_seqs = set(measured_sequences["sequence"].tolist())
        samples = {}
        acq = self.EI if self.method == "EI" else self.UCB

        for _ in range(steps):
            mutants = self._sample_mutants(states, cands)  # [C, M, L]
            flat = mutants.reshape(-1, self.seq_len)
            mutant_seqs = self.alphabet.decode(flat)
            member_preds = np.asarray(self.model.get_fitness(mutant_seqs))
            pick = acq(member_preds).reshape(chains, cands).argmax(axis=1)

            chosen = mutants[np.arange(chains), pick]  # [C, L]
            chosen_preds = member_preds.reshape(chains, cands, -1)[
                np.arange(chains), pick
            ]
            rewards = chosen_preds.mean(axis=1)
            chosen_seqs = self.alphabet.decode(chosen)

            prev_oh = self._one_hot(states)
            next_oh = self._one_hot(chosen)
            changed = (chosen != states)[..., None]  # [C, L, 1]
            action_oh = next_oh * changed
            for ci in range(chains):
                seq = chosen_seqs[ci]
                samples[seq] = rewards[ci]
                if seq not in all_measured_seqs:
                    self.best_fitness = max(self.best_fitness, float(rewards[ci]))
                    self.memory.store(
                        prev_oh[ci].ravel(),
                        action_oh[ci].ravel(),
                        float(rewards[ci]),
                        next_oh[ci].ravel(),
                    )
                    all_measured_seqs.add(seq)
            states = chosen
            self.num_actions += chains

        if len(samples) < self.sequences_batch_size:
            for seq in generate_random_sequences(
                self.seq_len,
                self.sequences_batch_size - len(samples),
                self.alphabet,
                rng=self._rng,
            ):
                samples.setdefault(seq, None)

        sample_seqs = list(samples)
        preds = np.asarray(self.model.get_fitness(sample_seqs)).mean(axis=1)
        self.train_models()

        # The lockstep-chain redesign visits chains*ceil(B/chains) states,
        # which overshoots B when num_chains does not divide it (the
        # reference's single-chain walk has no such structural overshoot);
        # return the top B by predicted fitness so the advertised batch
        # contract holds.
        if len(sample_seqs) > self.sequences_batch_size:
            order = np.argsort(preds)[::-1][: self.sequences_batch_size]
            sample_seqs = [sample_seqs[i] for i in order]
            preds = preds[order]
        return sample_seqs, preds


class GPR_BO(Explorer):
    """Posterior-based BO over the fully enumerated sequence space."""

    def __init__(
        self,
        model: Model,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        alphabet: str,
        log_file: Optional[str] = None,
        seq_proposal_method: str = "Thompson",
        eval_batch_size: int = 16384,
        seed: Optional[int] = None,
    ):
        """Create a GPR_BO explorer (Thompson / Greedy / UCB proposals)."""
        name = f"GPR_BO_Explorer-seq_proposal_method={seq_proposal_method}"
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
        self.alphabet_len = len(self.alphabet)
        self.seq_proposal_method = seq_proposal_method
        self.best_fitness = 0
        self.top_sequence = []
        self.seq_len = len(starting_sequence)
        self.eval_batch_size = eval_batch_size
        self._rng = np.random.default_rng(seed)

        if self.alphabet_len**self.seq_len > 20_000_000:
            raise ValueError(
                "GPR_BO enumerates the whole space; "
                f"{self.alphabet_len}^{self.seq_len} is too large"
            )

    def reset(self):
        """Reset best-fitness tracking."""
        self.best_fitness = 0
        self._reset = True

    def _space_tokens(self) -> np.ndarray:
        """The full space enumerated as int32[A^L, L] tokens (mixed radix)."""
        n = self.alphabet_len**self.seq_len
        radix = self.alphabet_len ** np.arange(
            self.seq_len - 1, -1, -1, dtype=np.int64
        )
        return (
            (np.arange(n, dtype=np.int64)[:, None] // radix) % self.alphabet_len
        ).astype(np.int32)

    def _posterior_over_space(self):
        """(seqs, mu, sigma) over the fully enumerated space.

        Scores through the models' token fast path when available — the
        whole 4^8 space is a few device calls over int32 tokens, no string
        round-trips (SURVEY.md §7 M3: "a single vmapped scoring pass on
        TPU") — with the string API as fallback.  Cost accounting matches
        `get_fitness` semantics either way (+= space size).

        Preserved reference quirk: with a NON-ensemble model, sigma stays
        all-zero (the reference takes np.std over a scalar prediction,
        bo.py:319), so Thompson/UCB collapse to greedy argmax over mu.
        Only an identity-combine Ensemble (per-member prediction columns)
        produces a real posterior spread.
        """
        tokens = self._space_tokens()
        n = len(tokens)
        mus = np.empty(n)
        sigmas = np.zeros(n)

        def fill(i, preds):
            m = preds.shape[0]
            if preds.ndim == 2:  # identity-combine ensemble: per-member cols
                mus[i : i + m] = preds.mean(axis=1)
                sigmas[i : i + m] = preds.std(axis=1)
            else:
                mus[i : i + m] = preds

        # Probe the token fast path with the FIRST real chunk (a separate
        # (1, L)-shaped probe would pay its own XLA compile and a wasted
        # relay dispatch — CLAUDE.md per-dispatch costs).
        try:
            first = np.asarray(
                self.model.fitness_from_tokens(tokens[: self.eval_batch_size])
            )
            token_path = True
        except NotImplementedError:
            token_path = False

        if token_path:
            fill(0, first)
            for i in range(self.eval_batch_size, n, self.eval_batch_size):
                fill(
                    i,
                    np.asarray(
                        self.model.fitness_from_tokens(
                            tokens[i : i + self.eval_batch_size]
                        )
                    ),
                )
            self.model.add_cost(n)
            # No full-space string decode on the token path: the consumer
            # decodes only the handful of top-ranked candidates it visits.
            return None, tokens, mus, sigmas
        seqs_all = self.alphabet.decode(tokens)
        for i in range(0, n, self.eval_batch_size):
            fill(
                i,
                np.asarray(
                    self.model.get_fitness(seqs_all[i : i + self.eval_batch_size])
                ),
            )
        return seqs_all, tokens, mus, sigmas

    # Each proposal method returns (scores over the space, seqs-or-None,
    # tokens) as ARRAYS — the space can be millions of points, so no
    # per-point Python pairs are ever built; the consumer argsorts once
    # and visits only the top slice it needs.
    def propose_sequences_via_thompson(self):
        """Rank by a Gaussian posterior sample."""
        print("Enumerating all sequences in the space.")
        seqs, tokens, mus, sigmas = self._posterior_over_space()
        scores = self._rng.normal(mus, np.maximum(sigmas, 1e-12))
        return scores, seqs, tokens

    def propose_sequences_via_greedy(self):
        """Rank by the posterior mean."""
        print("Enumerating all sequences in the space.")
        seqs, tokens, mus, _ = self._posterior_over_space()
        return mus, seqs, tokens

    def propose_sequences_via_ucb(self):
        """Rank by mu + 0.01 sigma."""
        print("Enumerating all sequences in the space.")
        seqs, tokens, mus, sigmas = self._posterior_over_space()
        return mus + 0.01 * sigmas, seqs, tokens

    def propose_sequences(
        self, measured_sequences: pd.DataFrame
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Propose the top unmeasured sequences of the ranked space."""
        seq_proposal_funcs = {
            "Greedy": self.propose_sequences_via_greedy,
            "Thompson": self.propose_sequences_via_thompson,
            "UCB": self.propose_sequences_via_ucb,
        }
        scores, seqs, tokens = seq_proposal_funcs[self.seq_proposal_method]()
        order = np.argsort(scores)[::-1]
        all_measured_seqs = set(measured_sequences["sequence"].values)

        new_states, new_fitnesses = [], []
        for i in order:
            if len(new_states) >= self.sequences_batch_size:
                break
            new_fitness = float(scores[i])
            new_seq = (
                seqs[i]
                if seqs is not None
                else self.alphabet.decode(tokens[i : i + 1])[0]
            )
            if new_seq not in all_measured_seqs:
                if new_fitness >= self.best_fitness:
                    self.top_sequence.append(
                        (new_fitness, new_seq, self.model.cost)
                    )
                    self.best_fitness = new_fitness
                all_measured_seqs.add(new_seq)
                new_states.append(new_seq)
                new_fitnesses.append(new_fitness)

        print("Current best fitness:", self.best_fitness)
        return new_states, np.array(new_fitnesses)
