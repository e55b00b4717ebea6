"""Evolutionary BO and GP-style BO explorers.

Parity contract (reference baselines/explorers/bo.py):

`BO` ("Evo_BO", :18-257):
  * name "BO_method={method}"; non-ensemble models are auto-wrapped in an
    identity-combine Ensemble so per-member predictions are visible
    (:55-56).
  * Thompson-sample a seed sequence from the last measured batch
    (exp(10 * fitness) weights, :190-197), optionally recombining it first
    (:215-219).
  * Each step screens `model_queries_per_batch / sequences_batch_size`
    sparse multi-site mutation candidates in ONE ensemble call; picks
    argmax of EI (:125-127) or UCB (:129-133); stores the transition in a
    PER buffer (:163-183).
  * The uncertainty-reset heuristic (:237-244) compares np.std of a
    SCALAR — always 0.0 in the reference, so the reset never fires; this
    quirk is reproduced for parity.
  * Pads the proposal set with random sequences if under batch size
    (:246-250); retrains the ensemble on PER samples each round (:86-100).

`GPR_BO` (:260-410):
  * name "GPR_BO_Explorer-seq_proposal_method={method}"; enumerates the
    ENTIRE sequence space and scores it (unbudgeted by design, :264-266);
    proposal methods Thompson / Greedy / UCB over the per-member posterior
    (:307-376); proposes the top unmeasured sequences.
  * TPU deviation (documented): the reference scores one sequence per
    `get_fitness` call on a bare string (cost += seq_len per call); here
    the full space is scored in large batched calls (cost += space size),
    and per-member statistics come from an identity-combine Ensemble when
    one is provided, falling back to zero variance otherwise.
"""
import itertools
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
    """Evolutionary Bayesian optimization explorer."""

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
        seed: Optional[int] = None,
    ):
        """Create an Evo_BO explorer.

        Args:
            method: "EI" (expected improvement) or "UCB".
            recomb_rate: Per-position crossover switch probability applied
                to the previous batch before Thompson sampling.
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
        self.best_fitness = 0
        self.num_actions = 0
        self.state = None
        self.seq_len = None
        self.memory = None
        self.initial_uncertainty = None
        self._rng = np.random.default_rng(seed)

    # -- helpers ------------------------------------------------------------
    def _string_to_one_hot(self, seq: str) -> np.ndarray:
        tokens = self.alphabet.encode_one(seq)
        out = np.zeros((len(seq), len(self.alphabet)))
        out[np.arange(len(seq)), tokens] = 1
        return out

    def initialize_data_structures(self):
        """Initialize state, memory."""
        self.state = self._string_to_one_hot(self.starting_sequence)
        self.seq_len = len(self.starting_sequence)
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

    def EI(self, vals) -> float:
        """Expected improvement over the best seen fitness."""
        return np.mean(np.maximum(np.asarray(vals) - self.best_fitness, 0))

    @staticmethod
    def UCB(vals) -> float:
        """(Pessimistic) confidence bound used by the reference."""
        discount = 0.01
        return np.mean(vals) - discount * np.std(vals)

    def sample_actions(self):
        """Sample sparse multi-site mutation actions (novel tuples)."""
        actions = set()
        pos_changes = []
        for pos in range(self.seq_len):
            pos_changes.append(
                [
                    (pos, res)
                    for res in range(len(self.alphabet))
                    if self.state[pos, res] == 0
                ]
            )
        n_actions = self.model_queries_per_batch / self.sequences_batch_size
        while len(actions) < n_actions:
            action = []
            for pos in range(self.seq_len):
                if self._rng.random() < 1 / self.seq_len:
                    action.append(
                        pos_changes[pos][
                            self._rng.integers(len(self.alphabet) - 1)
                        ]
                    )
            if len(action) > 0 and tuple(action) not in actions:
                actions.add(tuple(action))
        return list(actions)

    def pick_action(self, all_measured_seqs):
        """Screen one action batch, move to the acquisition argmax."""
        state = self.state.copy()
        actions = self.sample_actions()
        actions_to_screen = []
        states_to_screen = []
        for i in range(self.model_queries_per_batch // self.sequences_batch_size):
            x = np.zeros((self.seq_len, len(self.alphabet)))
            for action in actions[i]:
                x[action] = 1
            actions_to_screen.append(x)
            mutant = state.copy()
            rows = np.nonzero(x.sum(axis=1))[0]
            mutant[rows] = 0
            mutant[rows, np.argmax(x[rows], axis=1)] = 1
            states_to_screen.append(
                self.alphabet.decode_one(np.argmax(mutant, axis=1).astype(np.int32))
            )
        ensemble_preds = np.asarray(self.model.get_fitness(states_to_screen))
        acq = self.EI if self.method == "EI" else self.UCB
        method_pred = [acq(vals) for vals in ensemble_preds]
        action_ind = int(np.argmax(method_pred))
        # np.std of a scalar == 0.0; reproduced verbatim (reference :177).
        uncertainty = float(np.std(method_pred[action_ind]))
        action = actions_to_screen[action_ind]
        new_state_string = states_to_screen[action_ind]
        self.state = self._string_to_one_hot(new_state_string)
        reward = float(np.mean(ensemble_preds[action_ind]))
        if new_state_string not in all_measured_seqs:
            self.best_fitness = max(self.best_fitness, reward)
            self.memory.store(
                state.ravel(), action.ravel(), reward, self.state.ravel()
            )
        self.num_actions += 1
        return uncertainty, new_state_string, reward

    def Thompson_sample(self, measured_batch):
        """Fitness-weighted (exp(10 f)) sample from the measured batch."""
        weights = np.exp(10 * np.array([x[0] for x in measured_batch]))
        fitnesses = np.cumsum(weights) / np.sum(weights)
        index = int(np.searchsorted(fitnesses, self._rng.uniform()))
        return measured_batch[min(index, len(measured_batch) - 1)][1]

    def propose_sequences(
        self, measured_sequences: pd.DataFrame
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Propose top sequences from this round's screened samples."""
        measured_batch = []
        if self.num_actions == 0:
            self.initialize_data_structures()
        else:
            last_round_num = measured_sequences["round"].max()
            last_batch = measured_sequences[
                measured_sequences["round"] == last_round_num
            ]
            _seqs = last_batch["sequence"].tolist()
            _scores = last_batch["true_score"].tolist()
            last_batch_seqs = _seqs
            if self.recomb_rate > 0 and len(last_batch) > 1:
                last_batch_seqs = self._recombine_population(list(last_batch_seqs))
            for seq in last_batch_seqs:
                if seq in _seqs:
                    measured_batch.append((_scores[_seqs.index(seq)], seq))
                else:
                    measured_batch.append(
                        (float(np.mean(self.model.get_fitness([seq]))), seq)
                    )
            measured_batch = sorted(measured_batch)
            sampled_seq = self.Thompson_sample(measured_batch)
            self.state = self._string_to_one_hot(sampled_seq)

        self.initial_uncertainty = None
        samples = set()
        prev_cost = self.model.cost
        all_measured_seqs = set(measured_sequences["sequence"].tolist())
        while self.model.cost - prev_cost < self.model_queries_per_batch:
            uncertainty, new_state_string, _ = self.pick_action(all_measured_seqs)
            all_measured_seqs.add(new_state_string)
            samples.add(new_state_string)
            if self.initial_uncertainty is None:
                self.initial_uncertainty = uncertainty
            if uncertainty > 2 * self.initial_uncertainty and measured_batch:
                sampled_seq = self.Thompson_sample(measured_batch)
                self.state = self._string_to_one_hot(sampled_seq)
                self.initial_uncertainty = None

        if len(samples) < self.sequences_batch_size:
            samples.update(
                generate_random_sequences(
                    self.seq_len,
                    self.sequences_batch_size - len(samples),
                    self.alphabet,
                    rng=self._rng,
                )
            )
        samples = list(samples)
        preds = np.mean(np.asarray(self.model.get_fitness(samples)), axis=1)
        self.train_models()

        return samples, preds


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
        eval_batch_size: int = 4096,
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

    def _posterior_over_space(self):
        """(mu, sigma) over the fully enumerated space, batched on device."""
        n = self.alphabet_len**self.seq_len
        digits = np.array(
            list(itertools.product(range(self.alphabet_len), repeat=self.seq_len)),
            dtype=np.int32,
        )
        seqs = self.alphabet.decode(digits)

        mus = np.empty(n)
        sigmas = np.zeros(n)
        for i in range(0, n, self.eval_batch_size):
            chunk = seqs[i : i + self.eval_batch_size]
            preds = np.asarray(self.model.get_fitness(chunk))
            if preds.ndim == 2:  # identity-combine ensemble: per-member cols
                mus[i : i + len(chunk)] = preds.mean(axis=1)
                sigmas[i : i + len(chunk)] = preds.std(axis=1)
            else:
                mus[i : i + len(chunk)] = preds
        return seqs, mus, sigmas

    def propose_sequences_via_thompson(self):
        """Rank by a Gaussian posterior sample."""
        print("Enumerating all sequences in the space.")
        seqs, mus, sigmas = self._posterior_over_space()
        scores = self._rng.normal(mus, np.maximum(sigmas, 1e-12))
        order = np.argsort(scores)[::-1]
        return [[scores[i], seqs[i]] for i in order]

    def propose_sequences_via_greedy(self):
        """Rank by the posterior mean."""
        print("Enumerating all sequences in the space.")
        seqs, mus, _ = self._posterior_over_space()
        order = np.argsort(mus)[::-1]
        return [[mus[i], seqs[i]] for i in order]

    def propose_sequences_via_ucb(self):
        """Rank by mu + 0.01 sigma."""
        print("Enumerating all sequences in the space.")
        seqs, mus, sigmas = self._posterior_over_space()
        scores = mus + 0.01 * sigmas
        order = np.argsort(scores)[::-1]
        return [[scores[i], seqs[i]] for i in order]

    def propose_sequences(
        self, measured_sequences: pd.DataFrame
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Propose the top unmeasured sequences of the ranked space."""
        seq_proposal_funcs = {
            "Greedy": self.propose_sequences_via_greedy,
            "Thompson": self.propose_sequences_via_thompson,
            "UCB": self.propose_sequences_via_ucb,
        }
        new_seqs = seq_proposal_funcs[self.seq_proposal_method]()
        all_measured_seqs = set(measured_sequences["sequence"].values)

        new_states, new_fitnesses = [], []
        i = 0
        while len(new_states) < self.sequences_batch_size and i < len(new_seqs):
            new_fitness, new_seq = new_seqs[i]
            if new_seq not in all_measured_seqs:
                if new_fitness >= self.best_fitness:
                    self.top_sequence.append(
                        (new_fitness, new_seq, self.model.cost)
                    )
                    self.best_fitness = new_fitness
                all_measured_seqs.add(new_seq)
                new_states.append(new_seq)
                new_fitnesses.append(new_fitness)
            i += 1

        print("Current best fitness:", self.best_fitness)
        return new_states, np.array(new_fitnesses)
