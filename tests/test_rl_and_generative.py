"""Tests for replay buffers, the VAE generator, DQN, and CbAS/DbAS.

Mirrors the reference smoke coverage (tests/test_explorers.py:84-128) plus
behavioral checks on PER sampling and VAE training that the reference lacks
(SURVEY.md §4).
"""
import numpy as np
import pytest

import flexs_tpu as flexs
from flexs_tpu.utils.replay_buffers import PrioritizedReplayBuffer, ReplayBuffer
from flexs_tpu.utils.vae import VAE, pwm_to_boltzmann_weights

ROUNDS = 3
BATCH = 5
QUERIES = 20
START = "TTGCAGCA"


class FakeModel(flexs.Model):
    def __init__(self):
        super().__init__(name="FakeModel")
        self.rng = np.random.default_rng(1)

    def train(self, *args):
        pass

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


class FakeLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="FakeLandscape")
        self.rng = np.random.default_rng(0)

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


# -- replay buffers ---------------------------------------------------------


def test_replay_buffer_ring_semantics():
    buf = ReplayBuffer(obs_dim=4, size=8, batch_size=4, seed=0)
    for i in range(12):
        buf.store(np.full(4, i), np.zeros(4), float(i), np.full(4, i + 1))
    assert len(buf) == 8
    batch = buf.sample_batch()
    assert batch["obs"].shape == (4, 4)
    # Oldest entries (0..3) were overwritten.
    assert batch["rews"].min() >= 4


def test_per_prefers_high_priority():
    buf = PrioritizedReplayBuffer(obs_dim=2, size=64, batch_size=16, alpha=1.0, seed=0)
    for i in range(64):
        buf.store(np.zeros(2), np.zeros(2), float(i), np.zeros(2))
    # Give index 7 overwhelming priority.
    buf.update_priorities(np.arange(64), np.full(64, 1e-3))
    buf.update_priorities([7], [1e3])
    counts = 0
    for _ in range(10):
        batch = buf.sample_batch(beta=0.4)
        counts += (batch["indices"] == 7).sum()
    assert counts > 100  # 160 draws, nearly all should hit index 7


def test_per_weights_normalized():
    buf = PrioritizedReplayBuffer(obs_dim=2, size=32, batch_size=8, seed=0)
    for i in range(32):
        buf.store(np.zeros(2), np.zeros(2), float(i), np.zeros(2))
    batch = buf.sample_batch(beta=0.5)
    assert (batch["weights"] <= 1.0 + 1e-9).all()
    assert (batch["weights"] > 0).all()


# -- VAE --------------------------------------------------------------------


def test_pwm_to_boltzmann_weights_normalized():
    pwm = np.random.default_rng(0).random((4, 8))
    w = pwm_to_boltzmann_weights(pwm, temp=0.5)
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-9)
    # Low temperature concentrates on the max.
    w_cold = pwm_to_boltzmann_weights(pwm, temp=1e-4)
    assert (w_cold.max(axis=0) > 0.999).all()


def _make_vae(**kw):
    return VAE(
        seq_length=8,
        alphabet=flexs.DNAA,
        batch_size=10,
        latent_dim=2,
        intermediate_dim=32,
        epochs=3,
        verbose=False,
        seed=0,
        **kw,
    )


def test_vae_train_and_generate():
    vae = _make_vae()
    rng = np.random.default_rng(0)
    from flexs_tpu.utils import sequence_utils as s_utils

    samples = list(
        dict.fromkeys(s_utils.generate_random_sequences(8, 60, flexs.DNAA, rng=rng))
    )
    vae.train_model(samples, np.ones(len(samples)))
    proposals = vae.generate(20, samples, np.ones(len(samples)))
    assert len(proposals) == 20
    assert len(set(proposals)) == 20
    assert not set(proposals) & set(samples)


def test_vae_log_probability_finite_and_snapshot_consistent():
    vae = _make_vae()
    seqs = ["ACGTACGT", "TTTTTTTT", "GGGGCCCC"]
    snapshot = vae.get_weights()
    lp_now = vae.calculate_log_probability(seqs)
    lp_snap = vae.calculate_log_probability(seqs, vae=snapshot)
    assert np.isfinite(lp_now).all()
    np.testing.assert_allclose(lp_now, lp_snap)


# -- explorers --------------------------------------------------------------


def _run(explorer):
    df, _ = explorer.run(FakeLandscape(), verbose=False)
    assert df["round"].max() == ROUNDS
    for r in range(1, ROUNDS + 1):
        assert 0 < len(df[df["round"] == r]) <= BATCH
    return df


def test_dqn_smoke():
    _run(
        flexs.baselines.explorers.DQN(
            FakeModel(),
            rounds=ROUNDS,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            starting_sequence=START,
            alphabet=flexs.DNAA,
            seed=0,
        )
    )


@pytest.mark.parametrize("algo", ["cbas", "dbas"])
def test_cbas_dbas_smoke(algo):
    _run(
        flexs.baselines.explorers.CbAS(
            FakeModel(),
            _make_vae(),
            rounds=ROUNDS,
            starting_sequence=START,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            alphabet=flexs.DNAA,
            algo=algo,
            cycle_batch_size=10,
            seed=0,
        )
    )


def test_cbas_invalid_algo_raises():
    with pytest.raises(ValueError):
        flexs.baselines.explorers.CbAS(
            FakeModel(),
            _make_vae(),
            rounds=ROUNDS,
            starting_sequence=START,
            sequences_batch_size=BATCH,
            model_queries_per_batch=QUERIES,
            alphabet=flexs.DNAA,
            algo="bogus",
        )
