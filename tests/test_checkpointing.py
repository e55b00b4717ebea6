"""Checkpoint/resume and profiling-hook tests (subsystems absent upstream)."""
import numpy as np
import pandas as pd

import flexs_tpu as flexs
from flexs_tpu.utils import checkpointing, profiling


class FakeLandscape(flexs.Landscape):
    def __init__(self):
        super().__init__(name="FakeLandscape")
        self.rng = np.random.default_rng(0)

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


class FakeModel(flexs.Model):
    def __init__(self):
        super().__init__(name="FakeModel")
        self.rng = np.random.default_rng(1)

    def train(self, *args):
        pass

    def _fitness_function(self, sequences):
        return self.rng.random(size=len(sequences))


def _explorer(rounds=4, log_file=None):
    return flexs.baselines.explorers.Random(
        FakeModel(),
        rounds=rounds,
        sequences_batch_size=5,
        model_queries_per_batch=20,
        starting_sequence="TTGCAGCA",
        alphabet=flexs.DNAA,
        seed=0,
        log_file=log_file,
    )


def test_save_load_run_roundtrip(tmp_path):
    df = pd.DataFrame(
        {
            "sequence": ["AAAA", "TTTT"],
            "model_score": [np.nan, 0.5],
            "true_score": [0.1, 0.9],
            "round": [0, 1],
            "model_cost": [0, 10],
            "measurement_cost": [1, 2],
        }
    )
    meta = {"exp_name": "x", "rounds": 1}
    path = str(tmp_path / "run.csv")
    checkpointing.save_run(path, df, meta)
    df2, meta2 = checkpointing.load_run(path)
    assert meta2 == meta
    assert list(df2["sequence"]) == ["AAAA", "TTTT"]


def test_resume_continues_partial_run(tmp_path):
    log = str(tmp_path / "run.csv")
    # A 2-round run writes its log...
    partial = _explorer(rounds=2, log_file=log)
    partial.run(FakeLandscape(), verbose=False)
    df_partial, _ = checkpointing.load_run(log)
    assert df_partial["round"].max() == 2

    # ...then a 4-round explorer resumes from it.
    full = _explorer(rounds=4)
    df, _ = checkpointing.resume_explorer(full, FakeLandscape(), log, verbose=False)
    assert df["round"].max() == 4
    # The first two rounds' rows are preserved byte-for-byte.
    pd.testing.assert_frame_equal(df.iloc[: len(df_partial)], df_partial)


def test_resume_noop_when_complete(tmp_path):
    log = str(tmp_path / "run.csv")
    done = _explorer(rounds=2, log_file=log)
    df1, _ = done.run(FakeLandscape(), verbose=False)
    df2, _ = checkpointing.resume_explorer(
        _explorer(rounds=2), FakeLandscape(), log, verbose=False
    )
    pd.testing.assert_frame_equal(
        df1.reset_index(drop=True), df2.reset_index(drop=True)
    )


def test_save_load_state_pytree(tmp_path):
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": np.int32(7)}
    path = str(tmp_path / "ckpt")
    checkpointing.save_state(path, state)
    restored = checkpointing.load_state(path)
    np.testing.assert_array_equal(restored["w"], state["w"])
    assert int(restored["step"]) == 7


def test_round_timer_accumulates():
    timer = profiling.RoundTimer()
    with timer.measure("train"):
        pass
    with timer.measure("train"):
        pass
    with timer.measure("propose"):
        pass
    summary = timer.summary()
    assert set(summary) == {"train", "propose"}
    assert summary["train"] >= 0


def test_resume_rejects_foreign_log(tmp_path):
    """Resuming over a log written by a DIFFERENT experiment must raise."""
    import pytest

    log = str(tmp_path / "run.csv")
    partial = _explorer(rounds=2, log_file=log)
    partial.run(FakeLandscape(), verbose=False)
    other = flexs.baselines.explorers.Random(
        FakeModel(),
        rounds=4,
        sequences_batch_size=7,  # different batch size = different run
        model_queries_per_batch=20,
        starting_sequence="TTGCAGCA",
        alphabet=flexs.DNAA,
        seed=0,
    )
    with pytest.raises(ValueError, match="DIFFERENT experiment"):
        checkpointing.resume_explorer(other, FakeLandscape(), log, verbose=False)


def test_resume_fresh_run_creates_log_dir(tmp_path):
    """A fresh resume_explorer run makedirs for a nested log path."""
    log = str(tmp_path / "nested" / "dir" / "run.csv")
    df, _ = checkpointing.resume_explorer(
        _explorer(rounds=1), FakeLandscape(), log, verbose=False
    )
    assert df["round"].max() == 1
    df2, _ = checkpointing.load_run(log)
    assert len(df2) == len(df)
