"""Baseline explorers."""
from flexs_tpu.baselines.explorers.adalead import Adalead  # noqa: F401
from flexs_tpu.baselines.explorers.random import Random  # noqa: F401
