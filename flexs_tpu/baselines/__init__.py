"""Baseline models and explorers."""
from flexs_tpu.baselines import explorers, models  # noqa: F401
