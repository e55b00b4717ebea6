"""Baseline surrogate models (noisy oracles and empirical regressors)."""
from flexs_tpu.baselines.models.noisy_abstract_model import (  # noqa: F401
    NoisyAbstractModel,
)
