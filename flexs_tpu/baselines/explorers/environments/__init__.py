"""Environments for RL-based explorers (PPO, DynaPPO)."""
from flexs_tpu.baselines.explorers.environments.ppo import (  # noqa: F401
    PPOEnvironment,
)
