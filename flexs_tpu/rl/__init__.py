"""Pure-JAX RL building blocks (PPO) for the RL-based explorers.

The reference delegates its RL stack to TF-Agents (reference ppo.py,
dyna_ppo.py); here the agent is a small Flax actor-critic trained with a
jitted clipped-surrogate PPO update — no framework dependency, and the
act/update steps are single device programs.
"""
from flexs_tpu.rl.ppo import PPOAgent  # noqa: F401
