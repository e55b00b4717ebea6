"""PPO normalization ablation (VERDICT round 1, weak #6).

Round 1 claimed "TF-Agents' hidden normalizers were load-bearing" for the
faithful PPO config (bare Adam 1e-5, no normalization, which plateaus at
0.665 on 3MSI ed_3) without testing it directly.  This script isolates
the two deviations on exactly that benchmark (DynaPPO, default 11-member
ensemble, paper config, 3MSI ed_3 start):

  faithful      lr 1e-5, no observation normalization  (reference's bare agent)
  faithful+norm lr 1e-5, WITH observation normalization (only the normalizer added)
  tuned         lr 3e-4, WITH normalization             (our shipped default)

Reference result on this start: 0.958.

    python scripts/ppo_ablation.py [--rounds 10] [--configs faithful tuned]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "faithful": dict(learning_rate=1e-5, normalize_observations=False),
    "faithful+norm": dict(learning_rate=1e-5, normalize_observations=True),
    "tuned": dict(learning_rate=3e-4, normalize_observations=True),
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", nargs="+", default=list(CONFIGS))
    parser.add_argument("--rounds", type=int, default=10)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flexs_tpu as flexs
    from flexs_tpu.landscapes import rosetta

    problem = rosetta.registry()["3msi"]
    start = problem["starts"]["ed_3_wt"]

    for name in args.configs:
        t0 = time.time()
        landscape = rosetta.RosettaFolding(**problem["params"])
        explorer = flexs.baselines.explorers.DynaPPO(
            landscape,
            rounds=args.rounds,
            sequences_batch_size=100,
            model_queries_per_batch=2000,
            starting_sequence=start,
            alphabet=flexs.AAS,
            env_batch_size=16,
            seed=0,
            agent_kwargs=CONFIGS[name],
        )
        df, _ = explorer.run(landscape, verbose=False)
        print(
            f"{name:<14} max {df['true_score'].max():.3f} "
            f"(reference 0.958)  {time.time() - t0:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
