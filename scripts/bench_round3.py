"""Round-3 TPU benchmarks: CbAS latency + mutative DynaPPO 3MSI.

  * CbAS: fused DeviceCbASNAM on 3MSI at the paper config — VERDICT r2
    weak #3 measured ~40 s/run; target <= ~12 s with the 3MSI score band
    unchanged (0.979/0.981).
  * DynaPPOMutative: fused runner on 3MSI, paper config, 5 starts —
    target >= the reference DynaPPO row (0.934 mean / 0.972 best).

Run: python scripts/bench_round3.py [--cbas-only|--mutative-only]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_cbas(starts_n: int, algo: str = "cbas"):
    import flexs_tpu as flexs
    from flexs_tpu.landscapes import rosetta
    from flexs_tpu.runtime import DeviceCbASNAM

    problem = rosetta.registry()["3msi"]
    landscape = rosetta.RosettaFolding(**problem["params"])
    starts = list(problem["starts"].items())[:starts_n]
    scores, times = [], []
    for name, seq in starts:
        runner = DeviceCbASNAM(
            landscape,
            flexs.AAS,
            rounds=10,
            sequences_batch_size=100,
            model_queries_per_batch=2000,
            starting_sequence=seq,
            algo=algo,
            model="perfect",
        )
        t0 = time.time()
        df, _ = runner.run(verbose=False)
        first = time.time() - t0
        t0 = time.time()
        df, _ = runner.run(verbose=False)
        steady = time.time() - t0
        top = df["true_score"].max()
        scores.append(top)
        times.append(steady)
        print(f"  cbas {name}: max {top:.3f} (first {first:.1f}s, steady {steady:.1f}s)")
    print(
        f"fused {algo}: mean max {np.mean(scores):.3f}, steady "
        f"{np.mean(times):.1f}s/run  [r2: ~40 s/run, band 0.979/0.981]"
    )


def bench_mutative(starts_n: int):
    import flexs_tpu as flexs
    from flexs_tpu.landscapes import rosetta
    from flexs_tpu.runtime import DeviceDynaPPOMutativeNAM

    problem = rosetta.registry()["3msi"]
    landscape = rosetta.RosettaFolding(**problem["params"])
    starts = list(problem["starts"].items())[:starts_n]
    scores, times = [], []
    for name, seq in starts:
        runner = DeviceDynaPPOMutativeNAM(
            landscape,
            flexs.AAS,
            rounds=10,
            sequences_batch_size=100,
            model_queries_per_batch=2000,
            starting_sequence=seq,
            model="perfect",
        )
        t0 = time.time()
        df, _ = runner.run(verbose=False)
        dt = time.time() - t0
        top = df["true_score"].max()
        scores.append(top)
        times.append(dt)
        print(f"  dynappo-mutative {name}: max {top:.3f} ({dt:.1f}s)")
    print(
        f"fused dynappo-mutative: mean max {np.mean(scores):.3f} best "
        f"{np.max(scores):.3f} ({np.mean(times):.1f}s/run)  "
        f"[ref DynaPPO row 0.934/0.972]"
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--starts", type=int, default=5)
    parser.add_argument("--cbas-only", action="store_true")
    parser.add_argument("--mutative-only", action="store_true")
    args = parser.parse_args()
    if not args.mutative_only:
        bench_cbas(min(args.starts, 2))
    if not args.cbas_only:
        bench_mutative(args.starts)


if __name__ == "__main__":
    main()
