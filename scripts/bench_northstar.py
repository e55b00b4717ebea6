"""North-star benchmark: EVERY fused explorer family x ALL TF-Bind-8 landscapes.

BASELINE.json's north-star target is literally "run all baseline explorers
over the 158 TF-Bind-8 landscapes ... with >=50x wall-clock speedup" (the
shipped data directory actually carries 200 landscape TSVs; the reference
README calls it "158 landscapes", reference README.md:96).  The reference
executes that grid as independent cloud-VM processes, one explorer run per
process (reference paper_code/cloud/runner.py); this script executes it as
twelve sharded device sweeps — one per fused explorer family — on however
many chips the default mesh has.

Per family it reports warm wall-clock (compile amortized via a same-shaped
warmup chunk, the `bench.py` methodology), sequences scored/sec, and the
quality distribution over the full landscape grid; the summary line compares
total throughput against the measured single-core reference baseline
(BASELINE_MEASURED.json, 3,068 seqs/s on the Adalead headline config).

    python scripts/bench_northstar.py                      # all 12 families
    python scripts/bench_northstar.py --families adalead random --cpu
    python scripts/bench_northstar.py --full-robustness    # adalead x 5 ss
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = [
    "random",
    "adalead",
    "ga",
    "cmaes",
    "bo",
    "gpr_bo",
    "dqn",
    "ppo",
    "dynappo",
    "dynappo_mutative",
    "cbas",
    "dbas",
]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--families", nargs="+", default=FAMILIES,
                        choices=FAMILIES)
    parser.add_argument("--landscapes", type=int, default=0,
                        help="0 = all shipped TF-Bind-8 landscapes")
    parser.add_argument("--ss", type=float, nargs="+", default=[0.9],
                        help="NoisyAbstractModel signal strengths per cell")
    parser.add_argument("--rounds", type=int, default=10)
    parser.add_argument("--batch", type=int, default=100)
    parser.add_argument("--queries", type=int, default=2000)
    parser.add_argument("--chunk", type=int, default=40)
    parser.add_argument(
        "--cell-mode", default="auto", choices=["auto", "vmap", "map"],
        help="per-shard cell schedule (parallel/sweep.py): 'map' runs "
        "cells sequentially via lax.map — the workaround for families "
        "whose vmapped sweep program crashes the relay's TPU worker "
        "(observed for dqn/dynappo_mutative at chunks 40 AND 10, while "
        "their single-run programs and CPU-mesh sweeps are fine)",
    )
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--full-robustness", action="store_true",
        help="also run the flagship full robustness grid: adalead x all "
        "landscapes x the reference's 5 signal strengths (evaluate.py:11)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import Mesh

    from flexs_tpu.landscapes import tf_binding
    from flexs_tpu.parallel import run_robustness_sweep

    names, _ = tf_binding._packed_tables()
    if args.landscapes:
        names = names[: args.landscapes]
    starts = tf_binding.STARTS[:1]
    mesh = (
        Mesh(np.array(jax.devices()), ("cells",))
        if len(jax.devices()) > 1
        else None
    )

    baseline_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    base_sps = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base_sps = json.load(f)["seqs_per_sec"]

    def sweep(family, land_names, ss):
        return run_robustness_sweep(
            landscape_names=land_names,
            starts=starts,
            signal_strengths=ss,
            rounds=args.rounds,
            sequences_batch_size=args.batch,
            model_queries_per_batch=args.queries,
            chunk_size=args.chunk,
            mesh=mesh,
            algorithm=family,
            cell_mode=args.cell_mode,
        )

    grids = [(f, args.ss) for f in args.families]
    if args.full_robustness:
        grids.append(("adalead", [0.0, 0.5, 0.75, 0.9, 1.0]))

    mesh_size = mesh.devices.size if mesh is not None else 1

    def warm(family, ss):
        # Warm the EXACT program shape the timed run dispatches, else the
        # timed wall-clock silently includes a fresh compile.  The sweep
        # engine rounds chunk_size up to a mesh multiple and pads every
        # tail chunk to chunk_size, so: a grid larger than one chunk only
        # ever dispatches C-cell programs; a grid of n <= C cells is one
        # exact n-cell dispatch.
        n_total = len(names) * len(ss)
        c = -(-args.chunk // mesh_size) * mesh_size
        if n_total <= c:
            sweep(family, names, ss)  # identical single-dispatch shape
            return
        k, rem = divmod(c, len(ss))
        # k+1 names overflow one chunk, so the tail pads back to exactly
        # c cells — both dispatches hit the timed run's jit entry.
        sweep(family, names[: k + (1 if rem else 0)], ss)

    total_seqs, total_wall, lines = 0, 0.0, []
    for family, ss in grids:
        warm(family, ss)

        t0 = time.time()
        df = sweep(family, names, ss)
        wall = time.time() - t0
        seqs = int(df["model_cost"].sum() + df["landscape_cost"].sum())
        total_seqs += seqs
        total_wall += wall
        line = {
            "family": family,
            "signal_strengths": ss,
            "cells": len(df),
            "wall_s": round(wall, 2),
            "seqs": seqs,
            "seqs_per_sec": round(seqs / wall, 1),
            "mean_max_fitness": round(float(df["max_fitness"].mean()), 4),
            "min_max_fitness": round(float(df["max_fitness"].min()), 4),
        }
        lines.append(line)
        print(json.dumps(line), flush=True)

    summary = {
        "metric": "northstar_all_explorers_all_landscapes",
        "landscapes": len(names),
        "families": len(args.families),
        "total_cells": int(sum(l["cells"] for l in lines)),
        "total_seqs": total_seqs,
        "total_wall_s": round(total_wall, 2),
        "seqs_per_sec": round(total_seqs / total_wall, 1),
        "n_devices": len(jax.devices()),
        "vs_baseline": (
            round(total_seqs / total_wall / base_sps, 2) if base_sps else None
        ),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
