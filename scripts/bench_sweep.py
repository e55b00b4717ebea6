"""Sweep benchmark: many full Adalead+NAM experiments as one device program.

Measures the robustness-evaluator grid (landscapes x starts x signal
strengths, 10 rounds x batch 100 x 2000 queries each) through the sharded
sweep engine and reports seqs/sec/chip against the measured single-run
reference baseline (BASELINE_MEASURED.json).

    python scripts/bench_sweep.py --landscapes 40 --ss 5
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--landscapes", type=int, default=40)
    parser.add_argument("--starts", type=int, default=1)
    parser.add_argument("--ss", type=int, default=5)
    parser.add_argument("--chunk", type=int, default=40)
    args = parser.parse_args()

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from flexs_tpu.landscapes import tf_binding
    from flexs_tpu.parallel import run_robustness_sweep

    names, _ = tf_binding._packed_tables()
    names = names[: args.landscapes]
    starts = tf_binding.STARTS[: args.starts]
    ss = [0.0, 0.5, 0.75, 0.9, 1.0][: args.ss]
    mesh = (
        Mesh(np.array(jax.devices()), ("cells",))
        if len(jax.devices()) > 1
        else None
    )

    # Warmup compile on one chunk.
    run_robustness_sweep(
        landscape_names=names[:1],
        starts=starts[:1],
        signal_strengths=ss,
        chunk_size=args.chunk,
        mesh=mesh,
    )

    t0 = time.time()
    df = run_robustness_sweep(
        landscape_names=names,
        starts=starts,
        signal_strengths=ss,
        chunk_size=args.chunk,
        mesh=mesh,
    )
    wall = time.time() - t0
    seqs = int(df["model_cost"].sum() + df["landscape_cost"].sum())

    baseline_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            vs = (seqs / wall) / json.load(f)["seqs_per_sec"]

    print(
        json.dumps(
            {
                "metric": "robustness_sweep_seqs_per_sec_per_chip",
                "cells": len(df),
                "value": round(seqs / wall / max(1, len(jax.devices())), 1),
                "unit": "seqs/sec/chip",
                "vs_baseline": round(vs, 2) if vs else None,
                "wall_clock_s": round(wall, 1),
                "mean_max_fitness": round(float(df["max_fitness"].mean()), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
