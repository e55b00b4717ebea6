"""Throughput of the Turner-structured Zuker MFE DP (ops/rna_fold.py).

Completes the round-4 RNAFolding record (BASELINE.md fidelity row): the
fidelity work is test-pinned, this measures the device DP's speed.  The
reference oracle is ViennaRNA's `RNA.fold` (reference rna.py:26), a
single-threaded C Zuker implementation typically good for ~1-3k folds/s
per core at L=100; the rebuild batches the whole DP as [B] vmapped
diagonal scans so the only roofline that matters is on-device min-plus
work.

Relay-safe timing (CLAUDE.md): warmup compile first, then amortize
`np.asarray` fetches over reps.

Usage:  python scripts/bench_fold.py [--cpu] [--batch 512] [--length 100]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument(
        "--length", type=int, default=None,
        help="single length; default measures L=50 and L=100 (the "
        "BASELINE.md row wants both)",
    )
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flexs_tpu.ops import rna_fold
    from flexs_tpu.utils.profiling import amortized_seconds_per_call

    em = rna_fold.fold_energy_model()
    rng = np.random.default_rng(0)
    for length in [args.length] if args.length else [50, 100]:
        tokens = jnp.asarray(
            rng.integers(0, 4, (args.batch, length)).astype(np.int32)
        )
        tokens = jax.device_put(tokens)

        t0 = time.time()
        out = rna_fold.zuker_mfe_batch(tokens, em)
        first = np.asarray(out)
        t_first = time.time() - t0
        print(f"L={length} first call (compile+exec): {t_first:.1f} s; "
              f"mean MFE {first.mean():.3f} kcal/mol", flush=True)

        # Steady state: pipeline reps, fetch ONCE at the end (the
        # per-fetch ~10-20 ms relay floor would otherwise dominate).
        walls = [
            amortized_seconds_per_call(
                rna_fold.zuker_mfe_batch, tokens, em, reps=args.reps
            )
            for _ in range(3)
        ]
        med = sorted(walls)[1]
        print(
            f"B={args.batch} L={length}: {med*1e3:.1f} ms/batch median "
            f"(spread {min(walls)*1e3:.1f}-{max(walls)*1e3:.1f}) = "
            f"{args.batch/med:,.0f} seqs/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
