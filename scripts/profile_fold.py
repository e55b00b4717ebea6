"""Localize the Zuker fold DP's cost center (falsification-style A/B).

The shifted-layout rewrite (dd4f175) removed every cross-diagonal V/fML
gather yet measured bit-identical wall-clock (9.59 vs 9.60 s/batch at
B=512 L=50) — so the cost is NOT those gathers.  This probe times
(a) maxloop scaling   — if [P, L] interior-window work dominates, time
    falls ~10x from maxloop=16 (P=153) to maxloop=4 (P=15);
(b) batch scaling     — B-independent time means a serial per-step
    bottleneck, linear means element work;
(c) term deletion     — variants of the span step with one cost center
    removed each (interior windows, multiloop split, last-branch,
    special-hairpin tables), same carry shapes, values don't matter.

    python scripts/profile_fold.py [--cpu] [--batch 512] [--length 50]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, tokens, reps=5):
    from flexs_tpu.utils.profiling import amortized_seconds_per_call

    out = fn(tokens)
    np.asarray(out)  # compile + first exec
    return amortized_seconds_per_call(lambda: fn(tokens), reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--length", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flexs_tpu.ops import rna_fold

    em = rna_fold.fold_energy_model()
    rng = np.random.default_rng(0)
    toks = jnp.asarray(
        rng.integers(0, 4, size=(args.batch, args.length), dtype=np.int32)
    )

    def run(label, fn):
        t = timed(fn, toks, reps=args.reps)
        print(f"{label:<28} {t * 1e3:9.1f} ms/batch", flush=True)
        return t

    # (a) maxloop scaling
    for ml in (16, 8, 4):
        run(
            f"full maxloop={ml}",
            jax.jit(lambda s, ml=ml: rna_fold.zuker_mfe_batch(s, em, maxloop=ml)),
        )

    # (b) batch scaling
    for b in (64, 512):
        sub = toks[:b]
        fn = jax.jit(lambda s: rna_fold.zuker_mfe_batch(s, em))
        t = timed(fn, sub, reps=args.reps)
        print(f"full B={b:<22} {t * 1e3:9.1f} ms/batch", flush=True)

    # (c) term deletion inside the real span step via the module's debug
    # knob (set before trace; each variant retraces).
    for knock in ("interior", "multiloop", "lastbranch", "hairpin_special"):
        rna_fold._PROFILE_KNOCKOUT = knock
        # zuker_mfe is itself jitted; the knob changes the trace invisibly
        # to its cache key, so bust the cache around every setting.
        rna_fold.zuker_mfe.clear_cache()
        try:
            run(
                f"minus {knock}",
                jax.jit(
                    lambda s, k=knock: rna_fold.zuker_mfe_batch(s, em)
                ),
            )
        finally:
            rna_fold._PROFILE_KNOCKOUT = None
            rna_fold.zuker_mfe.clear_cache()


if __name__ == "__main__":
    main()
