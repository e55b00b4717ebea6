"""Quantify the fused-runner density deviation: Hamming vs exact Levenshtein.

The fused DynaPPO(+Mutative) runners keep the density radius on packed
Hamming distance (runtime/dyna_ppo_runner.py documents why: the mutative
walk pays one density lookup per mutation step and an exact banded DP
costs ~20x per lookup), while the host env computes the reference's exact
`editdistance.eval` radius (ops.hamming.banded_edit_distance_matrix).
For the EQUAL-LENGTH sequences every FLEXS problem generates, Levenshtein
<= Hamming, and they disagree inside the <=2 radius only when a pair is
related by a block shift (one insertion + one deletion re-aligns a run).

This script measures how often that actually happens on the walk/batch
structures the runners generate: point-substitution mutation walks (the
Mutative episode process) and batched constructive samples, on the two
alphabet regimes that bracket the benchmarks (RNA L=14, the most
repetitive/shift-prone case, and protein L=66 = 3MSI).  For each pool it
counts pairs whose density WEIGHT class differs, i.e. where
(0 < d <= 2, and which d) disagrees between the two metrics — exactly
the term the reward would get wrong.

CPU-only (forces jax_platforms=cpu); run anywhere.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from flexs_tpu.ops.hamming import banded_edit_distance_matrix  # noqa: E402


def hamming_matrix(a, b):
    return (a[:, None, :] != b[None, :, :]).sum(-1)


def pool(kind, alpha, L, n, rng):
    if kind == "walk":
        start = rng.integers(0, alpha, L)
        out = [start.copy()]
        cur = start.copy()
        while len(out) < n:
            cur = cur.copy()
            cur[rng.integers(L)] = rng.integers(alpha)
            out.append(cur.copy())
        return np.array(out, dtype=np.int32)
    # constructive batches: fresh samples biased toward a PWM (repetitive)
    logits = rng.normal(size=(L, alpha)) * 2.0
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return np.array(
        [[rng.choice(alpha, p=p[i]) for i in range(L)] for _ in range(n)],
        dtype=np.int32,
    )


def weight_class(d):
    """Density weight bucket: 0 (outside radius) or the 1/d class."""
    return np.where((d > 0) & (d <= 2), d, 0)


def main():
    rng = np.random.default_rng(0)
    n = 512
    print(f"{'pool':>28} {'pairs':>9} {'lev<ham<=2':>10} {'class-diff':>10} {'rate':>9}")
    for label, alpha, L, kind in (
        ("RNA L=14 mutation walk", 4, 14, "walk"),
        ("RNA L=100 mutation walk", 4, 100, "walk"),
        ("protein L=66 mutation walk", 20, 66, "walk"),
        ("RNA L=14 constructive", 4, 14, "pwm"),
        ("protein L=66 constructive", 20, 66, "pwm"),
    ):
        seqs = pool(kind, alpha, L, n, rng)
        ham = hamming_matrix(seqs, seqs)
        lev = np.asarray(banded_edit_distance_matrix(seqs, seqs, band=2))
        iu = np.triu_indices(n, k=1)
        h, le = ham[iu], lev[iu]
        # lev is saturated at 3; compare weight classes inside the radius
        diff = weight_class(np.minimum(h, 3)) != weight_class(le)
        tighter = ((le <= 2) & (le > 0) & (h > 2)).sum()
        print(
            f"{label:>28} {len(h):>9} {tighter:>10} {diff.sum():>10} "
            f"{diff.mean():>9.2e}"
        )


if __name__ == "__main__":
    main()
