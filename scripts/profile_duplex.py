"""Profile the RNA duplex oracle: XLA scan vs Pallas kernel (VERDICT #2).

Timing methodology per CLAUDE.md: `.block_until_ready()` does not block
through the remote TPU relay, so every measurement pipelines N calls and
fetches one scalar with `np.asarray` at the end; per-call time is the
amortized wall clock.  Data stays device-resident between calls.

Prints a table: (problem size, path) -> seqs/sec, plus the per-call
dispatch floor measured with a trivial jitted op.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flexs_tpu.ops import rna_duplex as rd
from flexs_tpu.ops.pallas_duplex import _pallas_duplex_batch, _precompute_slabs

TARGET_L2 = 100
REPS = 20


def bench(fn, *args, reps=REPS):
    """Amortized seconds/call: pipeline `reps` dependent calls, fetch once."""
    out = fn(*args)
    np.asarray(out)  # compile + settle
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    params = rd.DuplexParams.calibrated()
    em = params.energy_model()
    target = rng.integers(0, 4, TARGET_L2, dtype=np.int32)
    target_rev = jnp.asarray(target)[::-1]

    # Dispatch floor: a trivial jitted op, same methodology.
    trivial = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128), jnp.float32)
    floor = bench(trivial, x0)
    print(f"dispatch floor (trivial jit): {floor * 1e3:.2f} ms", flush=True)

    @jax.jit
    def xla_path(tokens):
        return jax.vmap(lambda s: rd._duplex_dp(s, target_rev, em, params.maxloop))(
            tokens
        )

    def pallas_path(tokens):
        return _pallas_duplex_batch(
            tokens, target_rev, em, params.maxloop, False
        )

    # Slab precompute alone (to split the pallas cost).
    @jax.jit
    def slabs_only(tokens):
        return _precompute_slabs(tokens, target_rev, em)

    for L1 in (14, 100):
        for B in (512, 4096):
            tokens = jnp.asarray(
                rng.integers(0, 4, size=(B, L1), dtype=np.int32)
            )
            t_xla = bench(xla_path, tokens)
            row = f"L{L1} B{B}: xla {t_xla*1e3:8.2f} ms ({B/t_xla:9.0f} seq/s)"
            if jax.default_backend() == "tpu":
                t_pal = bench(pallas_path, tokens)
                t_slab = bench(slabs_only, tokens)
                row += (
                    f" | pallas {t_pal*1e3:8.2f} ms ({B/t_pal:9.0f} seq/s)"
                    f" [slabs {t_slab*1e3:.2f} ms] | speedup {t_xla/t_pal:.2f}x"
                )
            print(row, flush=True)


if __name__ == "__main__":
    main()
