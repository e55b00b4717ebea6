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
from flexs_tpu.ops.pallas_duplex import _pallas_duplex_batch

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
    def gather_path(tokens):
        return jax.vmap(lambda s: rd._duplex_dp(s, target_rev, em, params.maxloop))(
            tokens
        )

    @jax.jit
    def slab_path(tokens):
        return rd.duplex_energy_from_slabs(tokens, target_rev, em, params.maxloop)

    def pallas_path(tokens, group=64):
        return _pallas_duplex_batch(
            tokens, target_rev, em, params.maxloop, False, group
        )

    # Slab precompute alone, reduced to a scalar so the host fetch is tiny.
    @jax.jit
    def slabs_only(tokens):
        return jnp.sum(rd.build_slabs(tokens, target_rev, em))

    for L1 in (14, 100):
        for B in (512, 4096):
            tokens = jnp.asarray(
                rng.integers(0, 4, size=(B, L1), dtype=np.int32)
            )
            t_g = bench(gather_path, tokens)
            t_s = bench(slab_path, tokens)
            row = (
                f"L{L1} B{B}: gather {t_g*1e3:8.2f} ms ({B/t_g:9.0f} seq/s)"
                f" | slab-xla {t_s*1e3:8.2f} ms ({B/t_s:9.0f} seq/s)"
            )
            if jax.default_backend() == "tpu":
                t_pre = bench(slabs_only, tokens)
                row += f" [slab build {t_pre*1e3:.2f} ms]"
                for grp in (64, 128, 256):
                    if grp > B:
                        continue
                    t_pal = bench(lambda t: pallas_path(t, grp), tokens)
                    row += (
                        f" | pallas/g{grp} {t_pal*1e3:8.2f} ms"
                        f" ({B/t_pal:9.0f} seq/s)"
                    )
            print(row, flush=True)


if __name__ == "__main__":
    main()
