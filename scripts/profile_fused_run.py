"""Profile the fused single-run latency floor (VERDICT #9).

The fused Adalead+NAM run is ONE device program, so its ~0.26 s floor is
on-device: either per-while-iteration overhead, the cache-distance work
that grows with capacity, or something else.  This script separates the
suspects empirically (relay-safe amortized timing):

  * wall clock vs model-query budget at fixed capacity (per-iteration cost)
  * wall clock vs rounds (capacity scales with rounds -> capacity cost)
  * a bare while_loop with the same iteration count (control-flow floor)

Optionally captures a jax profiler trace (--trace DIR) for op-level
attribution when the backend supports it.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--trace", default=None)
    args = parser.parse_args()

    import flexs_tpu as flexs
    from flexs_tpu.runtime.jit_runner import AdaleadConfig, run_adalead_nam

    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])
    fitness_fn, fitness_params = landscape.device_fitness()
    start = jnp.asarray(
        flexs.alphabet.as_alphabet(flexs.DNAA).encode_one(problem["starts"][0])
    )
    key = jax.random.PRNGKey(0)

    print("backend:", jax.default_backend(), flush=True)

    # Control: bare while_loop iteration floor.
    @jax.jit
    def bare_while(n):
        def body(c):
            i, x = c
            return i + 1, x * 1.000001

        return jax.lax.while_loop(lambda c: c[0] < n, body, (0, jnp.float32(1.0)))

    for n in (200, 2000, 20000):
        t = bench(bare_while, jnp.int32(n))
        print(f"bare while x{n}: {t*1e3:8.2f} ms ({t/n*1e6:.1f} us/iter)", flush=True)

    def run(cfg):
        return run_adalead_nam(fitness_fn, fitness_params, start, cfg, 0.9, key)

    print("\nwall vs budget (rounds=10, B=100):", flush=True)
    for budget in (500, 1000, 2000, 4000):
        cfg = AdaleadConfig(
            rounds=10, sequences_batch_size=100,
            model_queries_per_batch=budget, alphabet_size=4,
        )
        t = bench(run, cfg)
        iters = 10 * budget // 100
        print(
            f"  budget {budget}: {t*1e3:8.1f} ms (~{iters} scoring iters, "
            f"{t/iters*1e6:.0f} us/iter)",
            flush=True,
        )

    print("\nwall vs rounds (budget=2000, B=100):", flush=True)
    for rounds in (1, 2, 5, 10):
        cfg = AdaleadConfig(
            rounds=rounds, sequences_batch_size=100,
            model_queries_per_batch=2000, alphabet_size=4,
        )
        t = bench(run, cfg)
        print(
            f"  rounds {rounds}: {t*1e3:8.1f} ms "
            f"({t/rounds*1e3:.1f} ms/round; cache_cap {1 + rounds*2200 + 1})",
            flush=True,
        )

    if args.trace:
        cfg = AdaleadConfig(
            rounds=10, sequences_batch_size=100,
            model_queries_per_batch=2000, alphabet_size=4,
        )
        run(cfg)  # warm
        with jax.profiler.trace(args.trace):
            np.asarray(jax.tree.leaves(run(cfg))[0])
        print("trace written to", args.trace, flush=True)


if __name__ == "__main__":
    main()
