"""Compile-time breakdown of the heavyweight fused programs (VERDICT r4 #3).

Round-3 record: GPR_BO-surrogate compiles in 418 s, CbAS in 141 s, the
surrogate sweep in 72 s (BASELINE.md).  The persistent compilation cache
does not work through the relay, so every fresh process pays these before
the first result.  This script measures, per program:

  * trace+lower wall time (host CPU),
  * StableHLO text size + rough op count (what crosses the relay),
  * backend compile wall time (`lowered.compile()` — XLA:TPU server side),

for the full programs AND isolated subcomponents, so the dominant cost
center is measured rather than guessed.

Run ONE at a time (only one process can hold the TPU):
    python scripts/profile_compile.py gpr_bo_surrogate cbas ...
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from flexs_tpu.landscapes import tf_binding
from flexs_tpu.runtime import jit_runner, surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import AdaleadConfig, device_run_args


def _measure(name, fn, *args, static_argnames=(), **kwargs):
    jitted = (
        fn
        if isinstance(fn, jax.stages.Wrapped)
        else jax.jit(fn, static_argnames=static_argnames)
    )
    t0 = time.time()
    lowered = jitted.lower(*args, **kwargs)
    t_lower = time.time() - t0
    text = lowered.as_text()
    n_ops = text.count("\n")
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(
        f"{name:40s} lower {t_lower:7.1f}s  compile {t_compile:7.1f}s  "
        f"hlo {len(text)/1e6:6.2f} MB / {n_ops:7d} lines",
        flush=True,
    )
    return t_compile


def _paper_args(model="surrogate", spec=None):
    land = tf_binding.TFBinding(name="SIX6_REF_R1")
    fitness_fn, fitness_params = land.device_fitness()
    start_tokens, ss, key = device_run_args(
        "TGCA", tf_binding.STARTS[0], 1.0, 0
    )
    if spec is None and model == "surrogate":
        spec = surrogate_lib.SurrogateSpec(ensemble_size=3)
    cfg = AdaleadConfig(
        rounds=10,
        sequences_batch_size=100,
        model_queries_per_batch=2000,
        alphabet_size=4,
        perfect_model=(model == "perfect"),
        surrogate=spec if model == "surrogate" else None,
    )
    return fitness_fn, fitness_params, start_tokens, cfg, ss, key


def profile_gpr_bo_surrogate():
    from flexs_tpu.runtime.gpr_bo_runner import run_gpr_bo_nam

    fitness_fn, fp, start, cfg, ss, key = _paper_args("surrogate")
    _measure(
        "gpr_bo surrogate FULL",
        run_gpr_bo_nam,
        fitness_fn, fp, start, cfg, ss, key,
    )


def profile_gpr_bo_nam():
    from flexs_tpu.runtime.gpr_bo_runner import run_gpr_bo_nam

    fitness_fn, fp, start, cfg, ss, key = _paper_args("nam")
    _measure(
        "gpr_bo nam FULL",
        run_gpr_bo_nam,
        fitness_fn, fp, start, cfg, ss, key,
    )


def profile_surrogate_parts():
    """Isolated surrogate train + 65536-point predict (GPR_BO's pieces)."""
    spec = surrogate_lib.SurrogateSpec(ensemble_size=3)
    A, L, cap = 4, 8, 1002
    key = jax.random.PRNGKey(0)
    state = surrogate_lib.init_state(spec, A, L, key)
    tokens = jnp.zeros((cap, L), jnp.int32)
    truth = jnp.zeros((cap,), jnp.float32)

    _measure(
        "surrogate.train 3xCNN cap1002",
        lambda st, tk, tr, k: surrogate_lib.train(spec, A, st, tk, tr, 500, k),
        state, tokens, truth, key,
    )

    space = jnp.zeros((65536, L), jnp.int32)

    def score_all(st, tokens_all):
        def chunk(c):
            tk = jax.lax.dynamic_slice_in_dim(tokens_all, c * 4096, 4096)
            m = surrogate_lib.predict_members(spec, A, st, tk)
            return jnp.mean(m, 0), jnp.std(m, 0)

        return jax.lax.map(chunk, jnp.arange(16))

    _measure("surrogate 16x4096 predict map", score_all, state, space)

    def ten_rounds(st, tk, tr, k, tokens_all):
        def body(carry, _):
            st, k = carry
            k, kf = jax.random.split(k)
            st = surrogate_lib.train(spec, A, st, tk, tr, 500, kf)
            mu, sig = score_all(st, tokens_all)
            return (st, k), jnp.sum(mu) + jnp.sum(sig)

        return jax.lax.scan(body, (st, k), None, length=10)[1]

    _measure(
        "10-round train+score scan",
        ten_rounds, state, tokens, truth, key, space,
    )


def profile_cbas():
    from flexs_tpu.runtime.cbas_runner import VAEConfig, run_cbas_nam

    fitness_fn, fp, start, cfg, ss, key = _paper_args("nam")
    _measure(
        "cbas nam FULL",
        run_cbas_nam,
        fitness_fn, fp, start, cfg, ss, key,
    )


def profile_adalead_surrogate():
    fitness_fn, fp, start, cfg, ss, key = _paper_args("surrogate")
    _measure(
        "adalead surrogate FULL",
        jit_runner.run_adalead_nam,
        fitness_fn, fp, start, cfg, ss, key,
    )


PROFILES = {
    "gpr_bo_surrogate": profile_gpr_bo_surrogate,
    "gpr_bo_nam": profile_gpr_bo_nam,
    "surrogate_parts": profile_surrogate_parts,
    "cbas": profile_cbas,
    "adalead_surrogate": profile_adalead_surrogate,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROFILES)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for n in names:
        PROFILES[n]()
