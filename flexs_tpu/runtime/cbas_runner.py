"""Fully-jitted CbAS/DbAS + NoisyAbstractModel runs.

The host explorer (baselines/explorers/cbas_dbas.py, cited against the
reference there) interleaves VAE training, PWM sampling, and model scoring
through Python — hundreds of small dispatches per round.  This runner fuses
the whole experiment into one device program: elite selection, pool
extension, every weighted-MLE VAE training burst (with keras-style early
stopping), Boltzmann PWM sampling with temperature escalation, NAM scoring,
and the CbAS importance reweighting all run inside a `lax.scan`-over-rounds
/ `scan`-over-cycles program.

Semantics per host explorer (reference cbas_dbas.py:85-192):
  * round 1: `sequences_batch_size` novel rate-2/L mutants of the start;
  * later rounds: elite = last round's proposals >= Q-quantile true score,
    padded to >= 100 with rate-`mutation_rate` novel mutants; train the
    VAE on it and snapshot vae_0;
  * per cycle (static `ceil(budget / cycle_batch_size)` cycles — the host
    `while cost < budget` with a fixed per-cycle cost): sample
    `cycle_batch_size` novel sequences from the decoded PWM at escalating
    temperature (x1.3 per rejection), score with the NAM, ratchet gamma to
    max(Q-percentile of the scores, gamma), weight by
    exp(logp_vae0 - logp_vaet) (CbAS) or 1 (DbAS), zero weights below
    gamma, append to the pool, retrain the VAE;
  * the round proposes the top `sequences_batch_size` generated sequences
    by model score.

Documented deviations: VAE epochs sort the POSITIVE-WEIGHT rows first
(random among themselves) and run a dynamic `ceil(n_pos / batch_size)`
minibatch loop over only those (the round-3 latency fix) — Keras would
shuffle zero-weight rows into batches too, so the device runs fewer
steps per epoch whenever the pool holds gamma-zeroed rows (those rows
contribute no gradient either way; batch compositions differ);
temperature escalation counts actual rejections but updates the count
once per sampled batch (all candidates within a batch share a
temperature, where the reference escalates between consecutive single
draws) — close but not draw-for-draw; and the round proposes exactly
`sequences_batch_size` sequences where the host/reference
`np.argsort(preds)[:-B:-1]` idiom yields B-1 (the family-wide fused
convention, see runtime/jit_runner.py).
"""
import time
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.ops import packed_hamming
from flexs_tpu.runtime import jit_runner
from flexs_tpu.runtime import surrogate as surrogate_lib
from flexs_tpu.runtime.jit_runner import RunResult, device_run_args, fetch_run_result, _dists_to_cache, _masked_append
from flexs_tpu.utils.vae import VAEModule


class VAEConfig(NamedTuple):
    """Static VAE hyperparameters (compile-time constants)."""

    latent_dim: int = 2
    intermediate_dim: int = 250
    batch_size: int = 10
    epochs: int = 10
    beta: float = 1.0
    validation_split: float = 0.2


def _masked_percentile(vals, mask, q):
    """`np.percentile(vals[mask], 100*q)` (linear interpolation) on device."""
    big = jnp.float32(1e30)
    v = jnp.sort(jnp.where(mask, vals, big))
    n = jnp.sum(mask)
    pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    return v[lo] * (1 - frac) + v[hi] * frac


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "fitness_fn",
        "vae_cfg",
        "algo",
        "Q",
        "cycle_batch_size",
        "mutation_rate",
    ),
)
def run_cbas_nam(
    fitness_fn,
    fitness_params,
    start_tokens,
    cfg,
    signal_strength,
    key,
    vae_cfg: VAEConfig = VAEConfig(),
    algo: str = "cbas",
    Q: float = 0.7,
    cycle_batch_size: int = 100,
    mutation_rate: float = 0.2,
) -> RunResult:
    """Run a full CbAS/DbAS + NAM experiment on device."""
    B = cfg.sequences_batch_size
    budget = cfg.model_queries_per_batch
    A = cfg.alphabet_size
    L = start_tokens.shape[0]
    R = cfg.rounds
    dim = L * A
    ss = jnp.asarray(signal_strength, jnp.float32)
    cycles = -(-budget // cycle_batch_size)

    bs = vae_cfg.batch_size
    base_pool = max(100, B)
    pool_cap = base_pool + cycles * cycle_batch_size
    pool_cap = ((pool_cap + bs - 1) // bs) * bs  # multiple of the VAE batch
    gen_cap = cycles * cycle_batch_size + 1
    measured_cap = 1 + R * B + 1
    cache_cap = 1 + R * (cycles * cycle_batch_size + B) + B + 1

    bits, per_word, words = packed_hamming.packing_spec(L, A)

    def pack(tokens):
        return packed_hamming.pack_tokens(tokens, A, length=L)

    # --- VAE ----------------------------------------------------------------
    module = VAEModule(dim, vae_cfg.intermediate_dim, vae_cfg.latent_dim)
    tx = optax.chain(optax.clip(0.5), optax.adam(1e-4))

    def one_hot_flat(tokens):
        return jax.nn.one_hot(tokens, A, dtype=jnp.float32).reshape(
            tokens.shape[0], dim
        )

    def vae_loss(params, batch_stats, xb, wb, rng):
        drop_rng, z_rng = jax.random.split(rng)
        (recon, z_mean, z_log_var), updates = module.apply(
            {"params": params, "batch_stats": batch_stats},
            xb,
            z_rng,
            train=True,
            rngs={"dropout": drop_rng},
            mutable=["batch_stats"],
        )
        eps = 1e-7
        bce = -(
            xb * jnp.log(recon + eps) + (1 - xb) * jnp.log(1 - recon + eps)
        ).mean(axis=1)
        denom = jnp.sum(wb) + 1e-9
        recon_loss = dim * jnp.sum(bce * wb) / denom
        kl = -0.5 * (1 + z_log_var - jnp.square(z_mean) - jnp.exp(z_log_var))
        kl_loss = jnp.sum(kl.mean(axis=1) * wb) / denom
        return recon_loss + vae_cfg.beta * kl_loss, updates["batch_stats"]

    num_batches = pool_cap // bs

    def train_vae(variables, opt_state, pool_tokens, pool_w, n_pool, key):
        """Weighted-MLE fit with keras-style early stopping (patience 3)."""
        x = one_hot_flat(pool_tokens[:pool_cap])
        n_train = jnp.maximum(
            bs, (n_pool.astype(jnp.float32) * (1 - vae_cfg.validation_split))
            .astype(jnp.int32),
        )
        w = pool_w[:pool_cap] * (jnp.arange(pool_cap) < n_train)

        # Keras runs ceil(n_train / bs) steps per epoch; the pool buffer
        # is mostly padding early on (n_pool starts at ~100 of pool_cap
        # slots), so order training rows FIRST (random among themselves,
        # zero-weight padding last) and loop only over the live batches —
        # a dynamic fori_loop bound, not a full-capacity scan.  This is
        # the round-3 CbAS latency fix: the old full-cap scan made every
        # epoch cost pool_cap/bs sequential steps regardless of fill.
        n_live = jnp.maximum(
            (jnp.sum((w > 0).astype(jnp.int32)) + bs - 1) // bs, 1
        )

        def epoch(variables, opt_state, key):
            key, pkey = jax.random.split(key)
            rand = jax.random.uniform(pkey, (pool_cap,))
            order = jnp.argsort(jnp.where(w > 0, rand, 2.0))
            batches = order.reshape(num_batches, bs)

            def step(i, carry):
                variables, opt_state, key, loss_sum = carry
                idx = batches[i]
                key, rng = jax.random.split(key)
                (loss, new_stats), grads = jax.value_and_grad(
                    vae_loss, has_aux=True
                )(variables["params"], variables["batch_stats"], x[idx], w[idx], rng)
                updates, opt_state = tx.update(
                    grads, opt_state, variables["params"]
                )
                params = optax.apply_updates(variables["params"], updates)
                return (
                    {"params": params, "batch_stats": new_stats},
                    opt_state,
                    key,
                    loss_sum + loss,
                )

            variables, opt_state, _, loss_sum = jax.lax.fori_loop(
                0, n_live, step, (variables, opt_state, key, jnp.float32(0.0))
            )
            return variables, opt_state, loss_sum / n_live.astype(jnp.float32)

        def cond(state):
            _, _, _, _, patience, e = state
            return (e < vae_cfg.epochs) & (patience < 3)

        def body(state):
            variables, opt_state, key, best, patience, e = state
            key, ekey = jax.random.split(key)
            variables, opt_state, loss = epoch(variables, opt_state, ekey)
            improved = loss < best - 1e-12
            best = jnp.where(improved, loss, best)
            patience = jnp.where(improved, 0, patience + 1)
            return variables, opt_state, key, best, patience, e + 1

        variables, opt_state, _, _, _, _ = jax.lax.while_loop(
            cond,
            body,
            (variables, opt_state, key, jnp.float32(jnp.inf), jnp.int32(0),
             jnp.int32(0)),
        )
        return variables, opt_state

    def log_probability(variables, x):
        """Reconstruction log-prob (reference VAE_utils.py:189-217)."""
        z_mean, _ = module.apply(variables, x, train=False, method=VAEModule.encode)
        decoded = module.apply(
            variables, z_mean, train=False, method=VAEModule.decode
        ).reshape(-1, L, A)
        oh = x.reshape(-1, L, A)
        per_res = jnp.sum(decoded * oh, axis=2) / jnp.sum(decoded, axis=2)
        logp = jnp.sum(jnp.log(1e-9 + per_res), axis=1)
        return jnp.nan_to_num(logp)

    # --- NAM query (batched, masked; same semantics as jit_runner) ----------
    def nam_query(cache, costs, tokens, mask, key, surr=None):
        """Surrogate mode: every row is a fresh forward through the
        carried net (it retrains between rounds, so stale cached
        predictions must never be served); the cache still tracks seen
        sequences; no landscape cost accrues."""
        cache_tokens, cache_pk, cache_vals, cache_truth, n_cache = cache
        model_cost, landscape_cost = costs

        pk = pack(tokens)
        dists = _dists_to_cache(pk, cache_pk, n_cache, bits, per_word)
        min_dist = jnp.min(dists, axis=1)
        nearest = jnp.argmin(dists, axis=1)
        cached = min_dist == 0
        cached_vals = cache_vals[nearest]

        if cfg.surrogate is not None:
            signal = surrogate_lib.predict(cfg.surrogate, A, surr, tokens)
            values = signal
        elif cfg.perfect_model:
            signal = fitness_fn(fitness_params, tokens)
            values = jnp.where(cached, cached_vals, signal)
        else:
            signal = fitness_fn(fitness_params, tokens)
            key, k_exp, k_choice = jax.random.split(key, 3)
            expo = jax.random.exponential(k_exp, (tokens.shape[0],))
            rand_idx = jax.random.randint(
                k_choice, (tokens.shape[0],), 0, jnp.maximum(n_cache, 1)
            )
            neighbor_truth = cache_truth[nearest]
            noise = jnp.where(
                neighbor_truth >= 0, expo * neighbor_truth, cache_vals[rand_idx]
            )
            alpha = jnp.power(ss, min_dist)
            values = jnp.where(
                cached, cached_vals, alpha * signal + (1 - alpha) * noise
            )

        insert = mask & ~cached
        cache_tokens, pos, n_cache, (cache_pk, cache_vals, cache_truth) = (
            _masked_append(
                cache_tokens,
                tokens,
                n_cache,
                insert,
                aux_bufs=(cache_pk, cache_vals, cache_truth),
                aux_rows=(pk, values, signal),
            )
        )
        pos = jnp.where(cached, nearest, pos)
        model_cost = model_cost + jnp.sum(mask)
        if not cfg.perfect_model and cfg.surrogate is None:
            landscape_cost = landscape_cost + 2 * jnp.sum(insert)
        return (
            (cache_tokens, cache_pk, cache_vals, cache_truth, n_cache),
            (model_cost, landscape_cost),
            values,
            pos,
        )

    def first_occurrence(pk, valid):
        """True where a packed row is not equal to any earlier valid row."""
        eq = jnp.all(pk[:, None, :] == pk[None, :, :], axis=-1)
        earlier_dup = jnp.any(
            eq & jnp.tril(jnp.ones_like(eq, dtype=bool), k=-1) & valid[None, :],
            axis=1,
        )
        return ~earlier_dup

    def sample_novel(buf_tokens, buf_pk, n_buf, need_total, draw, key, max_tries):
        """Append novel `draw(key, t, buf_tokens, n_buf) -> int[K, L]` rows.

        Candidates equal to any buffer row (or to an earlier in-batch
        candidate) are rejected; appends are capped so the buffer stops at
        exactly `need_total` rows (host parity: the reference breaks its
        fill loops at the target count).
        """

        def cond(state):
            _, _, n_buf, _, t = state
            return (n_buf < need_total) & (t < max_tries)

        def body(state):
            buf_tokens, buf_pk, n_buf, key, t = state
            key, k_draw = jax.random.split(key)
            cand = draw(k_draw, t, buf_tokens, n_buf)
            cand_pk = pack(cand)
            novel = (
                jnp.min(
                    _dists_to_cache(cand_pk, buf_pk, n_buf, bits, per_word),
                    axis=1,
                )
                > 0
            )
            novel = novel & first_occurrence(cand_pk, novel)
            accept = novel & (
                jnp.cumsum(novel.astype(jnp.int32)) <= need_total - n_buf
            )
            buf_tokens, _, n_buf, (buf_pk,) = _masked_append(
                buf_tokens, cand, n_buf, accept, aux_bufs=(buf_pk,),
                aux_rows=(cand_pk,),
            )
            return buf_tokens, buf_pk, n_buf, key, t + 1

        state = (buf_tokens, buf_pk, n_buf, key, jnp.int32(0))
        buf_tokens, buf_pk, n_buf, key, _ = jax.lax.while_loop(cond, body, state)
        return buf_tokens, buf_pk, n_buf, key

    # --- initial state -------------------------------------------------------
    start_truth = fitness_fn(fitness_params, start_tokens[None])[0]

    measured_tokens = jnp.zeros((measured_cap, L), jnp.int32).at[0].set(start_tokens)
    measured_truth = (
        jnp.full((measured_cap,), -jnp.inf, jnp.float32).at[0].set(start_truth)
    )
    n_measured = jnp.int32(1)

    cache_tokens = jnp.zeros((cache_cap, L), jnp.int32).at[0].set(start_tokens)
    cache_pk = jnp.zeros((cache_cap, words), jnp.uint32).at[0].set(
        pack(start_tokens[None])[0]
    )
    cache_vals = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache_truth = jnp.zeros((cache_cap,), jnp.float32).at[0].set(start_truth)
    cache = (cache_tokens, cache_pk, cache_vals, cache_truth, jnp.int32(1))

    key, init_key = jax.random.split(key)
    variables = module.init(
        {"params": init_key, "dropout": init_key},
        jnp.zeros((1, dim), jnp.float32),
        init_key,
        train=False,
    )
    opt_state = tx.init(variables["params"])

    def mutant_draw(rate, count):
        """Rate-`rate` mutants of random rows of the growing buffer itself
        (host parity: the reference mutates random members of the pool as
        it grows, reference :80-102)."""

        def draw(k, _t, buf_tokens, n_buf):
            k_idx, k_mask, k_res = jax.random.split(k, 3)
            idx = jax.random.randint(k_idx, (count,), 0, jnp.maximum(n_buf, 1))
            toks = buf_tokens[idx]
            mut = jax.random.uniform(k_mask, toks.shape) < rate
            rand = jax.random.randint(k_res, toks.shape, 0, A)
            return jnp.where(mut, rand, toks)

        return draw

    # --- rounds ---------------------------------------------------------------
    def round_zero(carry_vae, cache, costs, key, surr=None):
        """B novel rate-2/L mutants of the start (reference :91-104)."""
        buf = jnp.zeros((B + 1, L), jnp.int32)
        buf_pk = jnp.zeros((B + 1, words), jnp.uint32)

        def draw(k, _t, _buf, _n):
            k_mask, k_res = jax.random.split(k)
            toks = jnp.broadcast_to(start_tokens, (B, L))
            mut = jax.random.uniform(k_mask, toks.shape) < 2.0 / L
            rand = jax.random.randint(k_res, toks.shape, 0, A)
            return jnp.where(mut, rand, toks)

        key, k_gen, k_nam = jax.random.split(key, 3)
        buf, buf_pk, n_buf, k_gen = sample_novel(
            buf, buf_pk, jnp.int32(0), B, draw, k_gen, 64
        )
        proposals = buf[:B]
        valid = jnp.arange(B) < n_buf
        cache, costs, preds, _ = nam_query(
            cache, costs, proposals, valid, k_nam, surr
        )
        return proposals, preds, valid, cache, costs, carry_vae, key

    def round_cbas(carry_vae, cache, costs, prev, key, surr=None):
        """Elite pool -> VAE -> generate/score/reweight cycles (:106-192)."""
        variables, opt_state = carry_vae
        prev_tokens, prev_truth, prev_valid = prev

        gamma = _masked_percentile(prev_truth, prev_valid, Q)
        elite = prev_valid & (prev_truth >= gamma)

        pool_tokens = jnp.zeros((pool_cap + 1, L), jnp.int32)
        pool_pk = jnp.zeros((pool_cap + 1, words), jnp.uint32)
        pool_w = jnp.zeros((pool_cap + 1,), jnp.float32)
        pool_tokens, pos, n_pool, (pool_pk, pool_w) = _masked_append(
            pool_tokens,
            prev_tokens,
            jnp.int32(0),
            elite,
            aux_bufs=(pool_pk, pool_w),
            aux_rows=(pack(prev_tokens), jnp.ones((B,), jnp.float32)),
        )

        # Pad the pool to >= 100 with novel rate-`mutation_rate` mutants.
        key, k_ext = jax.random.split(key)
        draw = mutant_draw(mutation_rate, 100)
        pool_tokens, pool_pk, n_ext, k_ext = sample_novel(
            pool_tokens, pool_pk, n_pool, 100, draw, k_ext, 64
        )
        pool_w = jnp.where(
            (jnp.arange(pool_cap + 1) >= n_pool) & (jnp.arange(pool_cap + 1) < n_ext),
            1.0,
            pool_w,
        )
        n_pool = jnp.maximum(n_pool, n_ext)

        gen_tokens = jnp.zeros((gen_cap, L), jnp.int32)
        gen_preds = jnp.full((gen_cap,), -jnp.inf, jnp.float32)
        n_gen = jnp.int32(0)

        # One scan emits the whole round: iteration i (re)trains the VAE on
        # the current pool FIRST, then samples/scores/appends cycle i.
        # Iteration 0's fit is the reference's pool fit (its result is the
        # vae_0 snapshot, carried in the scan state); iteration `cycles` is
        # the reference's final post-append refit with the sampling half
        # masked off (live=False).  A host-level pool fit outside the scan
        # would trace a SECOND full copy of the training loop into the
        # executable, and first-dispatch program load through the relay
        # scales with program size (BASELINE.md compile/first-call table) —
        # folding it into the scan keeps one trace.
        def cycle(state, i):
            (
                variables,
                opt_state,
                vae_0,
                pool_tokens,
                pool_pk,
                pool_w,
                n_pool,
                gen_tokens,
                gen_preds,
                n_gen,
                cache,
                costs,
                gamma,
                key,
            ) = state
            live = i < cycles

            key, k_train = jax.random.split(key)
            variables, opt_state = train_vae(
                variables, opt_state, pool_tokens, pool_w, n_pool, k_train
            )
            vae_0 = jax.tree.map(
                lambda new, old: jnp.where(i == 0, new, old), variables, vae_0
            )  # snapshot (reference :125-144)

            # Decode one latent draw into a PWM; Boltzmann-sample novel
            # sequences at escalating temperature (reference :153-187 via
            # utils/vae.py).
            key, k_z = jax.random.split(key)
            z = jax.random.normal(k_z, (1, vae_cfg.latent_dim))
            pwm = module.apply(
                variables, z, train=False, method=VAEModule.decode
            )[0].reshape(L, A)

            def draw(k, rej):
                # Temperature 0.001 * 1.3^(rejections so far) — the
                # reference escalates per rejected draw (VAE_utils.py:
                # 175-185); here the count updates per sampled batch, so
                # all candidates within one batch share a temperature.
                temp = 0.001 * jnp.power(1.3, rej.astype(jnp.float32))
                logits = pwm / jnp.maximum(temp, 1e-8)
                return jax.random.categorical(
                    k, logits[None], axis=-1, shape=(cycle_batch_size, L)
                )

            prop = jnp.zeros((cycle_batch_size + 1, L), jnp.int32)
            prop_pk = jnp.zeros((cycle_batch_size + 1, words), jnp.uint32)

            # Novelty is enforced against BOTH the pool (all previous
            # samples, host `existing`) and the proposals drawn so far this
            # cycle (host `seen`), plus in-batch first-occurrence dedup.
            def cond(state):
                _, _, n_prop, _, t, _ = state
                # `live` (closed-over scan tracer) short-circuits the whole
                # sampling loop on the final train-only iteration.
                return (n_prop < cycle_batch_size) & (t < 200) & live

            def body(state):
                prop, prop_pk, n_prop, key, t, rej = state
                key, k_draw = jax.random.split(key)
                cand = draw(k_draw, rej)
                cand_pk = pack(cand)
                novel_pool = (
                    jnp.min(
                        _dists_to_cache(
                            cand_pk, pool_pk, n_pool, bits, per_word
                        ),
                        axis=1,
                    )
                    > 0
                )
                novel_prop = (
                    jnp.min(
                        _dists_to_cache(
                            cand_pk, prop_pk, n_prop, bits, per_word
                        ),
                        axis=1,
                    )
                    > 0
                )
                novel = novel_pool & novel_prop
                novel = novel & first_occurrence(cand_pk, novel)
                accept = novel & (
                    jnp.cumsum(novel.astype(jnp.int32))
                    <= cycle_batch_size - n_prop
                )
                prop, _, n_prop, (prop_pk,) = _masked_append(
                    prop, cand, n_prop, accept, aux_bufs=(prop_pk,),
                    aux_rows=(cand_pk,),
                )
                # Each non-novel draw is one rejection (reference
                # VAE_utils.py:182-185); novel-but-over-quota candidates
                # would never have been drawn and don't count.
                rej = rej + jnp.sum((~novel).astype(jnp.int32))
                return prop, prop_pk, n_prop, key, t + 1, rej

            prop, prop_pk, n_prop, key, _, _ = jax.lax.while_loop(
                cond, body,
                (prop, prop_pk, jnp.int32(0), key, jnp.int32(0), jnp.int32(0)),
            )
            proposals = prop[:cycle_batch_size]
            valid = (jnp.arange(cycle_batch_size) < n_prop) & live

            key, k_nam = jax.random.split(key)
            cache, costs, scores, _ = nam_query(
                cache, costs, proposals, valid, k_nam, surr
            )
            gamma = jnp.where(
                jnp.any(valid),
                jnp.maximum(_masked_percentile(scores, valid, Q), gamma),
                gamma,
            )

            if algo == "cbas":
                x = one_hot_flat(proposals)
                # One vmapped apply over the stacked (vae_0, live) params —
                # two separate calls would emit the VAE forward twice.
                both = jax.tree.map(
                    lambda a, b: jnp.stack([a, b]), vae_0, variables
                )
                logp = jax.vmap(log_probability, in_axes=(0, None))(both, x)
                weights = jnp.nan_to_num(jnp.exp(logp[0] - logp[1]))
            else:
                weights = jnp.ones((cycle_batch_size,), jnp.float32)
            weights = jnp.where((scores >= gamma) & valid, weights, 0.0)

            pool_tokens, _, n_pool, (pool_pk, pool_w) = _masked_append(
                pool_tokens,
                proposals,
                n_pool,
                valid,
                aux_bufs=(pool_pk, pool_w),
                aux_rows=(prop_pk[:cycle_batch_size], weights),
            )

            gen_tokens, _, n_gen, (gen_preds,) = _masked_append(
                gen_tokens, proposals, n_gen, valid,
                aux_bufs=(gen_preds,), aux_rows=(scores,),
            )
            return (
                variables,
                opt_state,
                vae_0,
                pool_tokens,
                pool_pk,
                pool_w,
                n_pool,
                gen_tokens,
                gen_preds,
                n_gen,
                cache,
                costs,
                gamma,
                key,
            ), None

        state = (
            variables,
            opt_state,
            variables,  # vae_0 placeholder; overwritten at i == 0
            pool_tokens,
            pool_pk,
            pool_w,
            n_pool,
            gen_tokens,
            gen_preds,
            n_gen,
            cache,
            costs,
            gamma,
            key,
        )
        state, _ = jax.lax.scan(cycle, state, jnp.arange(cycles + 1))
        (
            variables,
            opt_state,
            _,
            _,
            _,
            _,
            _,
            gen_tokens,
            gen_preds,
            n_gen,
            cache,
            costs,
            _,
            key,
        ) = state

        masked_preds = jnp.where(jnp.arange(gen_cap) < n_gen, gen_preds, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(masked_preds, B)
        valid = jnp.isfinite(top_vals)
        proposals = gen_tokens[top_idx]
        return proposals, top_vals, valid, cache, costs, (variables, opt_state), key

    def round_body(carry, r):
        (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
            costs,
            carry_vae,
            prev,
            surr_state,
            key,
        ) = carry

        # Surrogate mode: warm-started multi-epoch fit on the measured
        # buffer at round start (reference explorer.py:157-160).
        if cfg.surrogate is not None:
            key, k_fit = jax.random.split(key)
            surr_state = surrogate_lib.train(
                cfg.surrogate, A, surr_state,
                measured_tokens, measured_truth, n_measured, k_fit,
            )

        proposals, preds, valid, cache, costs, carry_vae, key = jax.lax.cond(
            r == 0,
            lambda: round_zero(carry_vae, cache, costs, key, surr_state),
            lambda: round_cbas(carry_vae, cache, costs, prev, key, surr_state),
        )

        truth = jnp.where(valid, fitness_fn(fitness_params, proposals), -jnp.inf)
        model_cost, landscape_cost = costs
        landscape_cost = landscape_cost + jnp.sum(valid)
        measured_tokens, _, n_measured, (measured_truth,) = _masked_append(
            measured_tokens, proposals, n_measured, valid,
            aux_bufs=(measured_truth,), aux_rows=(truth,),
        )
        out = (proposals, preds, truth, valid, model_cost, landscape_cost)
        return (
            measured_tokens,
            measured_truth,
            n_measured,
            cache,
            (model_cost, landscape_cost),
            carry_vae,
            (proposals, truth, valid),
            surr_state,
            key,
        ), out

    if cfg.surrogate is not None:
        key, k_surr = jax.random.split(key)
        surr0 = surrogate_lib.init_state(
            cfg.surrogate, A, L, k_surr, capacity=measured_cap
        )
    else:
        surr0 = ()

    init_prev = (
        jnp.zeros((B, L), jnp.int32),
        jnp.full((B,), -jnp.inf, jnp.float32),
        jnp.zeros((B,), bool),
    )
    init = (
        measured_tokens,
        measured_truth,
        n_measured,
        cache,
        (jnp.int32(0), jnp.int32(1)),
        (variables, opt_state),
        init_prev,
        surr0,
        key,
    )
    _, outs = jax.lax.scan(round_body, init, jnp.arange(R))
    return RunResult(*outs, start_truth=start_truth)


class DeviceCbASNAM:
    """(df, metadata) wrapper over `run_cbas_nam`."""

    def __init__(
        self,
        landscape,
        alphabet,
        rounds: int,
        sequences_batch_size: int,
        model_queries_per_batch: int,
        starting_sequence: str,
        algo: str = "cbas",
        Q: float = 0.7,
        cycle_batch_size: int = 100,
        mutation_rate: float = 0.2,
        vae_cfg: VAEConfig = None,
        signal_strength: float = 0.9,
        model: str = "nam",
        surrogate_spec=None,
        seed: int = 0,
    ):
        """Create the fused CbAS/DbAS runner for `landscape`.

        `model="surrogate"` carries an in-program trained empirical net
        (default = the paper's CNN) that scores the VAE samples.
        """
        if model not in ("nam", "perfect", "surrogate"):
            raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
        if model == "surrogate" and surrogate_spec is None:
            surrogate_spec = surrogate_lib.SurrogateSpec()
        if algo not in ("cbas", "dbas"):
            raise ValueError("`algo` must be one of 'cbas' or 'dbas'")
        self.landscape = landscape
        self.alphabet: Alphabet = as_alphabet(alphabet)
        self.starting_sequence = starting_sequence
        self.signal_strength = (
            1.0 if model in ("perfect", "surrogate") else signal_strength
        )
        self.algo = algo
        self.Q = Q
        self.cycle_batch_size = cycle_batch_size
        self.mutation_rate = mutation_rate
        self.vae_cfg = vae_cfg or VAEConfig()
        self.seed = seed
        self.name = f"Device{algo}_Q={Q}"
        if model == "perfect":
            self.model_name = f"LandscapeAsModel={landscape.name}"
        elif model == "surrogate":
            self.model_name = surrogate_spec.model_name
        else:
            self.model_name = f"NAMb_ss{signal_strength}"
        self.cfg = jit_runner.AdaleadConfig(
            rounds=rounds,
            sequences_batch_size=sequences_batch_size,
            model_queries_per_batch=model_queries_per_batch,
            alphabet_size=len(self.alphabet),
            perfect_model=(model == "perfect"),
            surrogate=surrogate_spec if model == "surrogate" else None,
        )
        self._fitness_fn, self._fitness_params = landscape.device_fitness()

    def run(self, verbose: bool = True) -> Tuple[pd.DataFrame, dict]:
        """Execute the fused CbAS experiment; returns (df, metadata)."""
        start_time = time.time()
        start_tokens, ss, key = device_run_args(
            self.alphabet.letters, self.starting_sequence,
            float(self.signal_strength), self.seed,
        )
        result = run_cbas_nam(
            self._fitness_fn,
            self._fitness_params,
            start_tokens,
            self.cfg,
            ss,
            key,
            vae_cfg=self.vae_cfg,
            algo=self.algo,
            Q=self.Q,
            cycle_batch_size=self.cycle_batch_size,
            mutation_rate=self.mutation_rate,
        )
        result = fetch_run_result(result)
        self.landscape.add_cost(int(result.landscape_cost[-1]))

        rows = {
            "sequence": [self.starting_sequence],
            "model_score": [np.nan],
            "true_score": [float(result.start_truth)],
            "round": [0],
            "model_cost": [0],
            "measurement_cost": [1],
        }
        measured = 1
        for r in range(self.cfg.rounds):
            valid = result.proposal_valid[r]
            seqs = self.alphabet.decode(result.proposal_tokens[r][valid])
            measured += len(seqs)
            rows["sequence"].extend(seqs)
            rows["model_score"].extend(result.proposal_preds[r][valid].tolist())
            rows["true_score"].extend(result.proposal_truth[r][valid].tolist())
            rows["round"].extend([r + 1] * len(seqs))
            rows["model_cost"].extend([int(result.model_cost[r])] * len(seqs))
            rows["measurement_cost"].extend([measured] * len(seqs))
        df = pd.DataFrame(rows)

        metadata = {
            "exp_name": self.name,
            "model_name": self.model_name,
            "landscape_name": self.landscape.name,
            "rounds": self.cfg.rounds,
            "sequences_batch_size": self.cfg.sequences_batch_size,
            "model_queries_per_batch": self.cfg.model_queries_per_batch,
        }
        if verbose:
            print(
                f"device CbAS run: top {df['true_score'].max():.4f}, "
                f"time {time.time() - start_time:.3f}s"
            )
        return df, metadata
