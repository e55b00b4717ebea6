"""Sharded sweep engine: many Adalead+NAM runs as one device program.

The reference's evaluators loop serially over sweep cells
(reference evaluate.py:27-36) and its paper experiments scaled out with
independent cloud VMs (paper_code/cloud/runner.py:90-126).  Here a whole
grid — landscape x starting sequence x signal strength x seed — executes as
ONE jitted, vmapped program whose cell axis is sharded over the device mesh:
each TPU chip runs its shard of cells in lockstep, with zero inter-chip
communication (the workload is embarrassingly parallel at the cell level,
matching the reference's VM pattern but on-device).

Score tables are NOT replicated per cell: every lane carries only an index
into the shared stacked table array, so a 158-landscape sweep holds one
[158, 65536] f32 array regardless of grid size.
"""
import functools
import hashlib
import json
import os
from functools import partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - version shim
    from jax.experimental.shard_map import shard_map

from flexs_tpu.alphabet import Alphabet, as_alphabet
from flexs_tpu.parallel import multihost
from flexs_tpu.runtime.jit_runner import AdaleadConfig, RunResult, run_adalead_nam


def _indexed_table_fitness(params, tokens):
    """Fitness via shared stacked tables: params = (tables, cell_index)."""
    tables, idx = params
    powers = 4 ** jnp.arange(tokens.shape[-1] - 1, -1, -1, dtype=jnp.int32)
    flat = jnp.sum(tokens * powers, axis=-1)
    return tables[idx, flat]


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _sweep_impl(tables, table_idx, start_tokens, signal_strengths, keys, cfg,
                mesh=None):
    def vmapped(tables, table_idx, start_tokens, signal_strengths, keys):
        def one_cell(idx, start, ss, key):
            return run_adalead_nam(
                _indexed_table_fitness, (tables, idx), start, cfg, ss, key
            )

        return jax.vmap(one_cell)(table_idx, start_tokens, signal_strengths, keys)

    if mesh is None:
        return vmapped(tables, table_idx, start_tokens, signal_strengths, keys)
    # shard_map, not vmap-over-sharded-axis: each device runs its shard of
    # cells as an INDEPENDENT program.  A sharded vmap would lower the
    # per-cell `while_loop` predicates to per-iteration pred all-reduces
    # and the per-cell top_k to an all-gathered TopK — cross-device
    # lockstep the workload doesn't need.  With shard_map the compiled
    # module is collective-FREE (asserted by scripts/bench_scaling.py).
    spec = P(mesh.axis_names)
    return shard_map(
        vmapped,
        mesh=mesh,
        in_specs=(P(), spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(tables, table_idx, start_tokens, signal_strengths, keys)


def sweep_adalead_nam(
    tables,
    table_idx,
    start_tokens,
    signal_strengths,
    seeds,
    cfg: AdaleadConfig,
    mesh: Optional[Mesh] = None,
    chunk_size: Optional[int] = None,
) -> RunResult:
    """Run a flat batch of C sweep cells on device.

    Args:
        tables: f32[num_landscapes, 4^L] stacked score tables (shared).
        table_idx: int32[C] landscape index per cell.
        start_tokens: int32[C, L] starting sequence per cell.
        signal_strengths: f32[C] NAM alpha per cell.
        seeds: int[C] PRNG seed per cell.
        cfg: Static Adalead configuration (same for every cell).
        mesh: Optional mesh with a "cells" axis to shard the cell batch
            over; tables are replicated.
        chunk_size: Process at most this many cells per device dispatch
            (each cell carries O(rounds * queries) device buffers, so very
            wide grids must be chunked to fit HBM).  One compile serves
            every full chunk.

    Returns:
        `RunResult` with a leading cell axis on every field.
    """
    tables = jnp.asarray(tables, jnp.float32)
    table_idx = jnp.asarray(table_idx, jnp.int32)
    start_tokens = jnp.asarray(start_tokens, jnp.int32)
    signal_strengths = jnp.asarray(signal_strengths, jnp.float32)
    # uint32 before PRNGKey: jnp.asarray would silently truncate int64
    # seeds to int32 (x64 disabled), diverging from the generic path's
    # uint32 handling for seeds >= 2**31.
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.asarray(np.asarray(seeds).astype(np.uint32))
    )

    n = len(table_idx)
    if mesh is not None and chunk_size is not None:
        # Each chunk shards over the whole mesh, so it must be a mesh
        # multiple (matches the generic path).
        chunk_size = -(-chunk_size // mesh.devices.size) * mesh.devices.size
    if chunk_size is None or chunk_size >= n:
        chunks = [slice(0, n)]
        chunk_size = None  # disable tail padding: one exact-size dispatch
    else:
        # Pad the tail chunk up to chunk_size (repeating cell 0) so every
        # dispatch reuses one compiled shape.
        chunks = [slice(i, min(i + chunk_size, n)) for i in range(0, n, chunk_size)]

    def put(table_idx, start_tokens, signal_strengths, keys):
        if mesh is None:
            return table_idx, start_tokens, signal_strengths, keys
        # Cells shard over EVERY mesh axis: on a multi-host mesh from
        # multihost.multihost_sweep_mesh the leading axis follows DCN
        # (slice) boundaries and no collective crosses it.
        cell_sharding = NamedSharding(mesh, P(mesh.axis_names))
        return tuple(
            jax.device_put(a, cell_sharding)
            for a in (table_idx, start_tokens, signal_strengths, keys)
        )

    if mesh is not None:
        tables = jax.device_put(tables, NamedSharding(mesh, P()))

    results = []
    for sl in chunks:
        idx = np.arange(sl.start, sl.stop)
        if chunk_size is not None and len(idx) < chunk_size:
            idx = np.concatenate([idx, np.zeros(chunk_size - len(idx), np.int64)])
        if mesh is not None:
            # A sharded dispatch needs a mesh-multiple cell count; pad by
            # wrapping (full chunks are already mesh multiples via the
            # chunk_size rounding above, so this only fires on the single
            # exact-size dispatch).  Padded rows are dropped by the
            # truncation below, matching the generic path's
            # _pad_cells_to_mesh.
            pad = (-len(idx)) % mesh.devices.size
            if pad:
                idx = np.concatenate([idx, idx[np.arange(pad) % len(idx)]])
        args = put(
            table_idx[idx], start_tokens[idx], signal_strengths[idx], keys[idx]
        )
        out = _sweep_impl(tables, *args, cfg, mesh)
        out = multihost.gather_to_host(out)
        results.append(
            jax.tree.map(lambda x, n=sl.stop - sl.start: x[:n], out)
        )
    if len(results) == 1:
        return results[0]
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *results)


@functools.lru_cache(maxsize=64)
def _cell_runner(algorithm: str, algorithm_kwargs: tuple):
    """Stable per-(algorithm, kwargs) cell function (keys the jit cache)."""
    kwargs = dict(algorithm_kwargs)
    if algorithm == "adalead":
        from flexs_tpu.runtime.jit_runner import run_adalead_nam as fn

        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "ga":
        from flexs_tpu.runtime.ga_runner import run_ga_nam as fn

        kwargs.setdefault("population_size", 100)
        kwargs.setdefault("parent_selection_strategy", "wright-fisher")
        kwargs.setdefault("children_proportion", 0.2)
        kwargs.setdefault("parent_selection_proportion", 0.3)
        kwargs.setdefault("beta", 0.05)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "cmaes":
        from flexs_tpu.runtime.cmaes_runner import run_cmaes_nam as fn

        kwargs.setdefault("population_size", 15)
        kwargs.setdefault("max_iter", 400)
        kwargs.setdefault("initial_variance", 0.2)
        kwargs.setdefault("maximize", False)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "random":
        from flexs_tpu.runtime.random_runner import run_random_nam as fn

        kwargs.setdefault("batch", 64)
        kwargs.setdefault("mu", 1.0)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "bo":
        from flexs_tpu.runtime.bo_runner import run_bo_nam as fn

        kwargs.setdefault("num_chains", 10)
        kwargs.setdefault("method", "EI")
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "gpr_bo":
        from flexs_tpu.runtime.gpr_bo_runner import run_gpr_bo_nam as fn

        kwargs.setdefault("method", "Thompson")
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "dqn":
        from flexs_tpu.runtime.dqn_runner import run_dqn_nam as fn

        kwargs.setdefault("memory_size", 4096)
        kwargs.setdefault("train_epochs", 20)
        kwargs.setdefault("gamma", 0.9)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "ppo":
        from flexs_tpu.runtime.ppo_runner import run_ppo_nam as fn

        kwargs.setdefault("train_epochs", 10)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "dynappo":
        from flexs_tpu.runtime.dyna_ppo_runner import run_dyna_ppo_nam as fn

        kwargs.setdefault("env_batch_size", 16)
        kwargs.setdefault("num_model_rounds", 1)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm == "dynappo_mutative":
        from flexs_tpu.runtime.dyna_ppo_mutative_runner import (
            run_dyna_ppo_mutative_nam as fn,
        )

        kwargs.setdefault("env_batch_size", 16)
        kwargs.setdefault("episode_len", 20)
        kwargs.setdefault("num_model_rounds", 1)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    if algorithm in ("cbas", "dbas"):
        from flexs_tpu.runtime.cbas_runner import VAEConfig, run_cbas_nam as fn

        kwargs.setdefault("algo", algorithm)
        kwargs.setdefault("vae_cfg", VAEConfig())
        kwargs.setdefault("Q", 0.7)
        kwargs.setdefault("cycle_batch_size", 100)
        kwargs.setdefault("mutation_rate", 0.2)
        return lambda f, p, s, cfg, ss, k: fn(f, p, s, cfg, ss, k, **kwargs)
    raise ValueError(f"unknown fused algorithm {algorithm!r}")


def _sweep_signature(
    algorithm, algorithm_kwargs, model, surrogate_spec, cfg, chunk_size,
    landscapes, fitness_fn, land_idx, start_tokens, ss_arr, seed_arr,
) -> str:
    """Stable signature of everything that determines a sweep's results.

    Landscape identity enters three ways: the ordered name list, the
    fitness fn's qualified name plus each param pytree's structure and
    leaf shapes/dtypes, and a CONTENT fingerprint of the params (per-leaf
    sum / sum-of-squares / first element, reduced on device and fetched
    once per landscape). The content fingerprint is what separates e.g.
    two TFBinding problems, which share `.name`, fitness fn, and table
    shape and differ only in table values. Reductions are deterministic
    per backend, so resuming on a different backend (CPU vs TPU) is
    treated as a different sweep — intentionally, since its numerics
    would differ.
    """
    params_spec = []
    for land in landscapes:
        params = land.device_fitness()[1]
        leaves = [jnp.asarray(x) for x in jax.tree.leaves(params)]
        stats = [
            jnp.stack([
                jnp.sum(x, dtype=jnp.float32),
                jnp.sum(jnp.square(x.astype(jnp.float32))),
                x.reshape(-1)[0].astype(jnp.float32),
            ])
            for x in leaves
            if x.size
        ]
        fingerprint = (
            np.asarray(jnp.concatenate(stats)).tobytes().hex()
            if stats
            else ""
        )
        params_spec.append(
            (str(jax.tree.structure(params)),
             [(tuple(x.shape), str(x.dtype)) for x in leaves],
             fingerprint)
        )
    h = hashlib.sha256()
    h.update(
        json.dumps(
            {
                "algorithm": algorithm,
                "algorithm_kwargs": sorted((algorithm_kwargs or {}).items()),
                "model": model,
                # Only non-default fields enter the signature, so adding a
                # new SurrogateSpec knob (at its default) never invalidates
                # existing checkpoints of unrelated sweeps.
                "surrogate_spec": (
                    sorted(
                        (k, v)
                        for k, v in surrogate_spec._asdict().items()
                        if v != type(surrogate_spec)()._asdict()[k]
                    )
                    if surrogate_spec
                    else None
                ),
                "cfg": {
                    k: v for k, v in cfg._asdict().items() if k != "surrogate"
                },
                "chunk_size": chunk_size,
                "landscapes": [land.name for land in landscapes],
                "fitness_fn": f"{fitness_fn.__module__}.{fitness_fn.__qualname__}",
                "params_spec": params_spec,
            },
            default=str,
            sort_keys=True,
        ).encode()
    )
    for arr in (land_idx, start_tokens, ss_arr, seed_arr):
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _checkpoint_chunk_path(checkpoint_dir: str, i: int) -> str:
    return os.path.join(checkpoint_dir, f"chunk_{i:05d}.npz")


def _pad_cells_to_mesh(mesh, *arrays):
    """Pad cell-axis arrays to a mesh-size multiple (shared by both paths).

    Wraps indices so grids SMALLER than the mesh still pad fully; padding
    rows repeat real cells and are dropped from the summary.
    """
    n = len(arrays[0])
    pad = (-n) % mesh.devices.size
    if not pad:
        return arrays
    pidx = np.arange(pad) % n
    return tuple(np.concatenate([a, a[pidx]]) for a in arrays)


def _summary_df(result, cells) -> pd.DataFrame:
    """Per-cell summary rows shared by both sweep paths.

    `cells` yields (landscape_name, start, signal_strength, seed) per
    leading result row; padded result rows beyond len(cells) are dropped.
    """
    truth = np.where(result.proposal_valid, result.proposal_truth, -np.inf)
    max_fitness = np.maximum(truth.max(axis=(1, 2)), result.start_truth)
    return pd.DataFrame(
        [
            {
                "landscape": ln,
                "start": st,
                "signal_strength": ss,
                "seed": sd,
                "max_fitness": float(max_fitness[i]),
                "start_fitness": float(result.start_truth[i]),
                "model_cost": int(result.model_cost[i, -1]),
                "landscape_cost": int(result.landscape_cost[i, -1]),
            }
            for i, (ln, st, ss, sd) in enumerate(cells)
        ]
    )


def _init_checkpoint_dir(checkpoint_dir: str, signature: str) -> None:
    """Create the dir and pin the sweep signature; reject a mismatched resume."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    manifest = os.path.join(checkpoint_dir, "manifest.json")
    if os.path.exists(manifest):
        try:
            with open(manifest) as f:
                prev = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir!r} has a corrupt "
                "manifest.json (interrupted initialization?); clear the "
                "directory and rerun"
            ) from e
        if prev.get("signature") != signature:
            raise ValueError(
                f"checkpoint_dir {checkpoint_dir!r} holds chunks of a "
                "DIFFERENT sweep (landscapes/grid/algorithm/model/budget "
                "changed); clear it or point at a fresh directory"
            )
    elif jax.process_index() == 0:
        # Atomic write: a crash mid-write must not leave a truncated
        # manifest that poisons every future resume.
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"signature": signature}, f)
        os.replace(tmp, manifest)


@partial(
    jax.jit,
    static_argnames=("cfg", "fitness_fn", "cell_fn", "mesh", "cell_mode"),
)
def _sweep_generic_impl(
    stacked_params, start_tokens, signal_strengths, keys, cfg, fitness_fn,
    cell_fn, mesh=None, cell_mode="vmap",
):
    def vmapped(stacked_params, start_tokens, signal_strengths, keys):
        def one_cell(params, start, ss, key):
            return cell_fn(fitness_fn, params, start, cfg, ss, key)

        if cell_mode == "map":
            # Sequential cells (lax.map = scan): each cell's while_loops
            # run their OWN trip counts.  vmap locksteps every data-
            # dependent loop across cells, so each round's generation
            # loop costs the max trips over the whole shard — measured
            # 1.9-2.3x per-cell inflation on surrogate sweeps
            # (BASELINE.md round-4 surrogate-sweep A/B table), whose
            # fixed-cost training part is too small to amortize it.
            return jax.lax.map(
                lambda args: one_cell(*args),
                (stacked_params, start_tokens, signal_strengths, keys),
            )
        return jax.vmap(one_cell)(
            stacked_params, start_tokens, signal_strengths, keys
        )

    if mesh is None:
        return vmapped(stacked_params, start_tokens, signal_strengths, keys)
    # See _sweep_impl: shard_map keeps every device's cell shard an
    # independent collective-free program.
    spec = P(mesh.axis_names)
    return shard_map(
        vmapped,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(stacked_params, start_tokens, signal_strengths, keys)


def run_landscape_robustness_sweep(
    landscapes: Sequence,
    alphabet,
    starts: Sequence[str],
    signal_strengths: Sequence[float] = (0.0, 0.5, 0.75, 0.9, 1.0),
    seeds: Sequence[int] = (0,),
    rounds: int = 10,
    sequences_batch_size: int = 100,
    model_queries_per_batch: int = 2000,
    mesh: Optional[Mesh] = None,
    chunk_size: Optional[int] = None,
    algorithm: str = "adalead",
    algorithm_kwargs: Optional[dict] = None,
    model: str = "nam",
    surrogate_spec=None,
    checkpoint_dir: Optional[str] = None,
    cell_mode: str = "auto",
) -> pd.DataFrame:
    """Robustness sweep over ANY family of device-fitness landscapes.

    All `landscapes` must share the same `device_fitness()` function
    identity and parameter pytree structure (e.g. several RNABinding
    problems with the same target count and sequence length, or several
    AdditiveAAVPackaging phenotypes) — their params are stacked along the
    cell axis and the fused runner is vmapped over them.

    `algorithm` selects the fused explorer family ("adalead", "random",
    "ga", "cmaes", "bo", "gpr_bo", "dqn", "ppo", "dynappo",
    "dynappo_mutative", "cbas", "dbas");
    `algorithm_kwargs` are its static hyperparameters.

    `model` selects the fused surrogate family: "nam" (sweeps
    `signal_strengths`), "perfect", or "surrogate" — an empirical Flax
    net (`flexs_tpu.runtime.surrogate.SurrogateSpec`, default = the
    paper's CNN) trained in-program each round per cell; with it,
    `signal_strengths` is ignored and should be `[1.0]`.  All fused
    algorithms support all three modes except dynappo/dynappo_mutative,
    which train their own internal ensemble (that pool IS the trained
    surrogate) and raise on model="surrogate".

    `checkpoint_dir` makes chunked sweeps preemption-safe: each completed
    chunk's host-gathered results are written to
    `<dir>/chunk_<i>.npz` and a rerun of the SAME sweep (same grid,
    algorithm, model, budgets — enforced via a manifest signature) skips
    straight past completed chunks.  Most useful with `chunk_size` set on
    long surrogate sweeps.  Single-host feature: with multiple JAX
    processes only process 0 writes (all processes must share the
    filesystem to benefit from resume).

    `cell_mode` schedules the cells *within* each device's shard:
    "vmap" locksteps them (best when per-cell device buffers dominate,
    e.g. NAM sweeps, whose full-batch fitness calls batch across cells),
    "map" runs them sequentially via `lax.map` so each cell's
    data-dependent `while_loop`s run their OWN trip counts — under vmap
    every loop costs the max trips over the whole shard, measured
    1.9-2.3x per-cell inflation on surrogate sweeps (round-4 A/B table
    in BASELINE.md).  "auto" (default) picks "map" for
    model="surrogate" and "vmap" otherwise.  Scores are bit-identical
    across modes (pinned in tests/test_sweep.py); only the schedule
    changes.
    """
    if cell_mode == "auto":
        cell_mode = "map" if model == "surrogate" else "vmap"
    if cell_mode not in ("vmap", "map"):
        raise ValueError("cell_mode must be 'auto', 'vmap' or 'map'")
    alpha: Alphabet = as_alphabet(alphabet)
    fns_params = [land.device_fitness() for land in landscapes]
    fitness_fn = fns_params[0][0]
    if any(fn is not fitness_fn for fn, _ in fns_params):
        raise ValueError("all landscapes must share one device fitness fn")
    # Stack params on the HOST: the full grid's per-cell params copy
    # (cells x leaf) lives in host RAM and only each chunk's slice is
    # uploaded, so chunk_size bounds params HBM alongside run buffers.
    # (np.asarray fetches any device-resident leaves once per landscape.)
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *(p for _, p in fns_params),
    )

    cells = [
        (li, st, ss, sd)
        for li in range(len(landscapes))
        for st in starts
        for ss in signal_strengths
        for sd in seeds
    ]
    land_idx = np.array([c[0] for c in cells], np.int32)
    start_tokens = alpha.encode([c[1] for c in cells])
    ss_arr = np.array([c[2] for c in cells], np.float32)
    seed_arr = np.array([c[3] for c in cells], np.uint32)
    if mesh is not None:
        land_idx, start_tokens, ss_arr, seed_arr = _pad_cells_to_mesh(
            mesh, land_idx, start_tokens, ss_arr, seed_arr
        )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seed_arr))
    cell_params = jax.tree.map(lambda x: x[land_idx], stacked)

    if model not in ("nam", "perfect", "surrogate"):
        raise ValueError("model must be 'nam', 'perfect' or 'surrogate'")
    if model == "surrogate" and surrogate_spec is None:
        from flexs_tpu.runtime.surrogate import SurrogateSpec

        surrogate_spec = SurrogateSpec()
    cfg = AdaleadConfig(
        rounds=rounds,
        sequences_batch_size=sequences_batch_size,
        model_queries_per_batch=model_queries_per_batch,
        alphabet_size=len(alpha),
        perfect_model=(model == "perfect"),
        surrogate=surrogate_spec if model == "surrogate" else None,
    )
    cell_fn = _cell_runner(
        algorithm, tuple(sorted((algorithm_kwargs or {}).items()))
    )

    if mesh is not None and chunk_size is not None:
        # Each chunk shards over the whole mesh, so it must be a mesh
        # multiple; short chunks already pad themselves to chunk_size.
        chunk_size = -(-chunk_size // mesh.devices.size) * mesh.devices.size

    n = len(land_idx)  # padded cell count (shards evenly over the mesh)
    if chunk_size is None or chunk_size >= n:
        slices = [slice(0, n)]
        chunk_size = None  # disable tail padding: one exact-size dispatch
    else:
        slices = [slice(i, min(i + chunk_size, n)) for i in range(0, n, chunk_size)]

    if checkpoint_dir is not None:
        _init_checkpoint_dir(
            checkpoint_dir,
            _sweep_signature(
                algorithm, algorithm_kwargs, model, surrogate_spec, cfg,
                chunk_size, landscapes, fitness_fn,
                land_idx, start_tokens, ss_arr, seed_arr,
            ),
        )

    results = []
    for ci, sl in enumerate(slices):
        if checkpoint_dir is not None:
            chunk_path = _checkpoint_chunk_path(checkpoint_dir, ci)
            have_chunk = os.path.exists(chunk_path)
            if jax.process_count() > 1:
                # Every process must take the same branch (the compute
                # path runs collectives): follow process 0's view, which
                # is also the only writer.  Requires a shared filesystem
                # for the load to succeed everywhere.
                from jax.experimental import multihost_utils

                have_chunk = bool(
                    multihost_utils.broadcast_one_to_all(
                        np.asarray(have_chunk)
                    )
                )
            if have_chunk:
                with np.load(chunk_path) as data:
                    results.append(RunResult(**{k: data[k] for k in data.files}))
                continue
        idx = np.arange(sl.start, sl.stop)
        if chunk_size is not None and len(idx) < chunk_size:
            idx = np.concatenate([idx, np.zeros(chunk_size - len(idx), np.int64)])
        args = (
            jax.tree.map(lambda x: x[idx], cell_params),
            jnp.asarray(start_tokens[idx]),
            jnp.asarray(ss_arr[idx]),
            keys[idx],
        )
        if mesh is not None:
            sharding = NamedSharding(mesh, P(mesh.axis_names))
            args = jax.tree.map(lambda x: jax.device_put(x, sharding), args)
        out = _sweep_generic_impl(
            *args, cfg, fitness_fn, cell_fn, mesh, cell_mode
        )
        # Gather to host numpy BEFORE slicing: on a multi-host mesh the
        # device arrays are not fully addressable, and uneven slices would
        # break the sharding anyway.
        out = multihost.gather_to_host(out)
        out = jax.tree.map(lambda x, k=sl.stop - sl.start: x[:k], out)
        if checkpoint_dir is not None and jax.process_index() == 0:
            # Atomic-ish write: a crash mid-save must not leave a readable
            # partial chunk behind.
            tmp = chunk_path + ".tmp.npz"
            np.savez(tmp, **out._asdict())
            os.replace(tmp, chunk_path)
        results.append(out)
    result = (
        results[0]
        if len(results) == 1
        else jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *results)
    )

    return _summary_df(
        result,
        [(landscapes[li].name, st, ss, sd) for li, st, ss, sd in cells],
    )


def run_efficiency_sweep(
    landscape_names: Sequence[str],
    starts: Sequence[str],
    budgets: Sequence[Tuple[int, int]] = (
        (100, 500),
        (100, 5000),
        (1000, 5000),
        (1000, 10000),
    ),
    signal_strength: float = 0.9,
    seeds: Sequence[int] = (0,),
    rounds: int = 10,
    mesh: Optional[Mesh] = None,
    chunk_size: Optional[int] = None,
    algorithm: str = "adalead",
    algorithm_kwargs: Optional[dict] = None,
    model: str = "nam",
    surrogate_spec=None,
) -> pd.DataFrame:
    """Efficiency evaluator as fused sweeps (reference evaluate.py:40-74).

    Budgets are compile-time constants of the fused runner, so each
    (sequences_batch_size, model_queries_per_batch) pair compiles once and
    sweeps its landscape x start x seed grid on device.  Any fused
    algorithm x model combination is accepted (reference evaluators take
    an arbitrary explorer factory, evaluate.py:40-52).
    """
    frames = []
    for sequences_batch_size, model_queries_per_batch in budgets:
        df = run_robustness_sweep(
            landscape_names=landscape_names,
            starts=starts,
            signal_strengths=[signal_strength],
            seeds=seeds,
            rounds=rounds,
            sequences_batch_size=sequences_batch_size,
            model_queries_per_batch=model_queries_per_batch,
            mesh=mesh,
            chunk_size=chunk_size,
            algorithm=algorithm,
            algorithm_kwargs=algorithm_kwargs,
            model=model,
            surrogate_spec=surrogate_spec,
        )
        df["sequences_batch_size"] = sequences_batch_size
        df["model_queries_per_batch"] = model_queries_per_batch
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def run_adaptivity_sweep(
    landscape_names: Sequence[str],
    starts: Sequence[str],
    num_rounds: Sequence[int] = (1, 10, 100),
    total_ground_truth_measurements: int = 1000,
    total_model_queries: int = 10000,
    signal_strength: float = 0.9,
    seeds: Sequence[int] = (0,),
    mesh: Optional[Mesh] = None,
    chunk_size: Optional[int] = None,
    algorithm: str = "adalead",
    algorithm_kwargs: Optional[dict] = None,
    model: str = "nam",
    surrogate_spec=None,
) -> pd.DataFrame:
    """Adaptivity evaluator as fused sweeps (reference evaluate.py:77-112).

    A fixed total budget is split across 1/10/100 rounds; each split is one
    compiled fused-runner shape sweeping its grid on device.  Any fused
    algorithm x model combination is accepted (reference evaluators take
    an arbitrary explorer factory, evaluate.py:77-90).
    """
    frames = []
    for rounds in num_rounds:
        df = run_robustness_sweep(
            landscape_names=landscape_names,
            starts=starts,
            signal_strengths=[signal_strength],
            seeds=seeds,
            rounds=rounds,
            sequences_batch_size=int(total_ground_truth_measurements / rounds),
            model_queries_per_batch=int(total_model_queries / rounds),
            mesh=mesh,
            chunk_size=chunk_size,
            algorithm=algorithm,
            algorithm_kwargs=algorithm_kwargs,
            model=model,
            surrogate_spec=surrogate_spec,
        )
        df["rounds"] = rounds
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


class SweepCell(NamedTuple):
    """One sweep cell: landscape name index, start, signal strength, seed."""

    landscape: str
    start: str
    signal_strength: float
    seed: int


def run_robustness_sweep(
    landscape_names: Sequence[str],
    starts: Sequence[str],
    signal_strengths: Sequence[float] = (0.0, 0.5, 0.75, 0.9, 1.0),
    seeds: Sequence[int] = (0,),
    rounds: int = 10,
    sequences_batch_size: int = 100,
    model_queries_per_batch: int = 2000,
    mesh: Optional[Mesh] = None,
    alphabet="TGCA",
    chunk_size: Optional[int] = None,
    algorithm: str = "adalead",
    algorithm_kwargs: Optional[dict] = None,
    model: str = "nam",
    surrogate_spec=None,
    checkpoint_dir: Optional[str] = None,
    cell_mode: str = "auto",
) -> pd.DataFrame:
    """Robustness evaluator over TF-binding landscapes as one sharded sweep.

    The on-device analog of reference evaluate.robustness (evaluate.py:8-37)
    crossed with the landscape/start grid of the paper's cloud runner.
    Returns a summary DataFrame with one row per cell (max/final fitness,
    costs) — the quantities the reference's analysis notebooks extract from
    per-run CSVs.

    `algorithm`/`algorithm_kwargs`/`model`/`surrogate_spec` select any
    fused explorer x model combination (the reference evaluators accept an
    arbitrary explorer factory, evaluate.py:8-20); the defaults keep the
    packed-table Adalead+NAM fast path, other combinations route through
    `run_landscape_robustness_sweep`.
    """
    from flexs_tpu.landscapes import tf_binding

    if cell_mode == "auto":
        cell_mode = "map" if model == "surrogate" else "vmap"
    if (
        algorithm != "adalead"
        or algorithm_kwargs
        or model != "nam"
        or checkpoint_dir is not None
        or cell_mode != "vmap"
    ):
        lands = []
        for n in landscape_names:
            land = tf_binding.TFBinding(name=n)
            land.name = n  # summary rows report the problem, not the family
            lands.append(land)
        return run_landscape_robustness_sweep(
            lands,
            alphabet,
            starts=starts,
            signal_strengths=list(signal_strengths),
            seeds=list(seeds),
            rounds=rounds,
            sequences_batch_size=sequences_batch_size,
            model_queries_per_batch=model_queries_per_batch,
            mesh=mesh,
            chunk_size=chunk_size,
            algorithm=algorithm,
            algorithm_kwargs=algorithm_kwargs,
            model=model,
            surrogate_spec=surrogate_spec,
            checkpoint_dir=checkpoint_dir,
            cell_mode=cell_mode,
        )

    alpha: Alphabet = as_alphabet(alphabet)
    names, packed = tf_binding._packed_tables()
    name_to_idx = {n: i for i, n in enumerate(names)}
    used = sorted({name_to_idx[n] for n in landscape_names})
    tables = np.asarray(packed)[used]
    local_idx = {names[i]: j for j, i in enumerate(used)}

    cells: List[SweepCell] = [
        SweepCell(ln, st, ss, sd)
        for ln in landscape_names
        for st in starts
        for ss in signal_strengths
        for sd in seeds
    ]
    table_idx = np.array([local_idx[c.landscape] for c in cells], np.int32)
    start_tokens = alpha.encode([c.start for c in cells])
    ss_arr = np.array([c.signal_strength for c in cells], np.float32)
    seed_arr = np.array([c.seed for c in cells], np.int64)

    if mesh is not None:
        table_idx, start_tokens, ss_arr, seed_arr = _pad_cells_to_mesh(
            mesh, table_idx, start_tokens, ss_arr, seed_arr
        )

    cfg = AdaleadConfig(
        rounds=rounds,
        sequences_batch_size=sequences_batch_size,
        model_queries_per_batch=model_queries_per_batch,
        alphabet_size=len(alpha),
    )
    result = sweep_adalead_nam(
        tables,
        table_idx,
        start_tokens,
        ss_arr,
        seed_arr,
        cfg,
        mesh=mesh,
        chunk_size=chunk_size,
    )
    result = jax.tree.map(np.asarray, result)
    return _summary_df(result, cells)
