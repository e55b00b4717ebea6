"""Checkpoint/resume for long runs (a subsystem the reference lacks).

The reference's only recovery mechanism is its per-round log rewrite: the
measured-sequence CSV is effectively a checkpoint of the DATA, but model
weights, optimizer state, RL agents, VAE snapshots, and explorer state are
unrecoverable after a crash (SURVEY.md §5).  This module adds both halves:

  * `save_run` / `load_run` — the measured DataFrame + metadata in the
    exact one-JSON-line + CSV log format (reference explorer.py:100-107),
    so a resumed run continues the same file a crashed run left behind;
  * `save_state` / `load_state` — arbitrary JAX pytrees (Flax params,
    optimizer state, PRNG keys, device buffers) via orbax.

`resume_explorer` restores the data half for any Explorer subclass and
retrains the surrogate from the logged history; explorer-INTERNAL state
restarts fresh (see its docstring) — snapshot that separately with
`save_state`/`load_state` when bitwise resume matters.
"""
import json
import os
from typing import Dict, Tuple

import numpy as np
import pandas as pd


def save_run(path: str, sequences_data: pd.DataFrame, metadata: Dict) -> None:
    """Write metadata + measured data in the standard log format.

    Atomic (tmp + rename): a crash mid-write must not destroy the
    previous complete log — it is the only recovery record.
    """
    dir_path, _ = os.path.split(path)
    if dir_path:
        os.makedirs(dir_path, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(metadata, f)
        f.write("\n")
        sequences_data.to_csv(f, index=False)
    os.replace(tmp, path)


def load_run(path: str) -> Tuple[pd.DataFrame, Dict]:
    """Read a run log back into (sequences_data, metadata)."""
    with open(path) as f:
        metadata = json.loads(f.readline())
        sequences_data = pd.read_csv(f)
    return sequences_data, metadata


def save_state(path: str, state) -> None:
    """Checkpoint a JAX pytree (params/opt state/keys) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, state, force=True)


def load_state(path: str, template=None):
    """Restore a pytree checkpoint (optionally into `template`'s structure)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    if template is not None:
        return checkpointer.restore(path, item=template)
    return checkpointer.restore(path)


def resume_explorer(
    explorer,
    landscape,
    log_file: str,
    verbose: bool = True,
) -> Tuple[pd.DataFrame, Dict]:
    """Run `explorer`, resuming from `log_file` if it exists.

    Completed rounds are replayed from the log (no oracle cost); the
    remaining rounds execute normally and keep appending to the same file.

    What is restored: the measured DataFrame, both cost counters, and the
    surrogate (retrained once on the full history — cumulative-training
    models like the NAM cache restore exactly).  What is NOT restored:
    explorer-INTERNAL state (RL policies, VAE snapshots, CMA-ES
    covariances) — those restart fresh, so a resumed RL/generative run is
    distributionally, not bitwise, equivalent to an uninterrupted one.
    Callers that need exact internal state can snapshot their own pytrees
    with `save_state`/`load_state` alongside the log.
    """
    if not os.path.exists(log_file):
        dir_path, _ = os.path.split(log_file)
        if dir_path:
            # Explorer.__init__ only makedirs for a ctor-passed log_file;
            # setting the attribute directly would crash _log otherwise.
            os.makedirs(dir_path, exist_ok=True)
        explorer.log_file = log_file
        return explorer.run(landscape, verbose=verbose)

    sequences_data, metadata = load_run(log_file)
    # Refuse to stitch two different experiments into one file.  `rounds`
    # is deliberately NOT checked: resuming with a higher target extends
    # a finished-or-interrupted run, a supported pattern.
    expect = {
        "exp_name": explorer.name,
        "model_name": explorer.model.name,
        "landscape_name": landscape.name,
        "sequences_batch_size": explorer.sequences_batch_size,
        "model_queries_per_batch": explorer.model_queries_per_batch,
    }
    bad = {
        k: (metadata.get(k), v)
        for k, v in expect.items()
        if metadata.get(k) != v
    }
    if bad:
        raise ValueError(
            f"{log_file} holds a DIFFERENT experiment; mismatched "
            f"(logged, expected) fields: {bad}"
        )
    done_rounds = int(sequences_data["round"].max())
    if done_rounds >= explorer.rounds:
        return sequences_data, metadata

    # Rebuild internal state: cost counters and the measured set.  (The
    # round loop below trains the model on the full history first thing,
    # exactly like Explorer.run.)
    landscape.add_cost(len(sequences_data))
    explorer.model.cost = int(sequences_data["model_cost"].iloc[-1])

    import time

    for r in range(done_rounds + 1, explorer.rounds + 1):
        round_start = time.time()
        explorer.model.train(
            sequences_data["sequence"].to_numpy(),
            sequences_data["true_score"].to_numpy(),
        )
        seqs, preds = explorer.propose_sequences(sequences_data)
        true_score = landscape.get_fitness(seqs)
        sequences_data = pd.concat(
            [
                sequences_data,
                pd.DataFrame(
                    {
                        "sequence": np.asarray(seqs),
                        "model_score": np.asarray(preds, dtype=np.float64),
                        "true_score": np.asarray(true_score, dtype=np.float64),
                        "round": r,
                        "model_cost": explorer.model.cost,
                        "measurement_cost": len(sequences_data) + len(seqs),
                    }
                ),
            ],
            ignore_index=True,
        )
        save_run(log_file, sequences_data, metadata)
        if verbose:
            print(
                f"round: {r}, top: {sequences_data['true_score'].max()}, "
                f"time: {time.time() - round_start:02f}s (resumed)"
            )
    return sequences_data, metadata
