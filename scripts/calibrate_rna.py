"""Calibrate the RNA duplex energy model against shipped oracle outputs.

The reference ships ~2.4k L14_RNA1 sequences scored by the real ViennaRNA
(examples/robustness/adalead/*.csv `true_score` column).  The duplex DP in
flexs_tpu/ops/rna_duplex.py is differentiable (min-plus subgradients), so
this script fits its stacking table and scalar constants by Adam on an
80/20 train/holdout split, regularized toward the published Turner values,
and writes the result to flexs_tpu/landscapes/data/rna_duplex_params.npz.

Holdout metrics are printed at the end; tests/test_rna_landscape.py pins
them as a regression gate.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
import optax

from flexs_tpu.alphabet import Alphabet, RNAA
from flexs_tpu.ops import rna_duplex as rd

REFERENCE_CSVS = "/root/reference/examples/robustness/adalead/*.csv"
TARGET = (
    "GAACGAGGCACAUUCCGGCUCGCCCGGCCCAUGUGAGCAUGGGCCGGACCCCGUCCGCGCGGGGCCCCC"
    "GCGCGGACGGGGGCGAGCCGGAAUGUGCCUC"
)
MAXLOOP = 16
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flexs_tpu",
    "landscapes",
    "data",
    "rna_duplex_params.npz",
)


def load_data():
    A = Alphabet(RNAA)
    data = {}
    for f in sorted(glob.glob(REFERENCE_CSVS)):
        df = pd.read_csv(f, skiprows=1)
        for s, t in zip(df["sequence"], df["true_score"]):
            data[s] = t
    seqs = sorted(data.keys())
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(seqs))
    seqs = [seqs[i] for i in perm]
    truth = np.array([data[s] for s in seqs], np.float32)
    tokens = A.encode(seqs)
    n_train = int(0.8 * len(seqs))
    return A, tokens[:n_train], truth[:n_train], tokens[n_train:], truth[n_train:]


def build_static_masks(maxloop):
    """Static structure of the loop-cost matrix (sizes, masks, bases)."""
    d = maxloop + 2
    bulge = rd._loop_tail(rd._BULGE, 2 * d)
    interior = rd._loop_tail(rd._INTERIOR, 2 * d)
    bulge_mask = np.zeros((d, d), bool)
    one_mask = np.zeros((d, d), bool)
    interior_mask = np.zeros((d, d), bool)
    base = np.zeros((d, d), np.float32)
    asym = np.zeros((d, d), np.float32)
    for di in range(1, d):
        for dj in range(1, d):
            n1, n2 = di - 1, dj - 1
            if n1 + n2 > maxloop or (n1 == 0 and n2 == 0):
                continue
            if n1 == 0 or n2 == 0:
                n = max(n1, n2)
                bulge_mask[di, dj] = True
                one_mask[di, dj] = n == 1
                base[di, dj] = bulge[n]
            else:
                interior_mask[di, dj] = True
                base[di, dj] = interior[n1 + n2]
                asym[di, dj] = abs(n1 - n2)
    return (
        jnp.asarray(bulge_mask),
        jnp.asarray(one_mask),
        jnp.asarray(interior_mask),
        jnp.asarray(base),
        jnp.asarray(asym),
    )


def main():
    A, x_train, y_train, x_val, y_val = load_data()
    target_rev = jnp.asarray(A.encode_one(TARGET))[::-1]
    comp = {"A": "U", "C": "G", "G": "C", "U": "A"}
    complement = "".join(comp[x] for x in TARGET)[::-1]
    comp_tokens = jnp.asarray(A.encode_one(complement))

    bulge_mask, one_mask, interior_mask, base, asym = build_static_masks(MAXLOOP)
    stack0 = jnp.asarray(rd.STACK[1:, 1:])

    theta0 = {
        "stack": stack0,
        "duplex_init": jnp.float32(4.10),
        "terminal_au": jnp.float32(0.50),
        "end_bonus": jnp.float32(-0.90),
        "ninio": jnp.float32(0.60),
        "interior_mismatch": jnp.float32(-0.80),
        "bulge1_stack": jnp.float32(-2.00),
    }
    ninio_max = 3.0

    def assemble(theta):
        stack = jnp.full((7, 7), rd._INF, jnp.float32).at[1:, 1:].set(theta["stack"])
        consts = jnp.stack(
            [
                theta["duplex_init"],
                theta["terminal_au"],
                theta["end_bonus"],
                jnp.float32(0.0),
            ]
        )
        loop_cost = jnp.full(base.shape, rd._INF, jnp.float32)
        loop_cost = jnp.where(
            bulge_mask,
            base + theta["bulge1_stack"] * one_mask,
            loop_cost,
        )
        loop_cost = jnp.where(
            interior_mask,
            base
            + jnp.minimum(ninio_max, theta["ninio"] * asym)
            + theta["interior_mismatch"],
            loop_cost,
        )
        return stack, consts, loop_cost

    def predict(theta, tokens):
        stack, consts, loop_cost = assemble(theta)
        energies = jax.vmap(
            lambda s: rd._duplex_dp(s, target_rev, stack, consts, loop_cost, MAXLOOP)
        )(tokens)
        norm_e = (
            rd._duplex_dp(comp_tokens, target_rev, stack, consts, loop_cost, MAXLOOP)
            * tokens.shape[1]
            / target_rev.shape[0]
        )
        return energies / norm_e

    @jax.jit
    def loss_fn(theta, tokens, truth):
        pred = predict(theta, tokens)
        mse = jnp.mean(jnp.square(pred - truth))
        reg = 0.02 * jnp.mean(jnp.square(theta["stack"] - stack0))
        for k in theta:
            if k != "stack":
                reg = reg + 0.01 * jnp.square(theta[k] - theta0[k])
        return mse + reg

    tx = optax.adam(3e-3)
    theta = theta0
    opt_state = tx.init(theta)

    @jax.jit
    def step(theta, opt_state, tokens, truth):
        loss, grads = jax.value_and_grad(loss_fn)(theta, tokens, truth)
        updates, opt_state = tx.update(grads, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, loss

    x_train_j = jnp.asarray(x_train)
    y_train_j = jnp.asarray(y_train)
    for i in range(400):
        theta, opt_state, loss = step(theta, opt_state, x_train_j, y_train_j)
        if i % 50 == 0:
            print(f"step {i}: train loss {float(loss):.5f}")

    # Holdout metrics.
    pred_val = np.asarray(predict(theta, jnp.asarray(x_val)))
    mae = float(np.abs(pred_val - y_val).mean())
    corr = float(np.corrcoef(pred_val, y_val)[0, 1])
    print(f"holdout: pearson {corr:.4f}, MAE {mae:.4f}")

    stack_full = np.full((7, 7), rd._INF, np.float32)
    stack_full[1:, 1:] = np.asarray(theta["stack"])
    np.savez(
        OUT,
        stack=stack_full,
        duplex_init=float(theta["duplex_init"]),
        terminal_au=float(theta["terminal_au"]),
        end_bonus=float(theta["end_bonus"]),
        ninio=float(theta["ninio"]),
        ninio_max=ninio_max,
        interior_mismatch=float(theta["interior_mismatch"]),
        bulge1_stack=float(theta["bulge1_stack"]),
        maxloop=MAXLOOP,
        holdout_pearson=corr,
        holdout_mae=mae,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
