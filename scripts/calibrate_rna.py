"""Calibrate the RNA duplex energy model against shipped oracle outputs.

The reference ships ~2.4k L14_RNA1 sequences scored by the real ViennaRNA
(examples/robustness/adalead/*.csv `true_score` column).  The duplex DP in
flexs_tpu/ops/rna_duplex.py is differentiable (min-plus subgradients) and
its round-2 energy model carries every sequence-dependent term of
ViennaRNA's E_IntLoop in exact functional form (stacks, 1-bulge
stack-through, joint 1x1 table, per-side interior mismatches, end
mismatches), so this script fits ALL tables by Adam on an 80/20
train/holdout split, regularized toward physically-initialized values,
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
STEPS = int(os.environ.get("CALIBRATE_STEPS", 3000))
LR = 3e-3


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


def build_static_structure(maxloop):
    """Static index/mask arrays for assembling the size-cost tables."""
    d = maxloop + 2
    int_valid = np.zeros((d, d), bool)
    int_tot = np.zeros((d, d), np.int32)
    int_asym = np.zeros((d, d), np.float32)
    for di in range(2, d):
        for dj in range(2, d):
            n1, n2 = di - 1, dj - 1
            if n1 + n2 > maxloop or (n1 == 1 and n2 == 1):
                continue
            int_valid[di, dj] = True
            int_tot[di, dj] = n1 + n2
            int_asym[di, dj] = abs(n1 - n2)
    return jnp.asarray(int_valid), jnp.asarray(int_tot), jnp.asarray(int_asym)


def main():
    A, x_train, y_train, x_val, y_val = load_data()
    target_rev = jnp.asarray(A.encode_one(TARGET))[::-1]
    comp = {"A": "U", "C": "G", "G": "C", "U": "A"}
    complement = "".join(comp[x] for x in TARGET)[::-1]
    comp_tokens = jnp.asarray(A.encode_one(complement))

    int_valid, int_tot, int_asym = build_static_structure(MAXLOOP)
    d = MAXLOOP + 2

    p0 = rd.DuplexParams(maxloop=MAXLOOP)
    theta0 = {
        "stack": jnp.asarray(p0.stack[1:, 1:]),
        "mA": jnp.asarray(p0.mA),
        "mB": jnp.asarray(p0.mB),
        "int11": jnp.asarray(p0.int11),
        "ext5": jnp.asarray(p0.ext5),
        "ext3": jnp.asarray(p0.ext3),
        "bulge_v": jnp.asarray(p0.bulge_sizes),
        "interior_v": jnp.asarray(p0.interior_sizes),
        "duplex_init": jnp.float32(p0.duplex_init),
        "terminal_au": jnp.float32(p0.terminal_au),
        "ninio": jnp.float32(p0.ninio),
    }
    ninio_max = p0.ninio_max
    # Per-leaf L2 pull toward the physical init (the data can't constrain
    # every table entry; unvisited entries must stay physical).  Kept well
    # below the data loss scale so the pull only disambiguates unvisited
    # entries.
    reg_w = {
        "stack": 0.01,
        "mA": 0.005,
        "mB": 0.005,
        "int11": 0.005,
        "ext5": 0.005,
        "ext3": 0.005,
        "bulge_v": 0.005,
        "interior_v": 0.005,
        "duplex_init": 0.005,
        "terminal_au": 0.005,
        "ninio": 0.005,
    }

    def assemble(theta):
        stack = (
            jnp.full((7, 7), rd._INF, jnp.float32).at[1:, 1:].set(theta["stack"])
        )
        interior_cost = jnp.where(
            int_valid,
            theta["interior_v"][int_tot]
            + jnp.minimum(ninio_max, theta["ninio"] * int_asym),
            rd._INF,
        )
        r_idx = np.arange(d - 1)
        bulge_seq = jnp.where(
            jnp.asarray((r_idx >= 2) & (r_idx <= MAXLOOP)),
            theta["bulge_v"][jnp.asarray(np.minimum(r_idx, MAXLOOP))],
            rd._INF,
        )
        dj_idx = np.arange(d)
        bulge_tgt = jnp.where(
            jnp.asarray((dj_idx >= 3) & (dj_idx - 1 <= MAXLOOP)),
            theta["bulge_v"][jnp.asarray(np.minimum(dj_idx - 1, MAXLOOP))],
            rd._INF,
        )
        return {
            "stack": stack,
            "mA": theta["mA"],
            "mB": theta["mB"],
            "int11": theta["int11"],
            "ext5": theta["ext5"],
            "ext3": theta["ext3"],
            "interior_cost": interior_cost,
            "bulge_seq": bulge_seq,
            "bulge_tgt": bulge_tgt,
            "consts": jnp.stack(
                [
                    theta["duplex_init"],
                    theta["terminal_au"],
                    theta["bulge_v"][1],
                    jnp.float32(0.0),
                ]
            ),
        }

    def predict(theta, tokens):
        em = assemble(theta)
        energies = jax.vmap(lambda s: rd._duplex_dp(s, target_rev, em, MAXLOOP))(
            tokens
        )
        norm_e = (
            rd._duplex_dp(comp_tokens, target_rev, em, MAXLOOP)
            * tokens.shape[1]
            / target_rev.shape[0]
        )
        return energies / norm_e

    def reg_term(theta):
        return sum(
            reg_w[k] * jnp.mean(jnp.square(theta[k] - theta0[k])) for k in theta
        )

    @jax.jit
    def loss_mse(theta, tokens, truth):
        pred = predict(theta, tokens)
        return jnp.mean(jnp.square(pred - truth)) + reg_term(theta)

    @jax.jit
    def loss_huber(theta, tokens, truth):
        # Phase 2 targets the MAE gate directly (delta well below the
        # round-1 residual scale, so the tails stop dominating).
        pred = predict(theta, tokens)
        err = optax.huber_loss(pred, truth, delta=0.005)
        return jnp.mean(err) + 0.001 * reg_term(theta)

    x_train_j = jnp.asarray(x_train)
    y_train_j = jnp.asarray(y_train)
    x_val_j = jnp.asarray(x_val)

    @jax.jit
    def val_pred(theta):
        return predict(theta, x_val_j)

    def metrics(theta):
        pred_val = np.asarray(val_pred(theta))
        mae = float(np.abs(pred_val - y_val).mean())
        corr = float(np.corrcoef(pred_val, y_val)[0, 1])
        return corr, mae, pred_val

    theta = theta0
    for phase, (loss_fn, lr, steps) in enumerate(
        [(loss_mse, LR, STEPS), (loss_huber, 1e-3, 2 * STEPS)]
    ):
        tx = optax.adam(lr)
        opt_state = tx.init(theta)

        @jax.jit
        def step(theta, opt_state, tokens, truth, loss_fn=loss_fn, tx=tx):
            loss, grads = jax.value_and_grad(loss_fn)(theta, tokens, truth)
            updates, opt_state = tx.update(grads, opt_state, theta)
            return optax.apply_updates(theta, updates), opt_state, loss

        for i in range(steps):
            theta, opt_state, loss = step(theta, opt_state, x_train_j, y_train_j)
            if i % 200 == 0:
                corr, mae, _ = metrics(theta)
                print(
                    f"phase {phase} step {i}: train loss {float(loss):.5f} "
                    f"holdout pearson {corr:.4f} MAE {mae:.4f}",
                    flush=True,
                )

    # Holdout metrics + residual shape (is the error bulk or tail?).
    corr, mae, pred_val = metrics(theta)
    res = np.abs(pred_val - y_val)
    print(f"holdout: pearson {corr:.4f}, MAE {mae:.4f}")
    print(
        "residual percentiles:",
        {p: round(float(np.percentile(res, p)), 4) for p in (50, 75, 90, 95, 99)},
        flush=True,
    )

    stack_full = np.full((7, 7), rd._INF, np.float32)
    stack_full[1:, 1:] = np.asarray(theta["stack"])
    np.savez(
        OUT,
        stack=stack_full,
        mA=np.asarray(theta["mA"]),
        mB=np.asarray(theta["mB"]),
        int11=np.asarray(theta["int11"]),
        ext5=np.asarray(theta["ext5"]),
        ext3=np.asarray(theta["ext3"]),
        bulge_sizes=np.asarray(theta["bulge_v"]),
        interior_sizes=np.asarray(theta["interior_v"]),
        duplex_init=float(theta["duplex_init"]),
        terminal_au=float(theta["terminal_au"]),
        ninio=float(theta["ninio"]),
        ninio_max=ninio_max,
        maxloop=MAXLOOP,
        holdout_pearson=corr,
        holdout_mae=mae,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
