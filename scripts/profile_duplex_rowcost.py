"""Isolate the duplex kernel's constant ~4 us/row cost (round 3).

Round-3 measurements established the per-row cost is INVARIANT to:
maxloop (op count), matmul batching (v4), group width, and loop
unrolling.  The remaining suspects are structural:

  A. baseline v3 kernel;
  B. v3 with the per-row dynamic record read replaced by a constant
     (tests: is the [S, 4] dynamic-index VMEM read the fixed cost?);
  C. v3 with the row loop FULLY UNROLLED as a python loop (tests: is it
     fori_loop iteration overhead / dynamic indexing, since unrolling
     makes every index static?);
  D. v3 with windows kept in loop-carry VALUES instead of VMEM scratch
     (tests: is it scratch read/write synchronization?).

Each variant is numerically wrong except A — timing only.

Run: python scripts/profile_duplex_rowcost.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexs_tpu.ops import rna_duplex as rd
from flexs_tpu.ops import pallas_duplex as pd

_INF = rd._INF
_OPEN, _STACK, _B1S, _B1T, _I11, _MB, _MA, _AU, _CLOSE = range(9)


def make_kernel(variant: str, d, l1, l2):
    def kernel(recs_ref, tbl_ref, row0_ref, rowl_ref, icost_ref, bseq_ref,
               btgt_ref, out_ref, win_c, win_ca, win_cw, best):
        sublanes = win_c.shape[1]
        l2p = win_c.shape[2]
        maxloop = d - 2

        win_c[...] = jnp.full(win_c.shape, _INF, jnp.float32)
        win_ca[...] = jnp.full(win_ca.shape, _INF, jnp.float32)
        win_cw[...] = jnp.full(win_cw.shape, _INF, jnp.float32)
        best[...] = jnp.full(best.shape, _INF, jnp.float32)

        col = jax.lax.broadcasted_iota(jnp.int32, (sublanes, l2p), 1)

        def shift_right(rows, k):
            rolled = pltpu.roll(rows, k, axis=1)
            return jnp.where(col < k, _INF, rolled)

        interior_combos = [
            (r, dj)
            for dj in range(2, d)
            for r in range(1, d - 1)
            if (r + dj - 1) <= maxloop and not (r == 1 and dj == 2)
        ]
        rec_col = jax.lax.broadcasted_iota(jnp.int32, (sublanes, pd._REC), 1)

        carry_windows = variant == "carry-windows"

        def body_common(i, rec, wins):
            if carry_windows:
                wc, wca, wcw, bst = wins
                rd_c = lambda r: wc[r]
                rd_ca = lambda r: wca[r]
                rd_cw = lambda r: wcw[r]
            else:
                rd_c = lambda r: win_c[r]
                rd_ca = lambda r: win_ca[r]
                rd_cw = lambda r: win_cw[r]

            idx3 = rec[:, 0:1]
            idx2 = rec[:, 1:2]
            m3 = (rec_col < 64) & (rec_col.astype(jnp.float32) == idx3)
            m2 = (rec_col >= 64) & (rec_col < 80) & (
                (rec_col - 64).astype(jnp.float32) == idx2
            )
            operand = jnp.where(m3 | m2, 1.0, 0.0)
            all9 = jax.lax.dot_general(
                operand, tbl_ref[...], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

            def chan(c):
                return all9[:, c * l2p:(c + 1) * l2p]

            open_e = chan(_OPEN)
            open_e = jnp.where(i == 0, row0_ref[0], open_e)
            open_e = jnp.where(col == 0, rec[:, 2:3], open_e)
            close_e = chan(_CLOSE)
            close_e = jnp.where(i == l1 - 1, rowl_ref[0], close_e)
            close_e = jnp.where(col == l2 - 1, rec[:, 3:4], close_e)

            acc = jnp.minimum(open_e, shift_right(rd_c(0), 1) + chan(_STACK))
            acc = jnp.minimum(acc, shift_right(rd_c(1), 1) + chan(_B1S))
            acc = jnp.minimum(acc, shift_right(rd_c(0), 2) + chan(_B1T))
            acc = jnp.minimum(acc, shift_right(rd_c(1), 2) + chan(_I11))

            loop_min = None
            for dj in range(2, d):
                col_min = None
                for r, dj2 in interior_combos:
                    if dj2 != dj:
                        continue
                    cand = rd_ca(r) + icost_ref[r + 1, dj]
                    col_min = cand if col_min is None else jnp.minimum(col_min, cand)
                if col_min is None:
                    continue
                shifted = shift_right(col_min, dj)
                loop_min = shifted if loop_min is None else jnp.minimum(loop_min, shifted)
            acc = jnp.minimum(acc, loop_min + chan(_MB))

            au_e = chan(_AU)
            bs_min = None
            for r in range(2, maxloop + 1):
                cand = rd_cw(r) + bseq_ref[r]
                bs_min = cand if bs_min is None else jnp.minimum(bs_min, cand)
            acc = jnp.minimum(acc, shift_right(bs_min, 1) + au_e)
            bt_min = None
            for dj in range(3, maxloop + 2):
                cand = shift_right(rd_cw(0), dj) + btgt_ref[dj]
                bt_min = cand if bt_min is None else jnp.minimum(bt_min, cand)
            acc = jnp.minimum(acc, bt_min + au_e)

            acc = jnp.where(open_e >= _INF / 2, _INF, acc)

            if carry_windows:
                bst = jnp.minimum(bst, jnp.min(acc + close_e, axis=1, keepdims=True))
                wc = jnp.concatenate([acc[None], wc[: d - 2]], axis=0)
                wca = jnp.concatenate([(acc + chan(_MA))[None], wca[: d - 2]], axis=0)
                wcw = jnp.concatenate([(acc + au_e)[None], wcw[: d - 2]], axis=0)
                return (wc, wca, wcw, bst)
            best[...] = jnp.minimum(
                best[...], jnp.min(acc + close_e, axis=1, keepdims=True)
            )
            win_c[...] = jnp.concatenate([acc[None], win_c[: d - 2]], axis=0)
            win_ca[...] = jnp.concatenate([(acc + chan(_MA))[None], win_ca[: d - 2]], axis=0)
            win_cw[...] = jnp.concatenate([(acc + au_e)[None], win_cw[: d - 2]], axis=0)
            return None

        if variant == "unrolled":
            for i in range(l1):
                body_common(i, recs_ref[0, i], None)
        elif variant == "const-rec":
            const_rec = jnp.ones((sublanes, 4), jnp.float32)

            def body(i, _):
                body_common(i, const_rec, None)
                return 0

            jax.lax.fori_loop(0, l1, body, 0)
        elif variant == "carry-windows":
            wins0 = (
                jnp.full((d - 1, sublanes, l2p), _INF, jnp.float32),
                jnp.full((d - 1, sublanes, l2p), _INF, jnp.float32),
                jnp.full((d - 1, sublanes, l2p), _INF, jnp.float32),
                jnp.full((sublanes, 1), _INF, jnp.float32),
            )

            def body(i, wins):
                return body_common(i, recs_ref[0, i], wins)

            wins = jax.lax.fori_loop(0, l1, body, wins0)
            best[...] = wins[3]
        else:  # baseline

            def body(i, _):
                body_common(i, recs_ref[0, i], None)
                return 0

            jax.lax.fori_loop(0, l1, body, 0)

        result = jnp.where(best[...] >= _INF / 2, 0.0, best[...])
        out_ref[0] = jnp.broadcast_to(result, (sublanes, 128))

    return kernel


@partial(jax.jit, static_argnames=("maxloop", "variant", "group"))
def run_variant(seq_tokens, target_rev, em, maxloop, variant, group=64):
    d = maxloop + 2
    b, l1 = seq_tokens.shape
    l2 = target_rev.shape[0]
    l2p = ((l2 + 127) // 128) * 128
    bp = ((b + group - 1) // group) * group
    if bp != b:
        seq_tokens = jnp.pad(seq_tokens, [(0, bp - b), (0, 0)])
    groups = bp // group

    tbl = pd._contracted_tables(target_rev, em, l2p)
    rec, open_row0, close_rowl = pd._records_and_patches(
        seq_tokens, target_rev, em, l2p
    )
    rec = rec.reshape(groups, group, l1, 4).transpose(0, 2, 1, 3)
    open_row0 = open_row0.reshape(groups, group, l2p)
    close_rowl = close_rowl.reshape(groups, group, l2p)

    out = pl.pallas_call(
        make_kernel(variant, d, l1, l2),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((1, l1, group, 4), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((pd._REC, 9 * l2p), lambda g: (0, 0)),
            pl.BlockSpec((1, group, l2p), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, group, l2p), lambda g: (g, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, group, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((groups, group, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((group, 1), jnp.float32),
        ],
        interpret=False,
    )(rec, tbl, open_row0, close_rowl, em["interior_cost"],
      em["bulge_seq"], em["bulge_tgt"])
    return out[:, :, 0].reshape(bp)[:b]


def bench(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    params = rd.DuplexParams.calibrated()
    em = params.energy_model()
    target_rev = jnp.asarray(rng.integers(0, 4, 100, dtype=np.int32))[::-1]
    tokens = jnp.asarray(rng.integers(0, 4, size=(4096, 100), dtype=np.int32))

    ref = np.asarray(
        run_variant(tokens[:64], target_rev, em, params.maxloop, "baseline")
    )
    for variant in ("baseline", "const-rec", "carry-windows", "unrolled"):
        try:
            t = bench(
                lambda tk, v=variant: run_variant(tk, target_rev, em,
                                                  params.maxloop, v),
                tokens,
            )
            out = np.asarray(
                run_variant(tokens[:64], target_rev, em, params.maxloop,
                            variant)
            )
            ok = np.array_equal(ref, out)
            print(f"{variant:14s}: {t*1e3:8.2f} ms ({4096/t:9.0f} seq/s)"
                  f"  correct={ok}", flush=True)
        except Exception as e:
            print(f"{variant:14s}: FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
