"""Pallas TPU kernel for the RNA duplex DP (the benchmark's hottest oracle).

The XLA path (flexs_tpu/ops/rna_duplex.py) expresses the recursion as a
`lax.scan` whose body materializes a [D-2, D-2, L2] rolled tensor per row.
This kernel keeps the entire rolling DP window in VMEM and walks the rows
with on-chip shifts — no HBM round trip inside the recursion at all.

Design (v2 — replaces the round-1 kernel whose grid was (groups, L1) and
which paid a fixed per-grid-step cost ~0.2-0.4 ms on this toolchain, see
CLAUDE.md "per-dispatch costs"):

  * grid = (batch_groups,): ONE grid step per 64 sequences; the row loop
    lives inside the kernel as a `fori_loop`;
  * all sequence-dependent energies (pair opens/closes, stack transitions,
    1-bulge stack-throughs, the joint 1x1 table, interior mismatches) are
    gathered OUTSIDE the kernel by plain XLA ops into one packed slab
    [groups, L1, 9, SUBLANES, L2p] that stays in HBM (memory_space=ANY);
  * each row's [9, SUBLANES, L2p] slab is DMA'd into a double-buffered
    VMEM scratch, overlapping the copy of row i+1 with the compute of
    row i, so the kernel body is pure min-plus arithmetic on lane-aligned
    tiles;
  * the three [D-1, SUBLANES, L2p] window channels (raw, +interior
    mismatch, +bulge-AU) live in VMEM scratch across rows;
  * the scalar size-cost tables sit in SMEM.

`duplex_energy_batch_pallas` matches `rna_duplex.duplex_energy_batch`
numerically (tests/test_pallas_duplex.py); `interpret=True` is selected
automatically off-TPU so the kernel stays testable on the CPU mesh.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexs_tpu.ops import rna_duplex as rd

_INF = rd._INF

# Slab channel indices in the packed per-row tensor.
_OPEN, _STACK, _B1S, _B1T, _I11, _MB, _MA, _AU, _CLOSE = range(9)
_N_SLABS = 9

SUBLANES = 64  # sequences per program instance (8 VPU sublane tiles deep)


# Per-cell slabs come from the trigram-factored one-hot-matmul builder in
# rna_duplex (shared channel order); see rd.build_slabs.


def _duplex_kernel(
    slabs_hbm, icost_ref, bseq_ref, btgt_ref, out_ref,
    buf, win_c, win_ca, win_cw, best, sem, *, d, l1
):
    """One program per 64-sequence group; rows walked by a fori_loop.

    slabs_hbm: ANY-space f32[G, L1, 9, S, L2p] — row slabs DMA'd in.
    icost/bseq/btgt: SMEM size-cost tables (interior [d, d], bulges).
    Scratch: buf f32[2, 9, S, L2p] double buffer, three window channels
    f32[d-1, S, L2p], best f32[S, 1], sem: 2 DMA semaphores.
    """
    g = pl.program_id(0)
    l2p = buf.shape[3]
    sublanes = buf.shape[2]
    maxloop = d - 2

    win_c[...] = jnp.full(win_c.shape, _INF, jnp.float32)
    win_ca[...] = jnp.full(win_ca.shape, _INF, jnp.float32)
    win_cw[...] = jnp.full(win_cw.shape, _INF, jnp.float32)
    best[...] = jnp.full(best.shape, _INF, jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (sublanes, l2p), 1)

    def shift_right(rows, k):
        # rows [S, L2p] shifted right by k lanes; vacated lanes -> +inf.
        rolled = pltpu.roll(rows, k, axis=1)
        return jnp.where(col < k, _INF, rolled)

    def row_dma(slot, i):
        return pltpu.make_async_copy(
            slabs_hbm.at[g, i], buf.at[slot], sem.at[slot]
        )

    row_dma(0, 0).start()

    # Statically valid generic-interior combos: window row r holds DP row
    # i-1-r => di = r+1; n1 = di-1, n2 = dj-1; skip the 1x1 (joint table).
    interior_combos = [
        (r, dj)
        for dj in range(2, d)
        for r in range(1, d - 1)
        if (r + dj - 1) <= maxloop and not (r == 1 and dj == 2)
    ]

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < l1)
        def _():
            row_dma(1 - slot, i + 1).start()

        row_dma(slot, i).wait()

        open_e = buf[slot, _OPEN]
        acc = jnp.minimum(open_e, shift_right(win_c[0], 1) + buf[slot, _STACK])
        acc = jnp.minimum(acc, shift_right(win_c[1], 1) + buf[slot, _B1S])
        acc = jnp.minimum(acc, shift_right(win_c[0], 2) + buf[slot, _B1T])
        acc = jnp.minimum(acc, shift_right(win_c[1], 2) + buf[slot, _I11])

        # Generic interior loops: dj-outer, rows reduced sequentially.
        loop_min = None
        for dj in range(2, d):
            col_min = None
            for r, dj2 in interior_combos:
                if dj2 != dj:
                    continue
                cand = win_ca[r] + icost_ref[r + 1, dj]
                col_min = cand if col_min is None else jnp.minimum(col_min, cand)
            if col_min is None:
                continue
            shifted = shift_right(col_min, dj)
            loop_min = shifted if loop_min is None else jnp.minimum(loop_min, shifted)
        acc = jnp.minimum(acc, loop_min + buf[slot, _MB])

        # Bulges of >= 2 unpaired bases.
        au_e = buf[slot, _AU]
        bs_min = None
        for r in range(2, maxloop + 1):
            cand = win_cw[r] + bseq_ref[r]
            bs_min = cand if bs_min is None else jnp.minimum(bs_min, cand)
        acc = jnp.minimum(acc, shift_right(bs_min, 1) + au_e)
        bt_min = None
        for dj in range(3, maxloop + 2):
            cand = shift_right(win_cw[0], dj) + btgt_ref[dj]
            bt_min = cand if bt_min is None else jnp.minimum(bt_min, cand)
        acc = jnp.minimum(acc, bt_min + au_e)

        # Unpairable cells (open_e == +inf) admit no path at all.
        acc = jnp.where(open_e >= _INF / 2, _INF, acc)

        best[...] = jnp.minimum(
            best[...], jnp.min(acc + buf[slot, _CLOSE], axis=1, keepdims=True)
        )
        win_c[...] = jnp.concatenate([acc[None], win_c[: d - 2]], axis=0)
        win_ca[...] = jnp.concatenate(
            [(acc + buf[slot, _MA])[None], win_ca[: d - 2]], axis=0
        )
        win_cw[...] = jnp.concatenate(
            [(acc + au_e)[None], win_cw[: d - 2]], axis=0
        )
        return 0

    jax.lax.fori_loop(0, l1, body, 0)

    result = jnp.where(best[...] >= _INF / 2, 0.0, best[...])
    out_ref[0] = jnp.broadcast_to(result, (sublanes, 128))


@partial(jax.jit, static_argnames=("maxloop", "interpret", "group"))
def _pallas_duplex_batch(seq_tokens, target_rev, em, maxloop: int,
                         interpret: bool, group: int = SUBLANES):
    d = maxloop + 2
    b, l1 = seq_tokens.shape
    l2 = target_rev.shape[0]
    l2p = ((l2 + 127) // 128) * 128

    # Pad the batch to a multiple of the per-program sublane group.
    bp = ((b + group - 1) // group) * group
    if bp != b:
        seq_tokens = jnp.pad(seq_tokens, [(0, bp - b), (0, 0)])
    groups = bp // group

    slabs = rd.build_slabs(seq_tokens, target_rev, em)  # [B, L1, 9, L2]
    # Pad lanes: +inf for path terms so padded lanes admit no duplex.
    pad_vals = jnp.array(
        [_INF, _INF, _INF, _INF, _INF, 0.0, 0.0, 0.0, 0.0], jnp.float32
    )
    slabs = jnp.concatenate(
        [
            slabs,
            jnp.broadcast_to(
                pad_vals[None, None, :, None], (bp, l1, _N_SLABS, l2p - l2)
            ),
        ],
        axis=3,
    )
    # [B, L1, 9, L2p] -> [G, L1, 9, S, L2p]: program g owns sequences
    # g*S .. g*S+S-1 as sublanes.
    slabs = slabs.reshape(groups, group, l1, _N_SLABS, l2p).transpose(
        0, 2, 3, 1, 4
    )

    bulge_seq, bulge_tgt = em["bulge_seq"], em["bulge_tgt"]

    out = pl.pallas_call(
        partial(_duplex_kernel, d=d, l1=l1),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, group, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((groups, group, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _N_SLABS, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(slabs, em["interior_cost"], bulge_seq, bulge_tgt)
    return out[:, :, 0].reshape(bp)[:b]


def duplex_energy_batch_pallas(
    seq_tokens, target_tokens, params: rd.DuplexParams = None, interpret: bool = None
):
    """Pallas-kernel duplex energies of int[B, L1] sequences vs one target."""
    params = params or rd.DEFAULT_PARAMS
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_duplex_batch(
        jnp.asarray(seq_tokens),
        jnp.asarray(target_tokens)[::-1],
        params.energy_model(),
        params.maxloop,
        interpret,
    )
