"""Pallas TPU kernel for the RNA duplex DP (the benchmark's hottest oracle).

The XLA path (flexs_tpu/ops/rna_duplex.py) expresses the recursion as a
`lax.scan` whose body materializes a [D-1, D-1, L2] rolled tensor per row.
This kernel keeps the entire rolling DP window in VMEM and walks the rows
with on-chip shifts — no HBM traffic inside the recursion at all:

  * grid = (batch,): one program instance per sequence;
  * sequence-dependent energies (pair types, stack transitions, open/close
    terms) are precomputed OUTSIDE the kernel by plain XLA gathers, so the
    kernel body is pure min-plus arithmetic on lane-aligned rows;
  * the [D, L2] window lives in VMEM scratch.

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


def _precompute_terms(seq_tokens, target_rev, stack_tbl, consts):
    """Sequence-dependent per-cell energies, computed with XLA gathers.

    Returns (open_e, stack_e, close_add) each f32[B, L1, L2]:
      open_e: duplex-initiation cost at (i, j), +inf where unpairable;
      stack_e: stack-transition energy from (i-1, j-1) into (i, j);
      close_add: terminal cost added when a duplex ends at (i, j).
    """
    duplex_init, terminal_au, end_bonus, _ = consts
    pair_tbl = jnp.asarray(rd.PAIR_TABLE)
    weak = jnp.asarray(rd.WEAK_PAIR)

    ptype = pair_tbl[seq_tokens[:, :, None], target_rev[None, None, :]]
    pairable = ptype > 0

    open_e = jnp.where(pairable, duplex_init + terminal_au * weak[ptype], _INF)
    close_add = terminal_au * weak[ptype] + end_bonus

    # Stack transition into (i, j) uses the pair type at (i-1, j-1).
    ptype_prev = jnp.roll(jnp.roll(ptype, 1, axis=1), 1, axis=2)
    stack_vals = stack_tbl[ptype_prev, ptype]
    stack_vals = stack_vals.at[:, 0, :].set(_INF)  # no predecessor row
    stack_vals = stack_vals.at[:, :, 0].set(_INF)  # no predecessor col
    stack_e = jnp.where(pairable, stack_vals, _INF)
    return open_e, stack_e, close_add


SUBLANES = 64  # sequences per program instance (8 VPU sublane tiles deep)


def _duplex_kernel(open_ref, stack_ref, close_ref, cost_ref, out_ref, window, best, *, d, l1):
    """One DP row per grid step; the window persists in VMEM scratch.

    Grid = (batch_groups, L1): the row index rides the grid (BlockSpec
    index maps deliver exactly this row's terms — no traced dynamic
    indexing inside the kernel), and TPU grid steps execute sequentially
    per core, so the scratch window carries the recursion across rows.
    Every tensor the VPU touches is [SUBLANES, L2]-shaped.
    """
    i = pl.program_id(1)
    l2 = open_ref.shape[3]

    @pl.when(i == 0)
    def _():
        window[...] = jnp.full((d, SUBLANES, l2), _INF, jnp.float32)
        best[...] = jnp.full((SUBLANES, 1), _INF, jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, l2), 1)

    # Loop-invariant cost scalars (statically skipping +inf combinations:
    # loop too large, or the (1,1) stack case handled separately).
    maxloop = d - 2
    cost_scalars = {
        (di, dj): cost_ref[di, dj]
        for dj in range(1, d)
        for di in range(1, d)
        if (di - 1) + (dj - 1) <= maxloop and not (di == 1 and dj == 1)
    }

    def shift_right(rows, k):
        # rows [S, L2] shifted right by k lanes; vacated lanes become +inf.
        rolled = pltpu.roll(rows, k, axis=1)
        return jnp.where(col < k, _INF, rolled)

    open_e = open_ref[0, 0, :, :]
    stack_e = stack_ref[0, 0, :, :]
    close_add = close_ref[0, 0, :, :]

    acc = jnp.minimum(open_e, shift_right(window[0], 1) + stack_e)

    for dj in range(1, d):
        col_min = None
        for di in range(1, d):
            if (di, dj) not in cost_scalars:
                continue
            cand = window[di - 1] + cost_scalars[(di, dj)]
            col_min = cand if col_min is None else jnp.minimum(col_min, cand)
        if col_min is not None:
            acc = jnp.minimum(acc, shift_right(col_min, dj))

    # Unpairable cells (open_e == +inf) admit no path at all.
    acc = jnp.where(open_e >= _INF / 2, _INF, acc)

    best[...] = jnp.minimum(
        best[...], jnp.min(acc + close_add, axis=1, keepdims=True)
    )
    window[...] = jnp.concatenate([acc[None], window[: d - 1]], axis=0)

    @pl.when(i == l1 - 1)
    def _():
        result = jnp.where(best[...] >= _INF / 2, 0.0, best[...])
        out_ref[0, :, :] = jnp.broadcast_to(result, (SUBLANES, 128))


@partial(jax.jit, static_argnames=("maxloop", "interpret"))
def _pallas_duplex_batch(
    seq_tokens, target_rev, stack_tbl, consts, loop_cost, maxloop: int, interpret: bool
):
    d = maxloop + 2
    b, l1 = seq_tokens.shape
    l2 = target_rev.shape[0]
    l2p = ((l2 + 127) // 128) * 128

    # Pad the batch to a multiple of the per-program sublane group.
    bp = ((b + SUBLANES - 1) // SUBLANES) * SUBLANES
    if bp != b:
        seq_tokens = jnp.pad(seq_tokens, [(0, bp - b), (0, 0)])

    open_e, stack_e, close_add = _precompute_terms(
        seq_tokens, target_rev, stack_tbl, consts
    )
    pad = [(0, 0), (0, 0), (0, l2p - l2)]
    open_e = jnp.pad(open_e, pad, constant_values=_INF)
    stack_e = jnp.pad(stack_e, pad, constant_values=_INF)
    close_add = jnp.pad(close_add, pad, constant_values=0.0)

    def regroup(x):
        # [B, L1, L2p] -> [B/S, L1, S, L2p]: program p owns sequences
        # p*S .. p*S+S-1 as sublanes.
        return x.reshape(bp // SUBLANES, SUBLANES, l1, l2p).transpose(0, 2, 1, 3)

    def row_spec():
        # [B/S, L1, S, L2p] -> one [1(row), S, L2p] block per (group, row).
        return pl.BlockSpec(
            (1, 1, SUBLANES, l2p), lambda g, i: (g, i, 0, 0)
        )

    out = pl.pallas_call(
        partial(_duplex_kernel, d=d, l1=l1),
        grid=(bp // SUBLANES, l1),
        in_specs=[
            row_spec(),
            row_spec(),
            row_spec(),
            pl.BlockSpec((d, d), lambda g, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, 128), lambda g, i: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp // SUBLANES, SUBLANES, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, SUBLANES, l2p), jnp.float32),
            pltpu.VMEM((SUBLANES, 1), jnp.float32),
        ],
        interpret=interpret,
    )(regroup(open_e), regroup(stack_e), regroup(close_add), loop_cost)
    return out[:, :, 0].reshape(bp)[:b]


def duplex_energy_batch_pallas(
    seq_tokens, target_tokens, params: rd.DuplexParams = None, interpret: bool = None
):
    """Pallas-kernel duplex energies of int[B, L1] sequences vs one target."""
    params = params or rd.DEFAULT_PARAMS
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    consts = jnp.array(
        [params.duplex_init, params.terminal_au, params.end_bonus, 0.0],
        jnp.float32,
    )
    return _pallas_duplex_batch(
        jnp.asarray(seq_tokens),
        jnp.asarray(target_tokens)[::-1],
        jnp.asarray(params.stack),
        consts,
        jnp.asarray(params.loop_cost_matrix()),
        params.maxloop,
        interpret,
    )
