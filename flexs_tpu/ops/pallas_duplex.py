"""Pallas TPU kernel for the RNA duplex DP (the benchmark's hottest oracle).

The XLA path (flexs_tpu/ops/rna_duplex.py) expresses the recursion as a
`lax.scan` over pre-expanded per-cell energy slabs.  Profiling on the TPU
(scripts/profile_duplex.py) showed that at L100 the slab EXPANSION — the
one-hot matmuls materializing f32[B, L1, 9, L2] in HBM — costs ~9x the DP
itself, so the kernel moves the expansion INSIDE:

  * grid = (batch_groups,): one program per `k_groups` sublane-groups of
    `group` sequences; each group's DP rows are walked by a `fori_loop`;
  * each program receives its groups' COMPACT record block
    f32[K, L1, S, 4] (per row: seq trigram index, forward-bigram index,
    and the two boundary-column patch energies) as one auto-blocked VMEM
    copy; the [S, 128] one-hot operand is built per row on the VPU by an
    iota-compare;
  * the 9 per-cell energy channels are produced by ONE MXU matmul
    [S, 128] @ [128, 9*L2p] against gram-pair tables pre-contracted over
    the fixed target (rows 0:64 = seq-trigram x target-gram energies,
    rows 64:80 = forward-bigram terms, rows 80:128 = zeros so the patch
    lanes contribute nothing).  One-hot selection by matmul is EXACT in
    f32 (each output is one table value plus zeros; the +inf sentinel is
    the finite rd._INF), so the kernel is bit-identical to the XLA slab
    path;
  * duplex-end boundary patches (reference rna.py duplexfold end terms;
    see rd.build_slabs' patch block) are applied in-kernel;
  * the three [D-1, S, L2p] DP window channels live in VMEM scratch
    across rows; the scalar size-cost tables ride one packed [32, 128]
    VMEM tile (vmap-friendly for the sweep engine);
  * the per-sequence best is accumulated PER LANE across rows (one
    elementwise min per row) and lane-reduced ONCE per group — v3 ran a
    cross-lane min reduction every row, the one operation every round-3
    deletion experiment had left untouched.

Round-3 A/B profile history (BASELINE.md has the numbers): per-row cost
was shown INVARIANT to maxloop (op count), to batching the channel
matmul over row blocks (a v4 variant, since removed), to group width
64/128/256, to grid-step count (8 -> 2 steps at B512: no change), to the
dynamic record read, and to windows living in scratch vs loop carry.
Total time fits `2.8 ms + ~100 ns * B * L1` across every layout.

`duplex_energy_batch_pallas` matches `rna_duplex.duplex_energy_batch`
numerically (tests/test_pallas_duplex.py; re-verified compiled on every
`bench.py` run); `interpret=True` is selected automatically off-TPU so
the kernel stays testable on the CPU mesh.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexs_tpu.ops import rna_duplex as rd

_INF = rd._INF

# Channel indices in DP order (shared with rna_duplex's slab layout).
_OPEN, _STACK, _B1S, _B1T, _I11, _MB, _MA, _AU, _CLOSE = range(9)
_N_SLABS = 9

SUBLANES = 64  # sequences per sublane group (8 VPU sublane tiles deep)
_REC = 128  # one-hot operand lanes: 64 trigram, 16 bigram, 48 zero-pad

# Per-channel pad value for lanes beyond L2: path terms admit no duplex
# (+inf); additive decoration terms contribute zero.
_PAD_VALS = (_INF, _INF, _INF, _INF, _INF, 0.0, 0.0, 0.0, 0.0)


def _duplex_group_body(
    j, recs_ref, tbl_ref, row0_ref, rowl_ref, costs_ref,
    out_ref, win_c, win_ca, win_cw, *, d, l1, l2
):
    """Full DP for group slot `j` of this program's block.

    recs_ref: VMEM f32[1, K, L1, S, 4] compact row records (trigram
    index, bigram index, two boundary patch energies).
    tbl_ref: VMEM f32[128, 9*L2p] target-contracted gram-pair tables.
    row0/rowl: VMEM f32[1, K, S, L2p] full-row OPEN/CLOSE boundary
    patches.
    costs_ref: VMEM f32[32, 128] packed scalar size-cost tables — row 0
    the sequence-bulge vector, row 1 the target-bulge vector, rows 2..
    2+d the interior [d, d] matrix (packed in `_packed_costs`; a single
    TPU-tile-shaped VMEM operand batches cleanly under vmap where the
    former SMEM vectors violated the block-shape rules when the sweep
    engine vmaps cells).
    Scratch (shared across the program's K groups, reset per group):
    three window channels f32[d-1, S, L2p].
    """
    sublanes = win_c.shape[1]
    l2p = win_c.shape[2]
    maxloop = d - 2

    win_c[...] = jnp.full(win_c.shape, _INF, jnp.float32)
    win_ca[...] = jnp.full(win_ca.shape, _INF, jnp.float32)
    win_cw[...] = jnp.full(win_cw.shape, _INF, jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (sublanes, l2p), 1)

    def shift_right(rows, k):
        # rows [S, L2p] shifted right by k lanes; vacated lanes -> +inf.
        rolled = pltpu.roll(rows, k, axis=1)
        return jnp.where(col < k, _INF, rolled)

    # Statically valid generic-interior combos: window row r holds DP row
    # i-1-r => di = r+1; n1 = di-1, n2 = dj-1; skip the 1x1 (joint table).
    interior_combos = [
        (r, dj)
        for dj in range(2, d)
        for r in range(1, d - 1)
        if (r + dj - 1) <= maxloop and not (r == 1 and dj == 2)
    ]

    rec_col = jax.lax.broadcasted_iota(jnp.int32, (sublanes, _REC), 1)

    def body(i, best_acc):
        rec = recs_ref[0, j, i]  # [S, 4]: s3g, s2g, col0 patch, coll patch
        # Expand the compact index record into the [S, 128] one-hot
        # matmul operand on the VPU (a compare against the lane iota);
        # materializing these one-hots in HBM was ~70% of an earlier
        # variant's runtime.
        idx3 = rec[:, 0:1]
        idx2 = rec[:, 1:2]
        m3 = (rec_col < 64) & (rec_col.astype(jnp.float32) == idx3)
        m2 = (rec_col >= 64) & (rec_col < 80) & (
            (rec_col - 64).astype(jnp.float32) == idx2
        )
        operand = jnp.where(m3 | m2, 1.0, 0.0)
        # One MXU matmul expands the row's 9 energy channels (module
        # docstring: exact one-hot selection).
        # HIGHEST precision: the default f32 dot truncates operands to
        # bf16 on the MXU, which would round the selected table energies
        # (rna_duplex.build_slabs uses the same setting for the same
        # reason) — required for the bit-exactness contract.
        all9 = jax.lax.dot_general(
            operand,
            tbl_ref[...],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [S, 9*L2p]

        def chan(c):
            return all9[:, c * l2p:(c + 1) * l2p]

        open_e = chan(_OPEN)
        # Duplex-end boundary patches (rd.build_slabs' patch block).
        open_e = jnp.where(i == 0, row0_ref[0, j], open_e)
        open_e = jnp.where(col == 0, rec[:, 2:3], open_e)
        close_e = chan(_CLOSE)
        close_e = jnp.where(i == l1 - 1, rowl_ref[0, j], close_e)
        close_e = jnp.where(col == l2 - 1, rec[:, 3:4], close_e)

        acc = jnp.minimum(open_e, shift_right(win_c[0], 1) + chan(_STACK))
        acc = jnp.minimum(acc, shift_right(win_c[1], 1) + chan(_B1S))
        acc = jnp.minimum(acc, shift_right(win_c[0], 2) + chan(_B1T))
        acc = jnp.minimum(acc, shift_right(win_c[1], 2) + chan(_I11))

        # Generic interior loops: dj-outer, rows reduced sequentially.
        loop_min = None
        for dj in range(2, d):
            col_min = None
            for r, dj2 in interior_combos:
                if dj2 != dj:
                    continue
                cand = win_ca[r] + costs_ref[2 + r + 1, dj]
                col_min = cand if col_min is None else jnp.minimum(col_min, cand)
            if col_min is None:
                continue
            shifted = shift_right(col_min, dj)
            loop_min = shifted if loop_min is None else jnp.minimum(loop_min, shifted)
        acc = jnp.minimum(acc, loop_min + chan(_MB))

        # Bulges of >= 2 unpaired bases.
        au_e = chan(_AU)
        bs_min = None
        for r in range(2, maxloop + 1):
            cand = win_cw[r] + costs_ref[0, r]
            bs_min = cand if bs_min is None else jnp.minimum(bs_min, cand)
        acc = jnp.minimum(acc, shift_right(bs_min, 1) + au_e)
        bt_min = None
        for dj in range(3, maxloop + 2):
            cand = shift_right(win_cw[0], dj) + costs_ref[1, dj]
            bt_min = cand if bt_min is None else jnp.minimum(bt_min, cand)
        acc = jnp.minimum(acc, bt_min + au_e)

        # Unpairable cells (open_e == +inf) admit no path at all.
        acc = jnp.where(open_e >= _INF / 2, _INF, acc)

        # Per-LANE best accumulation: the cross-lane reduction happens
        # once per group, after the row loop (module docstring).
        best_acc = jnp.minimum(best_acc, acc + close_e)
        win_c[...] = jnp.concatenate([acc[None], win_c[: d - 2]], axis=0)
        win_ca[...] = jnp.concatenate(
            [(acc + chan(_MA))[None], win_ca[: d - 2]], axis=0
        )
        win_cw[...] = jnp.concatenate(
            [(acc + au_e)[None], win_cw[: d - 2]], axis=0
        )
        return best_acc

    best_acc = jax.lax.fori_loop(
        0, l1, body, jnp.full((sublanes, l2p), _INF, jnp.float32)
    )
    best = jnp.min(best_acc, axis=1, keepdims=True)
    result = jnp.where(best >= _INF / 2, 0.0, best)
    out_ref[0, j] = jnp.broadcast_to(result, (sublanes, 128))


def _duplex_kernel(
    recs_ref, tbl_ref, row0_ref, rowl_ref, costs_ref,
    out_ref, win_c, win_ca, win_cw, *, d, l1, l2, k_groups
):
    """One program runs `k_groups` independent sublane groups' DPs."""
    for j in range(k_groups):
        _duplex_group_body(
            j, recs_ref, tbl_ref, row0_ref, rowl_ref, costs_ref,
            out_ref, win_c, win_ca, win_cw, d=d, l1=l1, l2=l2,
        )


def _packed_costs(em, d):
    """Pack the scalar size-cost tables into one f32[32, 128] operand."""
    assert d + 2 <= 32, "maxloop too large for the packed cost tile"
    costs = jnp.zeros((32, 128), jnp.float32)
    costs = costs.at[0, : d - 1].set(em["bulge_seq"])
    costs = costs.at[1, :d].set(em["bulge_tgt"])
    costs = costs.at[2 : 2 + d, :d].set(em["interior_cost"])
    return costs


def _contracted_tables(target_rev, em, l2p):
    """Target-contracted gram-pair tables f32[128, 9*l2p] + row patches.

    Rows 0:64 hold the 7 seq-trigram channels contracted over the
    target's trigram at each j; rows 64:80 the 2 forward-bigram channels;
    rows 80:128 are zero so the record's patch/pad lanes are inert.
    Lane j >= l2 carries the channel's pad value in its ACTIVE row block
    only (the other block contributes zero).
    """
    l2 = target_rev.shape[0]
    t_past, t_fut = rd.trigram_tables(em)

    trev_m1 = jnp.roll(target_rev, 1)
    trev_m2 = jnp.roll(target_rev, 2)
    trev_p1 = jnp.roll(target_rev, -1)
    t3g = trev_m2 * 16 + trev_m1 * 4 + target_rev  # [L2]
    t2g = target_rev * 4 + trev_p1

    tbl = jnp.zeros((_REC, _N_SLABS, l2p), jnp.float32)
    past_c = t_past[:, :, t3g]  # [7, 64, L2]
    fut_c = t_fut[:, :, t2g]  # [2, 16, L2]
    for k, c in enumerate(rd._PAST):
        row = jnp.full((64, l2p), _PAD_VALS[c], jnp.float32)
        row = row.at[:, :l2].set(past_c[k])
        tbl = tbl.at[0:64, c].set(row)
    for k, c in enumerate(rd._FUT):
        row = jnp.full((16, l2p), _PAD_VALS[c], jnp.float32)
        row = row.at[:, :l2].set(fut_c[k])
        tbl = tbl.at[64:80, c].set(row)
    return tbl.reshape(_REC, _N_SLABS * l2p)


def _records_and_patches(seq_tokens, target_rev, em, l2p):
    """Compact row records f32[B, L1, 4] + full-row boundary patches.

    Record fields per DP row: [0] seq-trigram index (0..63), [1] forward-
    bigram index (0..15) — expanded to the [S, 128] one-hot matmul operand
    in-kernel — [2] OPEN column-0 patch energy, [3] CLOSE column-(L2-1)
    patch energy.  Patch values mirror rd.build_slabs' boundary block
    exactly.
    """
    b, l1 = seq_tokens.shape
    l2 = target_rev.shape[0]
    i_idx = jnp.arange(l1)
    j_idx = jnp.arange(l2)

    s = seq_tokens
    s_im1 = s[:, jnp.maximum(i_idx - 1, 0)]
    s_im2 = s[:, jnp.maximum(i_idx - 2, 0)]
    s_ip1 = s[:, jnp.minimum(i_idx + 1, l1 - 1)]
    s3g = s_im2 * 16 + s_im1 * 4 + s  # [B, L1]
    s2g = s * 4 + s_ip1

    pair_tbl = jnp.asarray(rd.PAIR_TABLE)
    duplex_init = em["consts"][0]
    none = rd.NONE_BASE
    trev_m1 = jnp.roll(target_rev, 1)
    trev_p1 = jnp.roll(target_rev, -1)
    b3 = jnp.where(j_idx > 0, trev_m1, none)
    a5 = jnp.where(j_idx < l2 - 1, trev_p1, none)
    b5 = jnp.where(i_idx > 0, s_im1, none)
    a3 = jnp.where(i_idx < l1 - 1, s_ip1, none)

    # Column patches (lane 0 / lane l2-1 of every DP row).
    pt_col0 = pair_tbl[s, target_rev[0]]  # [B, L1]
    open_col0 = jnp.where(
        pt_col0 > 0, duplex_init + em["ext5"][pt_col0, b5, none], _INF
    )
    pt_coll = pair_tbl[s, target_rev[l2 - 1]]
    close_coll = em["ext3"][pt_coll, a3, none]

    rec = jnp.stack(
        [
            s3g.astype(jnp.float32),
            s2g.astype(jnp.float32),
            open_col0,
            close_coll,
        ],
        axis=2,
    )  # [B, L1, 4] compact index/patch record (one-hot built in-kernel)

    # Full-row patches (DP row 0 OPEN, row l1-1 CLOSE); their lane 0 /
    # lane l2-1 values equal the corner values, matching build_slabs'
    # patch order (row, then column, then corner).
    pt_row0 = pair_tbl[s[:, 0][:, None], target_rev[None, :]]  # [B, L2]
    open_row0 = jnp.where(
        pt_row0 > 0,
        duplex_init + em["ext5"][pt_row0, none, jnp.broadcast_to(b3, (b, l2))],
        _INF,
    )
    open_row0 = open_row0.at[:, 0].set(open_col0[:, 0])
    open_row0 = jnp.pad(
        open_row0, [(0, 0), (0, l2p - l2)], constant_values=_INF
    )
    pt_rowl = pair_tbl[s[:, l1 - 1][:, None], target_rev[None, :]]
    close_rowl = em["ext3"][pt_rowl, none, jnp.broadcast_to(a5, (b, l2))]
    close_rowl = close_rowl.at[:, l2 - 1].set(close_coll[:, l1 - 1])
    close_rowl = jnp.pad(close_rowl, [(0, 0), (0, l2p - l2)])
    return rec, open_row0, close_rowl


@partial(jax.jit,
         static_argnames=("maxloop", "interpret", "group", "k_groups"))
def _pallas_duplex_batch(seq_tokens, target_rev, em, maxloop: int,
                         interpret: bool, group: int = SUBLANES,
                         k_groups: int = 1):
    """`k_groups` sublane groups of `group` sequences per program."""
    if maxloop < 3:
        # maxloop <= 2 leaves the unrolled interior/bulge combo lists
        # empty and the kernel fails deep inside tracing; the XLA slab
        # path (duplex_energy_from_slabs) handles small maxloop via +inf
        # table entries.
        raise ValueError(
            f"the Pallas duplex kernel needs maxloop >= 3 (got {maxloop}); "
            "use rna_duplex.duplex_energy_from_slabs for smaller values"
        )
    d = maxloop + 2
    b, l1 = seq_tokens.shape
    l2 = target_rev.shape[0]
    l2p = ((l2 + 127) // 128) * 128

    # Pad the batch to a multiple of the per-program block.
    block = group * k_groups
    bp = ((b + block - 1) // block) * block
    if bp != b:
        seq_tokens = jnp.pad(seq_tokens, [(0, bp - b), (0, 0)])
    programs = bp // block

    tbl = _contracted_tables(target_rev, em, l2p)
    rec, open_row0, close_rowl = _records_and_patches(
        seq_tokens, target_rev, em, l2p
    )
    # [B, L1, 4] -> [P, K, L1, S, 4]: program p, slot k owns sequences
    # (p*K + k)*S .. +S-1 as sublanes of each row record.
    rec = (
        rec.reshape(programs, k_groups, group, l1, 4)
        .transpose(0, 1, 3, 2, 4)
    )
    open_row0 = open_row0.reshape(programs, k_groups, group, l2p)
    close_rowl = close_rowl.reshape(programs, k_groups, group, l2p)

    costs = _packed_costs(em, d)

    out = pl.pallas_call(
        partial(_duplex_kernel, d=d, l1=l1, l2=l2, k_groups=k_groups),
        grid=(programs,),
        in_specs=[
            pl.BlockSpec((1, k_groups, l1, group, 4), lambda g: (g, 0, 0, 0, 0)),
            pl.BlockSpec((_REC, _N_SLABS * l2p), lambda g: (0, 0)),
            pl.BlockSpec((1, k_groups, group, l2p), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, k_groups, group, l2p), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((32, 128), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k_groups, group, 128), lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((programs, k_groups, group, 128),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
            pltpu.VMEM((d - 1, group, l2p), jnp.float32),
        ],
        interpret=interpret,
    )(rec, tbl, open_row0, close_rowl, costs)
    return out[:, :, :, 0].reshape(bp)[:b]


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
