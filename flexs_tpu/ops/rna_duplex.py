"""RNA duplex hybridization energy on device (ViennaRNA `duplexfold` rebuild).

The reference's RNA oracle calls ViennaRNA's C `duplexfold` once per
(sequence, target) pair (reference rna.py:108-112) — the dominant oracle
cost of the whole benchmark suite (SURVEY.md §3).  This module re-implements
the underlying dynamic program from scratch as a batched JAX scan:

    c[i, j] = best energy of a duplex in which sequence position i pairs
              target position j, extended from any previous pair (k < i,
              l < j on the reversed target) through a stack, bulge, or
              interior loop bounded by MAXLOOP unpaired bases.

Energy model: Turner-style nearest-neighbor thermodynamics — the published
2004 helix stacking table for Watson-Crick + GU wobble pairs, size-dependent
bulge/interior initiation penalties with Ninio asymmetry, duplex initiation,
terminal-AU/GU penalties, and an end/dangle correction.  ViennaRNA's
special-case 1x1/2x1/2x2 interior tables are approximated by the generic
size formula; the residual model constants are calibrated against oracle
outputs shipped with the reference (examples/robustness/adalead/*.csv hold
~2.5k sequences scored by the real ViennaRNA — see
tests/test_rna_landscape.py for the recorded agreement).

TPU mapping: one `lax.scan` over sequence rows; each row is a vectorized
min-plus reduction over a [MAXLOOP+2, MAXLOOP+2] predecessor window of the
rolling DP slab — pure VPU work with fixed shapes, vmapped over the batch.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Token order follows flexs_tpu.alphabet.RNAA = "UGCA": U=0, G=1, C=2, A=3.
_U, _G, _C, _A = 0, 1, 2, 3

# Pair types (ViennaRNA order): 0 = unpairable, 1=CG 2=GC 3=GU 4=UG 5=AU 6=UA.
PAIR_TABLE = np.zeros((4, 4), dtype=np.int32)
PAIR_TABLE[_C, _G] = 1
PAIR_TABLE[_G, _C] = 2
PAIR_TABLE[_G, _U] = 3
PAIR_TABLE[_U, _G] = 4
PAIR_TABLE[_A, _U] = 5
PAIR_TABLE[_U, _A] = 6

# Turner 2004 helix stacking dG37 (kcal/mol), indexed [pair_prev][pair_cur];
# row/col 0 (unpairable) = +inf.
_INF = 1e6
STACK = np.full((7, 7), _INF, dtype=np.float32)
_stack_vals = [
    # CG     GC     GU     UG     AU     UA
    [-2.40, -3.30, -2.10, -1.40, -2.10, -2.10],  # CG
    [-3.30, -3.40, -2.50, -1.50, -2.20, -2.40],  # GC
    [-2.10, -2.50, +1.30, -0.50, -1.40, -1.30],  # GU
    [-1.40, -1.50, -0.50, -0.30, -0.60, -1.00],  # UG
    [-2.10, -2.20, -1.40, -0.60, -1.10, -0.90],  # AU
    [-2.10, -2.40, -1.30, -1.00, -0.90, -1.30],  # UA
]
STACK[1:, 1:] = np.array(_stack_vals, dtype=np.float32)

# AU/GU helix-end (weak pair) indicator per pair type.
WEAK_PAIR = np.array([0, 0, 0, 1, 1, 1, 1], dtype=np.float32)

# Size-dependent loop initiation penalties (kcal/mol), Turner-style with a
# logarithmic tail.
_BULGE = [_INF, 3.80, 2.80, 3.20, 3.60, 4.00, 4.40, 4.59, 4.70, 4.80, 4.90]
_INTERIOR = [_INF, _INF, 1.50, 1.60, 1.10, 2.00, 2.00, 2.10, 2.30, 2.40, 2.50]


def _loop_tail(base_list, n_max):
    """Extend a loop-penalty list to n_max with 1.75*kT*ln(n/n0) growth."""
    vals = list(base_list)
    kt_175 = 1.75 * 0.616  # 1.75 * kT at 37C (kcal/mol)
    n0 = len(vals) - 1
    for n in range(len(vals), n_max + 1):
        vals.append(vals[n0] + kt_175 * np.log(n / n0))
    return np.array(vals, dtype=np.float32)


class DuplexParams:
    """Calibratable constants of the duplex energy model.

    `stack` may override the published Turner table (the calibration in
    scripts/calibrate_rna.py fits it against ViennaRNA outputs shipped with
    the reference and stores the result in data/rna_duplex_params.npz).
    """

    def __init__(
        self,
        duplex_init: float = 4.10,
        terminal_au: float = 0.50,
        end_bonus: float = -0.90,
        ninio: float = 0.60,
        ninio_max: float = 3.00,
        interior_mismatch: float = -0.80,
        bulge1_stack: float = -2.00,
        maxloop: int = 16,
        stack=None,
    ):
        self.duplex_init = duplex_init
        self.terminal_au = terminal_au
        self.end_bonus = end_bonus  # dangles/mismatch at the duplex ends
        self.ninio = ninio
        self.ninio_max = ninio_max
        self.interior_mismatch = interior_mismatch
        self.bulge1_stack = bulge1_stack
        self.maxloop = maxloop
        self.stack = np.asarray(stack, np.float32) if stack is not None else STACK

    @classmethod
    def calibrated(cls, path: str = None) -> "DuplexParams":
        """Load the calibrated parameter set (falls back to defaults)."""
        import os

        if path is None:
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "landscapes",
                "data",
                "rna_duplex_params.npz",
            )
        if not os.path.exists(path):
            return cls()
        with np.load(path) as data:
            return cls(
                duplex_init=float(data["duplex_init"]),
                terminal_au=float(data["terminal_au"]),
                end_bonus=float(data["end_bonus"]),
                ninio=float(data["ninio"]),
                ninio_max=float(data["ninio_max"]),
                interior_mismatch=float(data["interior_mismatch"]),
                bulge1_stack=float(data["bulge1_stack"]),
                maxloop=int(data["maxloop"]),
                stack=data["stack"],
            )

    def loop_cost_matrix(self) -> np.ndarray:
        """Cost of extending pair (k,l) to (i,j): [di, dj] for di,dj >= 1.

        Entry [di, dj] covers (di-1, dj-1) unpaired bases on the two
        strands; [1, 1] (a stack) is +inf here — the DP handles stacks
        through the sequence-dependent stacking table.
        """
        d = self.maxloop + 2
        bulge = _loop_tail(_BULGE, 2 * d)
        interior = _loop_tail(_INTERIOR, 2 * d)
        cost = np.full((d, d), np.float32(_INF))
        for di in range(1, d):
            for dj in range(1, d):
                n1, n2 = di - 1, dj - 1
                if n1 + n2 > self.maxloop or (n1 == 0 and n2 == 0):
                    continue
                if n1 == 0 or n2 == 0:
                    n = max(n1, n2)
                    e = bulge[n] + (self.bulge1_stack if n == 1 else 0.0)
                else:
                    e = (
                        interior[n1 + n2]
                        + min(self.ninio_max, self.ninio * abs(n1 - n2))
                        + self.interior_mismatch
                    )
                cost[di, dj] = e
        return cost


DEFAULT_PARAMS = DuplexParams()


@partial(jax.jit, static_argnames=("maxloop",))
def _duplex_dp(
    seq_tokens, target_rev_tokens, stack_tbl, consts, loop_cost, maxloop: int
):
    """Min duplex energy of one sequence against one (reversed) target.

    seq_tokens: int32[L1]; target_rev_tokens: int32[L2].
    stack_tbl: f32[7, 7] stacking energies (traced — calibratable).
    consts: f32[4] = (duplex_init, terminal_au, end_bonus, _pad).
    loop_cost: f32[D, D] precomputed size-dependent extension costs.
    """
    duplex_init, terminal_au, end_bonus, _ = consts
    d = maxloop + 2
    l2 = target_rev_tokens.shape[0]

    pair_tbl = jnp.asarray(PAIR_TABLE)
    weak = jnp.asarray(WEAK_PAIR)

    j_idx = jnp.arange(l2)
    # Mask for rolled windows: position j needs j - dj >= 0.
    roll_mask = jnp.stack([j_idx < dj for dj in range(d)])  # [D, L2] True=invalid

    def row_step(carry, i):
        window, best = carry  # window[r] = c row (i-1-r); [D, L2]
        ptype = pair_tbl[seq_tokens[i], target_rev_tokens]  # [L2]
        ptype_prev = pair_tbl[seq_tokens[i - 1], target_rev_tokens]
        pairable = ptype > 0

        # Opening a new duplex at (i, j).
        open_e = duplex_init + terminal_au * weak[ptype]

        # Stack extension from (i-1, j-1).
        prev_c = window[0]
        prev_c_sh = jnp.where(roll_mask[1], _INF, jnp.roll(prev_c, 1))
        ptype_prev_sh = jnp.roll(ptype_prev, 1)
        stack_e = prev_c_sh + stack_tbl[ptype_prev_sh, ptype]

        # Bulge/interior extensions: min over the (di, dj) predecessor
        # window of rolled DP rows plus size costs.
        rolled = jnp.stack(
            [
                jnp.where(roll_mask[dj], _INF, jnp.roll(window[: d - 1], dj, axis=1))
                for dj in range(1, d)
            ]
        )  # [D-1(dj), D-1(di rows: i-1-r => di=r+1), L2]
        loop_e = jnp.min(
            rolled + loop_cost[1:, 1:].T[:, :, None], axis=(0, 1)
        )  # cost indexed [di, dj] -> transpose to [dj, di]

        c_row = jnp.minimum(jnp.minimum(open_e, stack_e), loop_e)
        c_row = jnp.where(pairable, c_row, _INF)

        close_e = c_row + terminal_au * weak[ptype] + end_bonus
        best = jnp.minimum(best, jnp.min(close_e))

        window = jnp.concatenate([c_row[None], window[:-1]], axis=0)
        return (window, best), None

    window0 = jnp.full((d, l2), _INF, dtype=jnp.float32)
    (_, best), _ = jax.lax.scan(
        row_step,
        (window0, jnp.float32(_INF)),
        jnp.arange(seq_tokens.shape[0]),
    )
    # No pairable positions at all => energy 0 (no duplex forms).
    return jnp.where(best >= _INF / 2, 0.0, best)


def duplex_energy_batch(seq_tokens, target_tokens, params: DuplexParams = None):
    """Duplex energies (kcal/mol) of int[B, L1] sequences vs one target.

    `target_tokens` is int[L2] in 5'->3' orientation; it is reversed here so
    the DP scans both strands in increasing index order.
    """
    params = params or DEFAULT_PARAMS
    consts = jnp.array(
        [params.duplex_init, params.terminal_au, params.end_bonus, 0.0],
        jnp.float32,
    )
    loop_cost = jnp.asarray(params.loop_cost_matrix())
    stack_tbl = jnp.asarray(params.stack)
    target_rev = jnp.asarray(target_tokens)[::-1]
    fn = jax.vmap(
        lambda s: _duplex_dp(
            s, target_rev, stack_tbl, consts, loop_cost, params.maxloop
        )
    )
    return fn(jnp.asarray(seq_tokens))


def pack_duplex_params(target_tokens, params: DuplexParams = None):
    """Build the traced params pytree for `make_duplex_fitness_fn`."""
    params = params or DEFAULT_PARAMS
    return (
        jnp.asarray(target_tokens)[::-1],
        jnp.asarray(params.stack),
        jnp.array(
            [params.duplex_init, params.terminal_au, params.end_bonus, 0.0],
            jnp.float32,
        ),
        jnp.asarray(params.loop_cost_matrix()),
    )


def make_duplex_fitness_fn(maxloop: int = 16):
    """Pure `(params_pytree, tokens) -> energies` for fused runners.

    params_pytree from `pack_duplex_params` — all traced, so sweeps can
    vmap over targets and calibration can differentiate through the DP.
    """

    def fitness_fn(p, tokens):
        target_rev, stack_tbl, consts, loop_cost = p
        return jax.vmap(
            lambda s: _duplex_dp(
                s, target_rev, stack_tbl, consts, loop_cost, maxloop
            )
        )(tokens)

    return fitness_fn
