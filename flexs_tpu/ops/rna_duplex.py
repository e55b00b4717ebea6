"""RNA duplex hybridization energy on device (ViennaRNA `duplexfold` rebuild).

The reference's RNA oracle calls ViennaRNA's C `duplexfold` once per
(sequence, target) pair (reference rna.py:108-112) — the dominant oracle
cost of the whole benchmark suite (SURVEY.md §3).  This module re-implements
the underlying dynamic program from scratch as a batched JAX scan:

    c[i, j] = best energy of a duplex in which sequence position i pairs
              target position j, extended from any previous pair (k < i,
              l < j on the reversed target) through a stack, bulge, or
              interior loop bounded by MAXLOOP unpaired bases.

Energy model: the full Turner-style nearest-neighbor decomposition that
ViennaRNA's `E_IntLoop` uses, with every sequence-dependent term modeled
in its exact functional form:

  * helix stacks — published Turner 2004 table (pair x pair);
  * 1-bulges — stack-through energy across the bulge (joint pair x pair
    table) plus the size-1 bulge cost;
  * longer bulges — size cost plus terminal-AU/GU on both closing pairs;
  * 1x1 interior loops — a joint (pair, pair, base, base) table, exactly
    the shape of ViennaRNA's `int11`;
  * generic interior loops — size + Ninio asymmetry + two terminal
    mismatch terms, each depending on one closing pair and its adjacent
    unpaired bases (the `mismatchI`-style decomposition; ViennaRNA's
    measured `int21`/`int22` specials are represented by this same
    decomposition, which is also how Turner extrapolates unmeasured
    entries);
  * duplex ends — initiation plus a per-end (pair, 5'-neighbor,
    3'-neighbor) table in the shape of ViennaRNA's `mismatchExt`
    (dangle model 2), with an explicit "no neighbor" index at the
    sequence boundaries.

All tables are calibrated against oracle outputs shipped with the
reference (examples/robustness/adalead/*.csv hold ~2.4k sequences scored
by the real ViennaRNA) by differentiating through the min-plus DP — see
scripts/calibrate_rna.py; the holdout agreement is pinned in
tests/test_rna_landscape.py.

TPU mapping: one `lax.scan` over sequence rows; each row is a vectorized
min-plus reduction over a [MAXLOOP, MAXLOOP] predecessor window of the
rolling DP slab (three additive channels: raw, +interior-mismatch,
+bulge-AU) — pure VPU work with fixed shapes, vmapped over the batch.
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
# logarithmic tail.  _BULGE indexed by bulge size, _INTERIOR by total
# unpaired count.
_BULGE = [_INF, 3.80, 2.80, 3.20, 3.60, 4.00, 4.40, 4.59, 4.70, 4.80, 4.90]
_INTERIOR = [_INF, _INF, 1.50, 1.60, 1.10, 2.00, 2.00, 2.10, 2.30, 2.40, 2.50]

# "No neighboring base" index for the duplex-end tables (sequence edge).
NONE_BASE = 4


def _loop_tail(base_list, n_max):
    """Extend a loop-penalty list to n_max with 1.75*kT*ln(n/n0) growth."""
    vals = list(base_list)
    kt_175 = 1.75 * 0.616  # 1.75 * kT at 37C (kcal/mol)
    n0 = len(vals) - 1
    for n in range(len(vals), n_max + 1):
        vals.append(vals[n0] + kt_175 * np.log(n / n0))
    return np.array(vals, dtype=np.float32)


class DuplexParams:
    """Calibratable parameters of the duplex energy model.

    Sequence-dependent tables (shapes mirror ViennaRNA's parameter file):
      stack   f32[7, 7]      helix stacking, also bridges 1-bulges
      mA      f32[7, 4, 4]   interior mismatch at the loop-opening pair
      mB      f32[7, 4, 4]   interior mismatch at the loop-closing pair
      int11   f32[7, 7, 4, 4] joint 1x1 interior-loop table
      ext5    f32[7, 5, 5]   duplex-start end term (pair, 5' nbr, 3' nbr)
      ext3    f32[7, 5, 5]   duplex-close end term; base index 4 = no nbr

    Size terms: bulge_sizes f32[maxloop+1] (by bulge length; [1] is the
    1-bulge cost used with the stack-through), interior_sizes
    f32[maxloop+1] (by total unpaired count), ninio asymmetry slope/cap.

    scripts/calibrate_rna.py fits all of these against ViennaRNA outputs
    shipped with the reference and stores the result in
    flexs_tpu/landscapes/data/rna_duplex_params.npz.
    """

    def __init__(
        self,
        duplex_init: float = 4.10,
        terminal_au: float = 0.50,
        ninio: float = 0.60,
        ninio_max: float = 3.00,
        maxloop: int = 16,
        stack=None,
        mA=None,
        mB=None,
        int11=None,
        ext5=None,
        ext3=None,
        bulge_sizes=None,
        interior_sizes=None,
    ):
        self.duplex_init = duplex_init
        self.terminal_au = terminal_au
        self.ninio = ninio
        self.ninio_max = ninio_max
        self.maxloop = maxloop

        mm = -0.40  # default interior-mismatch contribution per side
        end = -0.45  # default per-end dangle/mismatch bonus

        self.stack = (
            np.asarray(stack, np.float32) if stack is not None else STACK.copy()
        )
        self.mA = (
            np.asarray(mA, np.float32)
            if mA is not None
            else np.full((7, 4, 4), mm, np.float32)
        )
        self.mB = (
            np.asarray(mB, np.float32)
            if mB is not None
            else np.full((7, 4, 4), mm, np.float32)
        )
        if int11 is not None:
            self.int11 = np.asarray(int11, np.float32)
        else:
            base = _INTERIOR[2] + 2 * mm  # generic-formula 1x1 analog
            self.int11 = np.full((7, 7, 4, 4), base, np.float32)
        if ext5 is not None:
            self.ext5 = np.asarray(ext5, np.float32)
        else:
            self.ext5 = np.broadcast_to(
                (self.terminal_au * WEAK_PAIR + end)[:, None, None], (7, 5, 5)
            ).copy()
        if ext3 is not None:
            self.ext3 = np.asarray(ext3, np.float32)
        else:
            self.ext3 = np.broadcast_to(
                (self.terminal_au * WEAK_PAIR + end)[:, None, None], (7, 5, 5)
            ).copy()
        self.bulge_sizes = (
            np.asarray(bulge_sizes, np.float32)
            if bulge_sizes is not None
            else _loop_tail(_BULGE, maxloop)[: maxloop + 1]
        )
        self.interior_sizes = (
            np.asarray(interior_sizes, np.float32)
            if interior_sizes is not None
            else _loop_tail(_INTERIOR, maxloop)[: maxloop + 1]
        )

    _calibrated_cache = {}

    @classmethod
    def calibrated(cls, path: str = None) -> "DuplexParams":
        """Load the calibrated parameter set (falls back to defaults).

        Returns a shared per-path instance so every landscape reuses one
        set of device-resident energy tables (see `energy_model`).
        """
        import os

        if path in cls._calibrated_cache:
            return cls._calibrated_cache[path]
        params = cls._load_calibrated(path)
        cls._calibrated_cache[path] = params
        return params

    @classmethod
    def _load_calibrated(cls, path: str = None) -> "DuplexParams":
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
            if "mA" not in data:  # pre-round-2 parameter file
                return cls(
                    duplex_init=float(data["duplex_init"]),
                    terminal_au=float(data["terminal_au"]),
                    ninio=float(data["ninio"]),
                    maxloop=int(data["maxloop"]),
                    stack=data["stack"],
                )
            return cls(
                duplex_init=float(data["duplex_init"]),
                terminal_au=float(data["terminal_au"]),
                ninio=float(data["ninio"]),
                ninio_max=float(data["ninio_max"]),
                maxloop=int(data["maxloop"]),
                stack=data["stack"],
                mA=data["mA"],
                mB=data["mB"],
                int11=data["int11"],
                ext5=data["ext5"],
                ext3=data["ext3"],
                bulge_sizes=data["bulge_sizes"],
                interior_sizes=data["interior_sizes"],
            )

    def interior_cost_matrix(self) -> np.ndarray:
        """Dense generic-interior extension cost: [di, dj] for di,dj >= 2.

        Entry [di, dj] covers (di-1, dj-1) unpaired bases on the two
        strands; the 1x1 case [2, 2] is +inf here (handled by the joint
        int11 table), as is anything beyond maxloop total.
        """
        d = self.maxloop + 2
        cost = np.full((d, d), np.float32(_INF))
        for di in range(2, d):
            for dj in range(2, d):
                n1, n2 = di - 1, dj - 1
                if n1 + n2 > self.maxloop or (n1 == 1 and n2 == 1):
                    continue
                cost[di, dj] = self.interior_sizes[n1 + n2] + min(
                    self.ninio_max, self.ninio * abs(n1 - n2)
                )
        return cost

    def bulge_cost_vectors(self):
        """(bulge_seq f32[maxloop+1], bulge_tgt f32[maxloop+2]).

        bulge_seq[r]: cost of a bulge of r >= 2 unpaired sequence bases
        (window row index r); bulge_tgt[dj]: cost of dj-1 >= 2 unpaired
        target bases (lane shift dj).  1-bulges are +inf here — they take
        the stack-through path.
        """
        d = self.maxloop + 2
        bulge_seq = np.full(d - 1, np.float32(_INF))
        bulge_tgt = np.full(d, np.float32(_INF))
        for r in range(2, self.maxloop + 1):
            bulge_seq[r] = self.bulge_sizes[r]
        for dj in range(3, self.maxloop + 2):
            bulge_tgt[dj] = self.bulge_sizes[dj - 1]
        return bulge_seq, bulge_tgt

    def energy_model(self) -> dict:
        """Traced-table pytree consumed by `_duplex_dp`.

        Cached per instance: rebuilding fresh device arrays per call costs
        ~40 ms each through the remote relay (treat the params as frozen
        after construction — calibration builds its own pytrees).
        """
        cached = getattr(self, "_em_cache", None)
        if cached is not None:
            return cached
        self._em_cache = self._build_energy_model()
        return self._em_cache

    def _build_energy_model(self) -> dict:
        bulge_seq, bulge_tgt = self.bulge_cost_vectors()
        return {
            "stack": jnp.asarray(self.stack),
            "mA": jnp.asarray(self.mA),
            "mB": jnp.asarray(self.mB),
            "int11": jnp.asarray(self.int11),
            "ext5": jnp.asarray(self.ext5),
            "ext3": jnp.asarray(self.ext3),
            "interior_cost": jnp.asarray(self.interior_cost_matrix()),
            "bulge_seq": jnp.asarray(bulge_seq),
            "bulge_tgt": jnp.asarray(bulge_tgt),
            "consts": jnp.array(
                [self.duplex_init, self.terminal_au, self.bulge_sizes[1], 0.0],
                jnp.float32,
            ),
        }


DEFAULT_PARAMS = DuplexParams()


@partial(jax.jit, static_argnames=("maxloop",))
def _duplex_dp(seq_tokens, target_rev_tokens, em, maxloop: int):
    """Min duplex energy of one sequence against one (reversed) target.

    seq_tokens: int32[L1]; target_rev_tokens: int32[L2]; em: the
    energy-model pytree from `DuplexParams.energy_model()` (all traced,
    so calibration can differentiate through the DP and sweeps can vmap
    over targets).
    """
    duplex_init, terminal_au, bulge1, _ = em["consts"]
    d = maxloop + 2
    l1 = seq_tokens.shape[0]
    l2 = target_rev_tokens.shape[0]
    trev = target_rev_tokens

    pair_tbl = jnp.asarray(PAIR_TABLE)
    weak = jnp.asarray(WEAK_PAIR)

    j_idx = jnp.arange(l2)
    trev_m1 = jnp.roll(trev, 1)  # trev[j-1] (wrapped; masked where used)
    trev_p1 = jnp.roll(trev, -1)  # trev[j+1]
    b3_open = jnp.where(j_idx > 0, trev_m1, NONE_BASE)
    a5_close = jnp.where(j_idx < l2 - 1, trev_p1, NONE_BASE)

    # Mask for lane shifts: position j needs j - k >= 0.
    shift_mask = jnp.stack([j_idx < k for k in range(d)])  # [D, L2] True=bad

    def shift(x, k):
        return jnp.where(shift_mask[k], _INF, jnp.roll(x, k, axis=-1))

    def row_step(carry, i):
        win_c, win_ca, win_cw, best = carry  # each [D-1, L2]
        s_i = seq_tokens[i]
        s_im1 = seq_tokens[jnp.maximum(i - 1, 0)]
        s_im2 = seq_tokens[jnp.maximum(i - 2, 0)]
        s_ip1 = seq_tokens[jnp.minimum(i + 1, l1 - 1)]

        ptype = pair_tbl[s_i, trev]  # [L2]
        ptype_m1 = pair_tbl[s_im1, trev]
        ptype_m2 = pair_tbl[s_im2, trev]
        pairable = ptype > 0
        au_cur = terminal_au * weak[ptype]

        # Opening a new duplex at (i, j): initiation + end term over the
        # outer neighbors (seq[i-1], target_rev[j-1]).
        b5 = jnp.where(i > 0, s_im1, NONE_BASE)
        open_e = duplex_init + em["ext5"][ptype, b5, b3_open]

        # Helix stack from (i-1, j-1).
        stack_e = shift(win_c[0], 1) + em["stack"][jnp.roll(ptype_m1, 1), ptype]

        # 1-bulges: stack-through across the bulge + size-1 cost.
        b1_seq = (
            shift(win_c[1], 1) + bulge1 + em["stack"][jnp.roll(ptype_m2, 1), ptype]
        )
        b1_tgt = (
            shift(win_c[0], 2) + bulge1 + em["stack"][jnp.roll(ptype_m1, 2), ptype]
        )

        # 1x1 interior loop: joint table over both pairs and both
        # mismatching bases (seq[i-1], target_rev[j-1]).
        i11 = shift(win_c[1], 2) + em["int11"][
            jnp.roll(ptype_m2, 2), ptype, s_im1, trev_m1
        ]

        # Generic interior loops: min over the (di, dj) predecessor window
        # of mismatch-augmented DP rows plus size/asymmetry costs, plus the
        # mismatch term of the closing pair.
        rolled = jnp.stack(
            [shift(win_ca[1:], dj) for dj in range(2, d)]
        )  # [D-2 (dj), D-2 (rows: di = r+1), L2]
        loop_e = (
            jnp.min(rolled + em["interior_cost"][2:, 2:].T[:, :, None], axis=(0, 1))
            + em["mB"][ptype, s_im1, trev_m1]
        )

        # Bulges of >= 2: AU-augmented rows + size cost + AU at this pair.
        blg_seq = (
            jnp.min(shift(win_cw, 1) + em["bulge_seq"][:, None], axis=0) + au_cur
        )
        blg_tgt = (
            jnp.min(
                jnp.stack([shift(win_cw[0], dj) for dj in range(3, d)])
                + em["bulge_tgt"][3:, None],
                axis=0,
            )
            + au_cur
        )

        c_row = jnp.minimum(
            jnp.minimum(jnp.minimum(open_e, stack_e), jnp.minimum(b1_seq, b1_tgt)),
            jnp.minimum(jnp.minimum(i11, loop_e), jnp.minimum(blg_seq, blg_tgt)),
        )
        c_row = jnp.where(pairable, c_row, _INF)

        # Closing the duplex at (i, j): end term over the outer neighbors
        # (seq[i+1], target_rev[j+1]).
        a3 = jnp.where(i < l1 - 1, s_ip1, NONE_BASE)
        close_e = c_row + em["ext3"][ptype, a3, a5_close]
        best = jnp.minimum(best, jnp.min(close_e))

        # Push this row into the three window channels.
        a_row = em["mA"][ptype, s_ip1, trev_p1]
        win_c = jnp.concatenate([c_row[None], win_c[:-1]], axis=0)
        win_ca = jnp.concatenate([(c_row + a_row)[None], win_ca[:-1]], axis=0)
        win_cw = jnp.concatenate([(c_row + au_cur)[None], win_cw[:-1]], axis=0)
        return (win_c, win_ca, win_cw, best), None

    win0 = jnp.full((d - 1, l2), _INF, dtype=jnp.float32)
    (_, _, _, best), _ = jax.lax.scan(
        row_step,
        (win0, win0, win0, jnp.float32(_INF)),
        jnp.arange(l1),
    )
    # No pairable positions at all => energy 0 (no duplex forms).
    return jnp.where(best >= _INF / 2, 0.0, best)


# ---------------------------------------------------------------------------
# Trigram-factored fast path.
#
# Every per-cell energy term of the DP is a function of at most the
# sequence trigram (s[i-2], s[i-1], s[i]) and target trigram
# (t[j-2], t[j-1], t[j]) — or, for the two forward-looking terms (the
# interior-mismatch channel of the PUSHED row and the duplex-close end
# term), of the bigrams (s[i], s[i+1]) x (t[j], t[j+1]).  So instead of
# per-cell gathers (which XLA lowers to scalarized loads — measured ~100x
# off roofline, scripts/profile_duplex.py), we enumerate the 64x64 (and
# 16x16) gram-pair tables once per call and expand them to per-cell slabs
# with two ONE-HOT MATMULS on the MXU.  The DP then consumes slab rows
# with pure min-plus VPU work.
# ---------------------------------------------------------------------------

# Slab channel indices (shared with ops/pallas_duplex.py's kernel).
OPEN, STACKC, B1S, B1T, I11, MB, MA, AU, CLOSE = range(9)
N_SLABS = 9
_PAST = (OPEN, STACKC, B1S, B1T, I11, MB, AU)  # trigram-indexed channels
_FUT = (MA, CLOSE)  # forward-bigram-indexed channels
# Static permutation from concat([past, future]) order to channel order.
_CHANNEL_PERM = np.argsort(np.array(_PAST + _FUT))


def trigram_tables(em):
    """Per-channel gram-pair energy tables from the energy model.

    Returns (t_past f32[7, 64, 64], t_fut f32[2, 16, 16]).  Gram index
    conventions match `_duplex_dp`'s gathers exactly: clipped sequence
    neighbors, wrapped (rolled) target neighbors — boundary garbage is
    masked by the DP's window/shift +inf structure, except the duplex-end
    terms, which `build_slabs` patches explicitly.
    """
    duplex_init, terminal_au, bulge1, _ = em["consts"]
    pair_tbl = jnp.asarray(PAIR_TABLE)
    weak = jnp.asarray(WEAK_PAIR)

    g = np.arange(64)
    sm2, sm1, s0 = g // 16, (g // 4) % 4, g % 4
    tm2, tm1, t0 = sm2, sm1, s0  # same decomposition over the target axis

    pt = pair_tbl[s0[:, None], t0[None, :]]
    pt_m1 = pair_tbl[sm1[:, None], tm1[None, :]]
    pt_m2m1 = pair_tbl[sm2[:, None], tm1[None, :]]
    pt_m1m2 = pair_tbl[sm1[:, None], tm2[None, :]]
    pt_m2 = pair_tbl[sm2[:, None], tm2[None, :]]

    open_t = jnp.where(
        pt > 0,
        duplex_init + em["ext5"][pt, sm1[:, None], tm1[None, :]],
        _INF,
    )
    stack_t = em["stack"][pt_m1, pt]
    b1s_t = bulge1 + em["stack"][pt_m2m1, pt]
    b1t_t = bulge1 + em["stack"][pt_m1m2, pt]
    i11_t = em["int11"][pt_m2, pt, sm1[:, None], tm1[None, :]]
    mb_t = em["mB"][pt, sm1[:, None], tm1[None, :]]
    au_t = terminal_au * weak[pt]
    t_past = jnp.stack([open_t, stack_t, b1s_t, b1t_t, i11_t, mb_t, au_t])

    gf = np.arange(16)
    s0f, sp1 = gf // 4, gf % 4
    t0f, tp1 = s0f, sp1
    ptf = pair_tbl[s0f[:, None], t0f[None, :]]
    ma_t = em["mA"][ptf, sp1[:, None], tp1[None, :]]
    close_t = em["ext3"][ptf, sp1[:, None], tp1[None, :]]
    t_fut = jnp.stack([ma_t, close_t])
    return t_past, t_fut


def build_slabs(seq_tokens, target_rev, em):
    """Per-cell energy slabs f32[B, L1, 9, L2] via one-hot MXU matmuls."""
    b, l1 = seq_tokens.shape
    l2 = target_rev.shape[0]
    i_idx = jnp.arange(l1)
    j_idx = jnp.arange(l2)
    t_past, t_fut = trigram_tables(em)

    s = seq_tokens
    s_im1 = s[:, jnp.maximum(i_idx - 1, 0)]
    s_im2 = s[:, jnp.maximum(i_idx - 2, 0)]
    s_ip1 = s[:, jnp.minimum(i_idx + 1, l1 - 1)]
    trev_m1 = jnp.roll(target_rev, 1)
    trev_m2 = jnp.roll(target_rev, 2)
    trev_p1 = jnp.roll(target_rev, -1)

    s3g = s_im2 * 16 + s_im1 * 4 + s  # [B, L1]
    t3g = trev_m2 * 16 + trev_m1 * 4 + target_rev  # [L2]
    s2g = s * 4 + s_ip1
    t2g = target_rev * 4 + trev_p1

    hi = jax.lax.Precision.HIGHEST
    oh_s3 = jax.nn.one_hot(s3g.reshape(-1), 64, dtype=jnp.float32)
    oh_t3 = jax.nn.one_hot(t3g, 64, dtype=jnp.float32)
    # [B*L1, 64] @ [64, 7*64] -> [B*L1, 7, 64]; then over target grams.
    m_past = jnp.einsum("xg,kgh->xkh", oh_s3, t_past, precision=hi)
    past = jnp.einsum("xkh,jh->xkj", m_past, oh_t3, precision=hi)

    oh_s2 = jax.nn.one_hot(s2g.reshape(-1), 16, dtype=jnp.float32)
    oh_t2 = jax.nn.one_hot(t2g, 16, dtype=jnp.float32)
    m_fut = jnp.einsum("xg,kgh->xkh", oh_s2, t_fut, precision=hi)
    fut = jnp.einsum("xkh,jh->xkj", m_fut, oh_t2, precision=hi)

    slabs = jnp.concatenate([past, fut], axis=1)[:, _CHANNEL_PERM]
    slabs = slabs.reshape(b, l1, N_SLABS, l2)

    # Boundary patches for the duplex-end terms: "no neighboring base"
    # (NONE_BASE) replaces the wrapped/clipped gram neighbor at the edges.
    pair_tbl = jnp.asarray(PAIR_TABLE)
    duplex_init = em["consts"][0]
    b3 = jnp.where(j_idx > 0, trev_m1, NONE_BASE)
    a5 = jnp.where(j_idx < l2 - 1, trev_p1, NONE_BASE)
    b5 = jnp.where(i_idx > 0, s_im1, NONE_BASE)
    a3 = jnp.where(i_idx < l1 - 1, s_ip1, NONE_BASE)

    pt_row0 = pair_tbl[s[:, 0][:, None], target_rev[None, :]]  # [B, L2]
    open_row0 = jnp.where(
        pt_row0 > 0,
        duplex_init
        + em["ext5"][pt_row0, NONE_BASE, jnp.broadcast_to(b3, (b, l2))],
        _INF,
    )
    pt_col0 = pair_tbl[s, target_rev[0]]  # [B, L1]
    open_col0 = jnp.where(
        pt_col0 > 0,
        duplex_init + em["ext5"][pt_col0, b5, NONE_BASE],
        _INF,
    )
    corner0 = jnp.where(
        pt_row0[:, 0] > 0,
        duplex_init + em["ext5"][pt_row0[:, 0], NONE_BASE, NONE_BASE],
        _INF,
    )
    slabs = slabs.at[:, 0, OPEN, :].set(open_row0)
    slabs = slabs.at[:, :, OPEN, 0].set(open_col0)
    slabs = slabs.at[:, 0, OPEN, 0].set(corner0)

    pt_rowl = pair_tbl[s[:, l1 - 1][:, None], target_rev[None, :]]
    close_rowl = em["ext3"][pt_rowl, NONE_BASE, jnp.broadcast_to(a5, (b, l2))]
    pt_coll = pair_tbl[s, target_rev[l2 - 1]]
    close_coll = em["ext3"][pt_coll, a3, NONE_BASE]
    cornerl = em["ext3"][pt_rowl[:, l2 - 1], NONE_BASE, NONE_BASE]
    slabs = slabs.at[:, l1 - 1, CLOSE, :].set(close_rowl)
    slabs = slabs.at[:, :, CLOSE, l2 - 1].set(close_coll)
    slabs = slabs.at[:, l1 - 1, CLOSE, l2 - 1].set(cornerl)
    return slabs


def _duplex_dp_slabs(slab, interior_cost, bulge_seq, bulge_tgt, maxloop: int):
    """Min duplex energy of one sequence from its per-cell slab rows.

    slab: f32[L1, 9, L2].  Same recursion as `_duplex_dp`, with every
    sequence-dependent term precomputed — the scan body is pure min-plus.
    """
    d = maxloop + 2
    l2 = slab.shape[2]
    j_idx = jnp.arange(l2)
    shift_mask = jnp.stack([j_idx < k for k in range(d)])

    def shift(x, k):
        return jnp.where(shift_mask[k], _INF, jnp.roll(x, k, axis=-1))

    icost = interior_cost[2:, 2:].T[:, :, None]

    def row_step(carry, row):
        win_c, win_ca, win_cw, best = carry
        open_e = row[OPEN]
        au_e = row[AU]

        acc = jnp.minimum(open_e, shift(win_c[0], 1) + row[STACKC])
        acc = jnp.minimum(acc, shift(win_c[1], 1) + row[B1S])
        acc = jnp.minimum(acc, shift(win_c[0], 2) + row[B1T])
        acc = jnp.minimum(acc, shift(win_c[1], 2) + row[I11])

        rolled = jnp.stack([shift(win_ca[1:], dj) for dj in range(2, d)])
        acc = jnp.minimum(acc, jnp.min(rolled + icost, axis=(0, 1)) + row[MB])

        blg_s = jnp.min(shift(win_cw, 1) + bulge_seq[:, None], axis=0)
        blg_t = jnp.min(
            jnp.stack([shift(win_cw[0], dj) for dj in range(3, d)])
            + bulge_tgt[3:, None],
            axis=0,
        )
        acc = jnp.minimum(acc, jnp.minimum(blg_s, blg_t) + au_e)

        acc = jnp.where(open_e >= _INF / 2, _INF, acc)
        best = jnp.minimum(best, jnp.min(acc + row[CLOSE]))

        win_c = jnp.concatenate([acc[None], win_c[:-1]], axis=0)
        win_ca = jnp.concatenate([(acc + row[MA])[None], win_ca[:-1]], axis=0)
        win_cw = jnp.concatenate([(acc + au_e)[None], win_cw[:-1]], axis=0)
        return (win_c, win_ca, win_cw, best), None

    win0 = jnp.full((d - 1, l2), _INF, dtype=jnp.float32)
    (_, _, _, best), _ = jax.lax.scan(
        row_step, (win0, win0, win0, jnp.float32(_INF)), slab
    )
    return jnp.where(best >= _INF / 2, 0.0, best)


def duplex_energy_from_slabs(seq_tokens, target_rev, em, maxloop: int):
    """Batched duplex energies via the trigram-factored fast path."""
    slabs = build_slabs(seq_tokens, target_rev, em)
    return jax.vmap(
        lambda slab: _duplex_dp_slabs(
            slab, em["interior_cost"], em["bulge_seq"], em["bulge_tgt"], maxloop
        )
    )(slabs)


@partial(jax.jit, static_argnames=("maxloop",))
def _duplex_energy_batch_impl(seq_tokens, target_rev, em, maxloop: int):
    return duplex_energy_from_slabs(seq_tokens, target_rev, em, maxloop)


def duplex_energy_batch(seq_tokens, target_tokens, params: DuplexParams = None):
    """Duplex energies (kcal/mol) of int[B, L1] sequences vs one target.

    `target_tokens` is int[L2] in 5'->3' orientation; it is reversed here so
    the DP scans both strands in increasing index order.
    """
    params = params or DEFAULT_PARAMS
    em = params.energy_model()
    target_rev = jnp.asarray(target_tokens)[::-1]
    return _duplex_energy_batch_impl(
        jnp.asarray(seq_tokens), target_rev, em, params.maxloop
    )


def pack_duplex_params(target_tokens, params: DuplexParams = None):
    """Build the traced params pytree for `make_duplex_fitness_fn`."""
    params = params or DEFAULT_PARAMS
    return (jnp.asarray(target_tokens)[::-1], params.energy_model())


def make_duplex_fitness_fn(maxloop: int = 16):
    """Pure `(params_pytree, tokens) -> energies` for fused runners.

    params_pytree from `pack_duplex_params` — all traced, so sweeps can
    vmap over targets and calibration can differentiate through the DP.
    """

    def fitness_fn(p, tokens):
        target_rev, em = p
        return jax.vmap(lambda s: _duplex_dp(s, target_rev, em, maxloop))(tokens)

    return fitness_fn
