"""Pallas scores kernel (interpret mode on CPU) must match the XLA wavefront
path — which is itself golden-verified against the reference — exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from seqalign_tpu.ops import dp
from seqalign_tpu.ops.pallas_dp import pallas_scores
from seqalign_tpu.scoring.presets import (
    scoring_system_default,
    scoring_system_sw_default,
)


def _setup(sc, B, LA, LB, seed, is_sw):
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    a = lut[rng.integers(0, 4, (B, LA))]
    b = lut[rng.integers(0, 4, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(is_sw))
    args = tuple(
        jnp.asarray(v) for v in (ac, bc, na, nb, subK, imK)
    ) + (go, ge, mn)
    return args


@pytest.mark.parametrize("unroll", [8, 3])
@pytest.mark.parametrize("is_sw", [False, True])
@pytest.mark.parametrize("B,LA,LB", [(8, 96, 128), (16, 128, 128), (8, 40, 128)])
def test_pallas_scores_match_xla(is_sw, B, LA, LB, unroll):
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    args = _setup(sc, B, LA, LB, seed=B + LA + is_sw, is_sw=is_sw)
    got = np.asarray(
        pallas_scores(*args, is_sw=is_sw, interpret=True, unroll=unroll)
    )
    ref = dp.dp_fill(
        *args, is_sw=is_sw, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_f32,ss8", [(False, False), (False, True),
                                         (True, False), (True, True)])
@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_dtype_modes_match_xla(is_sw, use_f32, ss8):
    """The f32 DP mode (exact < 2**24 with a -inf NW sentinel) and the int8
    substitution-plane mode must be bit-identical to the int32 kernel."""
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    args = _setup(sc, 8, 96, 128, seed=3 + is_sw, is_sw=is_sw)
    got = np.asarray(
        pallas_scores(*args, is_sw=is_sw, interpret=True, use_f32=use_f32,
                      ss8=ss8)
    )
    ref = dp.dp_fill(
        *args, is_sw=is_sw, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_scores_inline_mm(is_sw):
    """In-kernel equality scoring must equal the substitution-plane path —
    exercised with MIXED CASE and different a/b alphabets, the cases where
    per-sequence compact codes would give wrong equality."""
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    rng = np.random.default_rng(5 + is_sw)
    B, LA, LB = 4, 200, 512
    luta = np.frombuffer(b"acgGA", dtype=np.uint8)
    lutb = np.frombuffer(b"gtTAc", dtype=np.uint8)
    a = luta[rng.integers(0, 5, (B, LA))]
    b = lutb[rng.integers(0, 5, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    acm, bcm = dp.compact_inputs_mm(sc, a, b)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(is_sw))
    got = np.asarray(pallas_scores(
        jnp.asarray(acm), jnp.asarray(bcm), jnp.asarray(na),
        jnp.asarray(nb), jnp.asarray(subK), jnp.asarray(imK), go, ge, mn,
        is_sw=is_sw, interpret=True, inline_mm=True,
        match=sc.match, mismatch=sc.mismatch,
    ))
    ref = dp.dp_fill(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), go, ge, mn,
        is_sw=is_sw, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)


def test_inline_mm_asymmetric_alphabets_and_case():
    """The regular compact codes are per-sequence alphabets — comparing
    them across sequences is wrong whenever a and b contain different
    character sets or mixed case.  compact_inputs_mm must produce shared
    fold-canonical codes where equality == the match predicate."""
    from seqalign_tpu.scoring.config import ScoringConfig

    # case-insensitive scoring, disjoint-ish alphabets, mixed case
    sc = ScoringConfig(2, -3, -4, -1)
    assert dp.mm_eligible(sc)
    seqs_a = ["ACacGG", "ttAC"]
    seqs_b = ["ggtACA", "CAtt"]
    a, na = dp.pad_batch(seqs_a)
    b, nb = dp.pad_batch(seqs_b)
    acm, bcm = dp.compact_inputs_mm(sc, a, b)
    fold = sc.luts()[0]
    for i in range(2):
        for x in range(len(seqs_a[i])):
            for y in range(len(seqs_b[i])):
                same_code = acm[i, x] == bcm[i, y]
                is_match = fold[a[i, x]] == fold[b[i, y]]
                assert bool(same_code) == bool(is_match)
    # and a case-SENSITIVE config folds differently
    scs = ScoringConfig(2, -3, -4, -1, case_sensitive=True)
    acs, bcs = dp.compact_inputs_mm(scs, a, b)
    assert acs[0, 0] == acs[0, 2] or a[0, 0] != a[0, 2]  # 'A' vs 'a' distinct
    assert (acs[0, 0] != acs[0, 2]) == (chr(a[0, 0]) != chr(a[0, 2]))


def _lut_cfgs():
    """Matrix-scoring configs that are NOT mm_eligible but fit the
    in-kernel LUT mode (small a-side alphabet)."""
    from seqalign_tpu.scoring.config import ScoringConfig

    wild = ScoringConfig(2, -3, -5, -2).add_wildcard("n", 1)
    swap = ScoringConfig(1, -2, -4, -1)
    swap.add_mutation("a", "g", 0)
    swap.add_mutation("g", "a", 0)
    mat = ScoringConfig(0, 0, -4, -1).add_mutations(
        "acgt",
        [[2, -1, -1, -1], [-1, 3, -1, -1], [-1, -1, 3, -1], [-1, -1, -1, 2]],
        use_match_mismatch=False,
    )
    return {"wild": (wild, "acgtn"), "swap": (swap, "acgt"),
            "matrix": (mat, "acgt")}


@pytest.mark.parametrize("cfg", ["wild", "swap", "matrix"])
@pytest.mark.parametrize("LB", [256, 24])  # interleaved P > 1 both ways
@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_scores_inline_lut(is_sw, LB, cfg):
    """In-kernel LUT scoring (per-a-letter planes + select chain) must be
    bit-identical to the XLA wavefront on wildcard/swap/matrix configs,
    ragged lengths included."""
    import seqalign_tpu.aligners as al

    sc, alpha = _lut_cfgs()[cfg]
    assert not dp.mm_eligible(sc)
    rng = np.random.default_rng(LB + is_sw + len(cfg))
    B, LA = 6, LB + 16
    lut = np.frombuffer(alpha.encode(), dtype=np.uint8)
    a = lut[rng.integers(0, len(lut), (B, LA))]
    b = lut[rng.integers(0, len(lut), (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    lk = al._lut_k(subK)
    assert lk > 0
    args = tuple(jnp.asarray(v) for v in (ac, bc, na, nb, subK, imK)) + (
        np.int32(sc.gap_open), np.int32(sc.gap_extend),
        np.int32(sc.dp_floor(is_sw)))
    for use_f32 in (False, True):
        got = np.asarray(pallas_scores(
            *args, is_sw=is_sw, interpret=True, use_f32=use_f32,
            lut_k=lk, bs=al._pallas_bs(B, LB, lut_k=lk)))
        ref = dp.dp_fill(
            *args, is_sw=is_sw, nsg=False, neg=False, nga=False, ngb=False,
            nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
        )
        want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nsg,neg", [(True, False), (False, True),
                                     (True, True)])
def test_pallas_scores_inline_lut_free_gaps(nsg, neg):
    """LUT mode composes with the free start/end-gap boundary variants."""
    import seqalign_tpu.aligners as al

    sc, alpha = _lut_cfgs()["wild"]
    sc.no_start_gap_penalty = nsg
    sc.no_end_gap_penalty = neg
    rng = np.random.default_rng(7 + nsg + 2 * neg)
    B, LA, LB = 5, 48, 32
    lut = np.frombuffer(alpha.encode(), dtype=np.uint8)
    a = lut[rng.integers(0, len(lut), (B, LA))]
    b = lut[rng.integers(0, len(lut), (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    lk = al._lut_k(subK)
    args = tuple(jnp.asarray(v) for v in (ac, bc, na, nb, subK, imK)) + (
        np.int32(sc.gap_open), np.int32(sc.gap_extend),
        np.int32(sc.dp_floor(False)))
    got = np.asarray(pallas_scores(
        *args, is_sw=False, interpret=True, lut_k=lk, nsg=nsg, neg=neg))
    ref = dp.dp_fill(
        *args, is_sw=False, nsg=nsg, neg=neg, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)


def test_scores_auto_routes_lut(monkeypatch):
    """score_batch / best_score_batch on a matrix config must route through
    the Pallas LUT mode (lut_k > 0) and still produce exact scores."""
    import seqalign_tpu.aligners as al
    import seqalign_tpu.ops.pallas_dp as pdp
    import seqalign_tpu.ops.pallas_dp2 as pdp2

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    seen = []
    orig = pdp.pallas_scores
    orig2 = pdp2.pallas_scores2

    def spy(*a, **k):
        seen.append(k.get("lut_k", 0))
        return orig(*a, **k)

    def spy2(*a, **k):
        # the round-3 chained kernel owns eligible matrix configs now;
        # its packed-LUT mode is the same in-kernel-scoring contract
        seen.append(k.get("lut_np", 0))
        return orig2(*a, **k)

    monkeypatch.setattr(pdp, "pallas_scores", spy)
    monkeypatch.setattr(pdp2, "pallas_scores2", spy2)
    monkeypatch.setattr(al, "pallas_scores2", spy2, raising=False)
    sc, alpha = _lut_cfgs()["wild"]
    rng = np.random.default_rng(11)
    seqs_a = ["".join(rng.choice(list(alpha), rng.integers(2, 30)))
              for _ in range(5)]
    seqs_b = ["".join(rng.choice(list(alpha), rng.integers(2, 30)))
              for _ in range(5)]
    got_nw = al.NeedlemanWunsch(sc).score_batch(seqs_a, seqs_b)
    got_sw = al.SmithWaterman(sc).best_score_batch(seqs_a, seqs_b)
    assert seen and all(k > 0 for k in seen), seen
    from seqalign_tpu.ops import oracle

    for i, (x, y) in enumerate(zip(seqs_a, seqs_b)):
        M, Ga, Gb = oracle.fill_matrices(sc, x, y, is_sw=False)
        assert got_nw[i] == max(M[-1, -1], Ga[-1, -1], Gb[-1, -1])
        Ms = oracle.fill_matrices(sc, x, y, is_sw=True)[0]
        assert got_sw[i] == max(0, int(Ms.max()))


def test_pallas_scores_lut_protein_alphabet(monkeypatch):
    """Raising SEQALIGN_LUT_KMAX pulls a 24-letter protein matrix
    (BLOSUM62) into the in-kernel LUT mode — still bit-identical to the
    XLA wavefront at chain length 24."""
    import seqalign_tpu.aligners as al
    from seqalign_tpu.scoring.presets import scoring_system_BLOSUM62

    monkeypatch.setenv("SEQALIGN_LUT_KMAX", "32")
    sc = scoring_system_BLOSUM62()
    rng = np.random.default_rng(62)
    alpha = list("ARNDCQEGHILKMFPSTWYV")
    B, LA, LB = 4, 40, 32
    a = np.array([[ord(rng.choice(alpha)) for _ in range(LA)]
                  for _ in range(B)], np.uint8)
    b = np.array([[ord(rng.choice(alpha)) for _ in range(LB)]
                  for _ in range(B)], np.uint8)
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    lk = al._lut_k(subK)
    assert lk >= 24
    args = tuple(jnp.asarray(v) for v in (ac, bc, na, nb, subK, imK)) + (
        np.int32(sc.gap_open), np.int32(sc.gap_extend),
        np.int32(sc.dp_floor(True)))
    got = np.asarray(pallas_scores(
        *args, is_sw=True, interpret=True, lut_k=lk,
        bs=al._pallas_bs(B, 32, lut_k=lk)))
    ref = dp.dp_fill(
        *args, is_sw=True, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    np.testing.assert_array_equal(got, np.asarray(ref.best))
    # default gate keeps protein on the plane-streaming path
    monkeypatch.delenv("SEQALIGN_LUT_KMAX")
    assert al._lut_k(subK) == 0


def test_f32_safe_uses_true_bounds():
    """min/max_penalty are frozen at scoring_init for NEG_INF byte parity
    (CLI flag mutations never recompute them) — the f32 exactness gate
    must NOT trust them.  A CLI-style mutated huge mismatch keeps
    min_penalty at the preset's -5 but must still disqualify f32."""
    from seqalign_tpu.ops.pallas_dp import f32_safe

    sc = scoring_system_default()
    assert f32_safe(sc, 512, 512)
    sc.mismatch = -(1 << 23)  # CLI mutation: no recompute
    sc._luts = None
    assert sc.min_penalty == -5  # parity: frozen
    assert not f32_safe(sc, 512, 512)  # exactness: real bound


def test_mm_eligible_gates():
    from seqalign_tpu.scoring.config import ScoringConfig

    assert dp.mm_eligible(ScoringConfig(1, -2, -4, -1))
    wc = ScoringConfig(1, -2, -4, -1).add_wildcard("N", 0)
    assert not dp.mm_eligible(wc)
    sw = ScoringConfig(1, -2, -4, -1).add_mutation("a", "c", 3)
    assert not dp.mm_eligible(sw)
    from seqalign_tpu.scoring.presets import scoring_system_BLOSUM62

    assert not dp.mm_eligible(scoring_system_BLOSUM62())


@pytest.mark.parametrize("LB", [512, 32])  # P == 1 and interleaved P > 1
@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_dirs_inline_mm(is_sw, LB):
    """Dirs kernel inline equality scoring: interior planes bit-identical
    to the XLA scan, with mixed-case ragged inputs — in both the one-pair-
    per-row and the interleaved lane-packed layouts."""
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(2, -2, -2, -1) if is_sw else scoring_system_default()
    rng = np.random.default_rng(31 + is_sw)
    B, LA = 3, 24
    lut = np.frombuffer(b"acgtACGT", dtype=np.uint8)
    a = lut[rng.integers(0, 8, (B, LA))]
    b = lut[rng.integers(0, 8, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    acm, bcm = dp.compact_inputs_mm(sc, a, b)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    mn = np.int32(sc.dp_floor(is_sw))
    dirs, m, corner = pallas_fill_dirs(
        jnp.asarray(acm), jnp.asarray(bcm), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), np.int32(sc.gap_open), np.int32(sc.gap_extend),
        mn, is_sw=is_sw, emit_m=is_sw, use_f32=True, interpret=True,
        bs=8, unroll=4, inline_mm=True, match=sc.match, mismatch=sc.mismatch,
    )
    geo = pack_geometry(LA, LB, bs=8, inline=True)
    assert geo["ILV"] == (LB < 512)
    dirs_np = np.asarray(dirs)
    m_np = np.asarray(m) if m is not None else None
    ref = dp.dp_fill(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), np.int32(sc.gap_open),
        np.int32(sc.gap_extend), mn, is_sw=is_sw, nsg=False, neg=False,
        nga=False, ngb=False, nmm=False, emit_dirs=True, emit_m=is_sw,
        emit_gab=False,
    )
    xd = np.asarray(ref.dirs)
    xm = np.asarray(ref.mmat) if is_sw else None
    xc = np.asarray(ref.corner)
    for j in range(B):
        pd = unpack_pair_plane(dirs_np, j, geo["BS"], geo["P"], LB, geo["D"],
                               ilv=geo["ILV"])
        naj, nbj = int(na[j]), int(nb[j])
        for y in range(1, nbj + 1):
            r0 = y - 1
            np.testing.assert_array_equal(
                pd[r0:r0 + naj, y], xd[j][r0:r0 + naj, y],
                err_msg=f"dirs pair {j} y={y}")
            if is_sw:
                pm = unpack_pair_plane(m_np, j, geo["BS"], geo["P"], LB,
                                       geo["D"], ilv=geo["ILV"])
                np.testing.assert_array_equal(
                    pm[r0:r0 + naj, y], xm[j][r0:r0 + naj, y],
                    err_msg=f"M pair {j} y={y}")
        if not is_sw:
            np.testing.assert_array_equal(np.asarray(corner)[j], xc[j])


def test_pallas_scores_inline_mm_packed():
    """P>1 interleaved inline scores (short b) vs the XLA path."""
    sc = scoring_system_default()
    rng = np.random.default_rng(17)
    B, LA, LB = 8, 96, 128
    luta = np.frombuffer(b"acgGA", dtype=np.uint8)
    lutb = np.frombuffer(b"gtTAc", dtype=np.uint8)
    a = luta[rng.integers(0, 5, (B, LA))]
    b = lutb[rng.integers(0, 5, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    acm, bcm = dp.compact_inputs_mm(sc, a, b)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(False))
    got = np.asarray(pallas_scores(
        jnp.asarray(acm), jnp.asarray(bcm), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), go, ge, mn, is_sw=False,
        interpret=True, inline_mm=True, match=sc.match, mismatch=sc.mismatch,
    ))
    ref = dp.dp_fill(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), go, ge, mn, is_sw=False,
        nsg=False, neg=False, nga=False, ngb=False, nmm=False,
        emit_dirs=False, emit_m=False, emit_gab=False,
    )
    np.testing.assert_array_equal(
        got, np.asarray(jnp.max(ref.corner, axis=1)))


@pytest.mark.parametrize("nsg,neg", [(True, False), (False, True),
                                     (True, True)])
@pytest.mark.parametrize("inline", [False, True])
@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_scores_free_gap_modes(nsg, neg, inline, is_sw):
    """Free start/end-gap modes through the scores kernel (both scoring
    paths, NW and SW — the XLA fill applies neg to SW too) must equal the
    XLA fill exactly."""
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(2 if is_sw else 1, -2, -4, -1,
                       no_start_gap_penalty=nsg, no_end_gap_penalty=neg)
    rng = np.random.default_rng(3 * nsg + 7 * neg + inline + 17 * is_sw)
    B, LA, LB = 8, 96, 128
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    a = lut[rng.integers(0, 4, (B, LA))]
    b = lut[rng.integers(0, 4, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(is_sw))
    if inline:
        acp, bcp = dp.compact_inputs_mm(sc, a, b)
    else:
        acp, bcp = ac, bc
    got = np.asarray(pallas_scores(
        jnp.asarray(acp), jnp.asarray(bcp), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), go, ge, mn, is_sw=is_sw,
        interpret=True, inline_mm=inline, match=sc.match,
        mismatch=sc.mismatch, nsg=nsg, neg=neg,
    ))
    ref = dp.dp_fill(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), go, ge, mn, is_sw=is_sw,
        nsg=nsg, neg=neg, nga=False, ngb=False, nmm=False,
        emit_dirs=False, emit_m=False, emit_gab=False,
    )
    want = np.asarray(ref.best if is_sw else jnp.max(ref.corner, axis=1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nsg,neg", [(True, False), (False, True),
                                     (True, True)])
@pytest.mark.parametrize("inline", [True, False])
@pytest.mark.parametrize("is_sw", [False, True])
def test_pallas_dirs_free_gap_modes(nsg, neg, inline, is_sw):
    """Free start/end-gap traceback through the dirs kernel (inline AND
    plane scoring paths, NW and SW): interior planes and corners
    bit-identical to the XLA scan (the equalities must see the zeroed
    end-gap penalties, alignment.c:265-268)."""
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(2 if is_sw else 1, -2, -4, -1,
                       no_start_gap_penalty=nsg, no_end_gap_penalty=neg)
    rng = np.random.default_rng(11 * nsg + 13 * neg + 5 * is_sw + inline)
    B, LA, LB = 3, 24, 32
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    a = lut[rng.integers(0, 4, (B, LA))]
    b = lut[rng.integers(0, 4, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    mn = np.int32(sc.dp_floor(is_sw))
    if inline:
        acp, bcp = dp.compact_inputs_mm(sc, a, b)
    else:
        acp, bcp = ac, bc
    dirs, m, corner = pallas_fill_dirs(
        jnp.asarray(acp), jnp.asarray(bcp), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), np.int32(sc.gap_open), np.int32(sc.gap_extend),
        mn, is_sw=is_sw, emit_m=is_sw, use_f32=True, interpret=True,
        bs=8, unroll=4, inline_mm=inline, match=sc.match,
        mismatch=sc.mismatch, nsg=nsg, neg=neg,
    )
    geo = pack_geometry(LA, LB, bs=8, inline=inline)
    dirs_np = np.asarray(dirs)
    m_np = np.asarray(m) if m is not None else None
    ref = dp.dp_fill(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), np.int32(sc.gap_open),
        np.int32(sc.gap_extend), mn, is_sw=is_sw, nsg=nsg, neg=neg,
        nga=False, ngb=False, nmm=False, emit_dirs=True, emit_m=is_sw,
        emit_gab=False,
    )
    xd = np.asarray(ref.dirs)
    xm = np.asarray(ref.mmat) if is_sw else None
    for j in range(B):
        pd = unpack_pair_plane(dirs_np, j, geo["BS"], geo["P"], LB,
                               geo["D"], ilv=geo["ILV"])
        naj, nbj = int(na[j]), int(nb[j])
        for y in range(1, nbj + 1):
            r0 = y - 1
            np.testing.assert_array_equal(
                pd[r0:r0 + naj, y], xd[j][r0:r0 + naj, y],
                err_msg=f"dirs pair {j} y={y} nsg={nsg} neg={neg}")
            if is_sw:
                pm = unpack_pair_plane(m_np, j, geo["BS"], geo["P"], LB,
                                       geo["D"], ilv=geo["ILV"])
                np.testing.assert_array_equal(
                    pm[r0:r0 + naj, y], xm[j][r0:r0 + naj, y],
                    err_msg=f"M pair {j} y={y}")
        if not is_sw:
            np.testing.assert_array_equal(np.asarray(corner)[j],
                                          np.asarray(ref.corner)[j])


def test_aligner_free_gap_modes_interpret(monkeypatch):
    """align_batch with --freestartgap/--freeendgap through the Pallas path
    == the host reference path (alignment strings, not just scores)."""
    from seqalign_tpu.aligners import NeedlemanWunsch
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.scoring.config import ScoringConfig

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    rng = np.random.default_rng(23)
    seqs_a = ["".join(rng.choice(list("acgt"), rng.integers(3, 14)))
              for _ in range(5)]
    seqs_b = ["".join(rng.choice(list("acgt"), rng.integers(3, 14)))
              for _ in range(5)]
    for nsg, neg in ((True, False), (False, True), (True, True)):
        sc = ScoringConfig(1, -2, -4, -1, no_start_gap_penalty=nsg,
                           no_end_gap_penalty=neg)
        nw = NeedlemanWunsch(sc)
        got = nw.align_batch(seqs_a, seqs_b)
        want = [host_dp.nw_align(sc, x, y) for x, y in zip(seqs_a, seqs_b)]
        assert got == want, (nsg, neg)


@pytest.mark.parametrize("chunk", [16, 24])
def test_pallas_long_fill_nw(monkeypatch, chunk):
    """align_long through the chunked Pallas dirs kernel (boundary-column
    carry on device) must equal the one-shot host alignment exactly."""
    from seqalign_tpu.aligners import NeedlemanWunsch
    from seqalign_tpu.ops import host_dp

    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    rng = np.random.default_rng(chunk)
    a = "".join(rng.choice(list("acgtACGT"), 70))
    b = "".join(rng.choice(list("acgt"), 40))
    nw = NeedlemanWunsch()
    got = nw.align_long(a, b, chunk=chunk)
    want = host_dp.nw_align(nw.scoring, a, b)
    assert (got.result_a, got.result_b, got.score) == \
        (want.result_a, want.result_b, want.score)


@pytest.mark.parametrize("min_score", [None, 5])
def test_pallas_long_fill_sw(monkeypatch, min_score):
    from seqalign_tpu.aligners import SmithWaterman
    from seqalign_tpu.ops import host_dp

    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    rng = np.random.default_rng(41)
    a = "".join(rng.choice(list("acgt"), 80))
    b = "".join(rng.choice(list("acgt"), 50))
    sw = SmithWaterman()
    it = sw.align_long(a, b, chunk=24, min_score=min_score)
    host = host_dp.HostSwHits(sw.scoring, a, b)
    got = [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b) for h in it]
    want = []
    while True:
        h = host.fetch()
        if h is None or (min_score is not None and h.score < min_score):
            break
        want.append((h.score, h.pos_a, h.pos_b, h.result_a, h.result_b))
    if min_score is None:
        assert got == want
    else:
        assert got[: len(want)] == want
        assert all(g[0] >= min_score for g in got)


@pytest.mark.parametrize("cfg", ["wild", "matrix"])
def test_pallas_long_fill_lut(monkeypatch, cfg):
    """Matrix-scoring configs ride the chunked Pallas path too (the LUT
    planes are b-indexed, identical across a-chunks): alignments and SW
    hit streams must equal the host one-shot path."""
    import seqalign_tpu.ops.pallas_dp as pdp
    from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman
    from seqalign_tpu.ops import host_dp

    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    seen = []
    orig = pdp.fill_dirs_long

    def spy(*a, **k):
        seen.append(k.get("lut_k", 0))
        return orig(*a, **k)

    monkeypatch.setattr(pdp, "fill_dirs_long", spy)
    sc, alpha = _lut_cfgs()[cfg]
    rng = np.random.default_rng(len(cfg))
    a = "".join(rng.choice(list(alpha), 70))
    b = "".join(rng.choice(list(alpha), 40))
    nw = NeedlemanWunsch(sc)
    got = nw.align_long(a, b, chunk=24)
    want = host_dp.nw_align(sc, a, b)
    assert (got.result_a, got.result_b, got.score) == \
        (want.result_a, want.result_b, want.score)
    sw = SmithWaterman(sc)
    for min_score in (None, 5):
        it = sw.align_long(a, b, chunk=24, min_score=min_score)
        host = host_dp.HostSwHits(sc, a, b)
        hits = [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
                for h in it]
        want_h = []
        while True:
            h = host.fetch()
            if h is None or (min_score is not None and h.score < min_score):
                break
            want_h.append((h.score, h.pos_a, h.pos_b, h.result_a,
                           h.result_b))
        if min_score is None:
            assert hits == want_h
        else:
            assert hits[: len(want_h)] == want_h
            assert all(g[0] >= min_score for g in hits)
    assert seen and all(k > 0 for k in seen), seen


def test_pallas_long_fill_failure_memo(monkeypatch):
    """A Mosaic failure in the chunked Pallas path memoizes: the per-pair
    fallback must not retry the failing compile once per pair, and
    interpret mode re-raises instead of falling back."""
    import seqalign_tpu.aligners as al
    import seqalign_tpu.ops.pallas_dp as pdp

    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("mosaic says no")

    monkeypatch.setattr(pdp, "fill_dirs_long", boom)
    monkeypatch.setattr(al, "_LONG_PALLAS_OK", True)
    # interpret mode: the failure must propagate (tests never mask bugs)
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    with pytest.raises(RuntimeError):
        al._pallas_long_fill(al.scoring_system_default(), ["acgt"], ["ac"],
                             is_sw=False, chunk=16)
    assert al._LONG_PALLAS_OK  # interpret re-raise happens before the memo?
    # non-interpret: swallow, memoize, and skip Pallas on the next call
    monkeypatch.delenv("SEQALIGN_PALLAS")
    calls.clear()
    sc = al.scoring_system_default()
    monkeypatch.setattr(al, "_pallas_eligible", lambda _sc: True)
    assert al._pallas_long_fill(sc, ["acgt"], ["ac"], is_sw=False,
                                chunk=16) is None
    assert calls == [1] and not al._LONG_PALLAS_OK
    assert al._pallas_long_fill(sc, ["acgt"], ["ac"], is_sw=False,
                                chunk=16) is None
    assert calls == [1]  # memoized: no second compile attempt


def test_pallas_long_harvest_exact_candidates():
    """Chunked SW streaming harvest: the candidate set must be EXACTLY the
    interior cells with M >= threshold — K-padded plane columns past each
    chunk boundary must never leak through the validity mask (they map to
    global x <= na, so only the per-chunk depth trim excludes them;
    regression for a bug that emitted duplicate flats with wrong scores)."""
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.ops.pallas_dp import fill_dirs_long

    sc = scoring_system_sw_default()
    rng = np.random.default_rng(0)
    core = "".join(rng.choice(list("acgt"), 30))
    a = ("".join(rng.choice(list("acgt"), 20)) + core
         + "".join(rng.choice(list("acgt"), 20)))
    b = ("".join(rng.choice(list("acgt"), 35)) + core
         + "".join(rng.choice(list("acgt"), 35)))
    A, na = dp.pad_batch([a])
    B_, nb = dp.pad_batch([b])
    B_ = np.pad(B_, ((0, 0), (0, 128 - B_.shape[1])))
    ac, bc = dp.compact_inputs_mm(sc, A, B_)
    _, m_part, _, _ = fill_dirs_long(
        ac, bc, na, nb, np.int32(sc.gap_open), np.int32(sc.gap_extend),
        np.int32(0), is_sw=True, emit_m=True, match=np.int32(sc.match),
        mismatch=np.int32(sc.mismatch), chunk=32, use_f32=True,
        interpret=True, bs=8, extract_min=np.array([1], np.int32))
    flats, scores = m_part[0]
    M = host_dp.fill_matrices(sc, a, b, True)[0]
    want = {y * (len(a) + 1) + x: int(M[y, x])
            for y in range(1, len(b) + 1) for x in range(1, len(a) + 1)
            if M[y, x] >= 1}
    assert len(flats) == len(set(flats.tolist())) == len(want)
    assert dict(zip(flats.tolist(), scores.tolist())) == want


def test_pallas_long_bucket_batched(monkeypatch):
    """The long-pair bucket batches through one chunked Pallas fill per
    |b| group; alignments and hit streams must equal the host path."""
    import seqalign_tpu.aligners as al
    from seqalign_tpu.ops import host_dp

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    monkeypatch.setattr(al, "LONG_PAIR_CELLS", 600)
    rng = np.random.default_rng(3)
    seqs_a = ["".join(rng.choice(list("acgt"), rng.integers(25, 60)))
              for _ in range(4)]
    seqs_b = ["".join(rng.choice(list("acgt"), rng.integers(25, 60)))
              for _ in range(4)]
    nw = al.NeedlemanWunsch()
    got = nw.align_batch(seqs_a, seqs_b)
    want = [host_dp.nw_align(nw.scoring, a, b)
            for a, b in zip(seqs_a, seqs_b)]
    assert got == want
    sw = al.SmithWaterman()
    its = sw.align_batch(seqs_a, seqs_b, min_scores=[4] * 4)
    for it, a, b in zip(its, seqs_a, seqs_b):
        host = host_dp.HostSwHits(sw.scoring, a, b)
        hit_got = [(h.score, h.pos_a, h.pos_b, h.result_a) for h in it]
        hit_want = []
        while True:
            h = host.fetch()
            if h is None or h.score < 4:
                break
            hit_want.append((h.score, h.pos_a, h.pos_b, h.result_a))
        assert hit_got[: len(hit_want)] == hit_want
        assert all(g[0] >= 4 for g in hit_got)
    its2 = sw.align_batch(seqs_a, seqs_b)
    for it, a, b in zip(its2, seqs_a, seqs_b):
        host = list(host_dp.HostSwHits(sw.scoring, a, b))
        got2 = [(h.score, h.pos_a, h.pos_b, h.result_a) for h in it]
        assert got2 == [(h.score, h.pos_a, h.pos_b, h.result_a)
                        for h in host]


def test_pallas_scores_wide_lbt():
    """LBt beyond TL=512 (one pair spans the whole row) — bit-exact on real
    TPU up to LBt=4096 (measured); interpret mode pins the wiring, and
    aligners._pallas_bs must shrink the batch chunk to fit VMEM."""
    from seqalign_tpu.aligners import _pallas_bs

    sc = scoring_system_default()
    args = _setup(sc, 2, 16, 1024, seed=9, is_sw=False)
    got = np.asarray(
        pallas_scores(*args, is_sw=False, interpret=True,
                      bs=_pallas_bs(2, 1024))
    )
    ref = dp.dp_fill(
        *args, is_sw=False, nsg=False, neg=False, nga=False, ngb=False,
        nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
    )
    np.testing.assert_array_equal(got, np.asarray(jnp.max(ref.corner,
                                                          axis=1)))


def test_pallas_bs_vmem_cap():
    from seqalign_tpu.aligners import _pallas_bs

    assert _pallas_bs(256, 128) == 64   # P=4 packing: 64 sublanes hold 256
    assert _pallas_bs(10_000, 512) == 128
    assert _pallas_bs(10_000, 1024) == 128
    assert _pallas_bs(10_000, 2048) == 64
    assert _pallas_bs(10_000, 4096) == 32
    assert _pallas_bs(1, 4096) == 8


# ---------------------------------------------------------------------------
# Direction-code kernel (pallas_fill_dirs): planes must be bit-identical to
# the XLA dirs scan on every interior cell, and the aligner wiring must
# produce byte-identical alignments.
# ---------------------------------------------------------------------------

from seqalign_tpu.ops.pallas_dp import (  # noqa: E402
    pack_geometry,
    pallas_fill_dirs,
    unpack_pair_plane,
)


@pytest.mark.parametrize("is_sw,use_f32", [(False, True), (False, False),
                                           (True, True), (True, False)])
def test_pallas_dirs_match_xla(is_sw, use_f32):
    sc = scoring_system_sw_default() if is_sw else scoring_system_default()
    rng = np.random.default_rng(7 + is_sw)
    B, LA, LB = 3, 24, 16
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    a = lut[rng.integers(0, 4, (B, LA))]
    b = lut[rng.integers(0, 4, (B, LB))]
    na = rng.integers(1, LA + 1, B).astype(np.int32)
    nb = rng.integers(1, LB + 1, B).astype(np.int32)
    ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
    mn = np.int32(sc.dp_floor(is_sw))
    dirs, m, corner = pallas_fill_dirs(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), np.int32(sc.gap_open), np.int32(sc.gap_extend),
        mn, is_sw=is_sw, emit_m=is_sw, use_f32=use_f32, interpret=True,
        bs=8, unroll=4,
    )
    geo = pack_geometry(LA, LB, bs=8)
    dirs_np = np.asarray(dirs)
    m_np = np.asarray(m) if m is not None else None

    ref = dp.dp_fill(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
        jnp.asarray(subK), jnp.asarray(imK), np.int32(sc.gap_open),
        np.int32(sc.gap_extend), mn, is_sw=is_sw, nsg=False, neg=False,
        nga=False, ngb=False, nmm=False, emit_dirs=True, emit_m=is_sw,
        emit_gab=False,
    )
    xd = np.asarray(ref.dirs)
    xm = np.asarray(ref.mmat) if is_sw else None
    xc = np.asarray(ref.corner)
    for j in range(B):
        pd = unpack_pair_plane(dirs_np, j, geo["BS"], geo["P"], LB, geo["D"])
        naj, nbj = int(na[j]), int(nb[j])
        for y in range(1, nbj + 1):
            r0 = y - 1
            np.testing.assert_array_equal(
                pd[r0:r0 + naj, y], xd[j][r0:r0 + naj, y],
                err_msg=f"dirs pair {j} y={y}",
            )
            if is_sw:
                pm = unpack_pair_plane(m_np, j, geo["BS"], geo["P"], LB,
                                       geo["D"])
                np.testing.assert_array_equal(
                    pm[r0:r0 + naj, y], xm[j][r0:r0 + naj, y],
                    err_msg=f"M pair {j} y={y}",
                )
        if not is_sw:
            np.testing.assert_array_equal(np.asarray(corner)[j], xc[j])


_CONSTRAINED = [
    dict(no_gaps_in_a=True),
    dict(no_gaps_in_b=True),
    dict(no_gaps_in_a=True, no_gaps_in_b=True),
    dict(no_mismatches=True),
]


@pytest.mark.parametrize("idx", range(len(_CONSTRAINED)))
def test_pallas_constrained_modes_nw(monkeypatch, idx):
    """--nogapsin1/--nogapsin2/--nomismatches ride the Pallas kernels now:
    align_batch and score_batch through the device path must equal the
    host reference exactly (incl. the end-gap exception,
    alignment.c:121-137 + tests.c:65-98)."""
    from seqalign_tpu.aligners import NeedlemanWunsch
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.scoring.config import ScoringConfig

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    kw = _CONSTRAINED[idx]
    sc = ScoringConfig(1, -2, -4, -1, **kw)
    rng = np.random.default_rng(17 + idx)
    sa = ["".join(rng.choice(list("acgt"), rng.integers(2, 20)))
          for _ in range(6)]
    sb = ["".join(rng.choice(list("acgt"), rng.integers(2, 20)))
          for _ in range(6)]
    nw = NeedlemanWunsch(sc)
    got = nw.align_batch(sa, sb)
    want = [host_dp.nw_align(sc, x, y) for x, y in zip(sa, sb)]
    assert got == want, kw
    scores = nw.score_batch(sa, sb)
    assert list(scores) == [w.score for w in want], kw


@pytest.mark.parametrize("idx", range(len(_CONSTRAINED) + 1))
def test_pallas_constrained_modes_sw(monkeypatch, idx):
    """SW constrained modes (incl. the LCS combo no_gaps+no_mismatch+
    case_sensitive) through the Pallas dirs kernel: hit streams equal the
    host path."""
    from seqalign_tpu.aligners import SmithWaterman
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.scoring.config import ScoringConfig

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    combos = _CONSTRAINED + [dict(no_gaps_in_a=True, no_gaps_in_b=True,
                                  no_mismatches=True, case_sensitive=True)]
    kw = combos[idx]
    sc = ScoringConfig(1, -1, -4, -1, **kw)
    rng = np.random.default_rng(29 + idx)
    sa = ["".join(rng.choice(list("acgt"), rng.integers(2, 20)))
          for _ in range(5)]
    sb = ["".join(rng.choice(list("acgt"), rng.integers(2, 20)))
          for _ in range(5)]
    for it, x, y in zip(SmithWaterman(sc).align_batch(sa, sb), sa, sb):
        got = [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
               for h in it]
        want = [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
                for h in host_dp.HostSwHits(sc, x, y)]
        assert got == want, (kw, x, y)


@pytest.mark.parametrize("nga,ngb", [(True, False), (False, True),
                                     (True, True)])
def test_pallas_constrained_lut(monkeypatch, nga, ngb):
    """No-gaps modes compose with LUT scoring (wildcard matrix): full
    alignments and SW hit streams through the Pallas kernels equal the
    host path."""
    from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.scoring.config import ScoringConfig

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    sc = ScoringConfig(2, -3, -5, -2, no_gaps_in_a=nga, no_gaps_in_b=ngb)
    sc.add_wildcard("n", 1)
    rng = np.random.default_rng(37 + nga + 2 * ngb)
    sa = ["".join(rng.choice(list("acgtn"), rng.integers(2, 18)))
          for _ in range(4)]
    sb = ["".join(rng.choice(list("acgtn"), rng.integers(2, 18)))
          for _ in range(4)]
    nw = NeedlemanWunsch(sc)
    got = nw.align_batch(sa, sb)
    want = [host_dp.nw_align(sc, x, y) for x, y in zip(sa, sb)]
    assert got == want
    assert list(nw.score_batch(sa, sb)) == [w.score for w in want]
    for it, x, y in zip(SmithWaterman(sc).align_batch(sa, sb), sa, sb):
        hit_got = [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
                   for h in it]
        hit_want = [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
                    for h in host_dp.HostSwHits(sc, x, y)]
        assert hit_got == hit_want, (x, y)


def test_sentinel_wrap_regime_routes_host(monkeypatch):
    """NW no-gaps with penalties beyond the frozen |min_penalty| headroom:
    the reference overflows int32 (UB) and aborts; we detect the regime
    and always use the int64 host fill — even under SEQALIGN_FORCE=device
    — returning the mathematically optimal alignment (README known
    deviations).  SW (sentinel-free) keeps its device routing."""
    from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman, _route
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.scoring.config import ScoringConfig

    # the live-sweep repro: --printscores --gapopen -7 --nogaps
    sc = ScoringConfig(1, -2, -7, -1, no_gaps_in_a=True, no_gaps_in_b=True)
    assert sc.sentinel_wrap_risk()
    a, b = "catcgggancncgnaacccnaantcg", "cnnncgagtcgcactnactacntnacct"
    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    got = NeedlemanWunsch(sc).align_batch([a], [b])[0]
    want = host_dp.nw_align(sc, a, b)
    assert (got.result_a, got.result_b, got.score) == \
        (want.result_a, want.result_b, want.score)
    assert got.score == -37  # pinned from the reference-crash repro
    # LCS-style SW configs are sentinel-free: not in the regime
    lcs_sc = ScoringConfig(1, -1, -4, -1, no_gaps_in_a=True,
                           no_gaps_in_b=True, no_mismatches=True,
                           case_sensitive=True)
    assert _route(10**9, 10**3) == "device"  # force respected for SW sites
    it = SmithWaterman(lcs_sc).align_batch([a.replace("n", "t")],
                                           [a.replace("n", "t")])[0]
    host = host_dp.HostSwHits(lcs_sc, a.replace("n", "t"),
                              a.replace("n", "t"))
    assert [(h.score, h.pos_a, h.pos_b) for h in it] == \
        [(h.score, h.pos_a, h.pos_b) for h in host]


def test_lcs_device_pallas(monkeypatch):
    """The LCS CLI recipe (SW self-alignment, no_gaps+no_mismatches+
    case_sensitive, lcs_cmdline.c:39-49) through the device/Pallas path
    must produce the host hit stream."""
    import seqalign_tpu.aligners as al

    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    rng = np.random.default_rng(31)
    for _ in range(4):
        s = "".join(rng.choice(list("acgt"), rng.integers(6, 28)))
        monkeypatch.setenv("SEQALIGN_FORCE", "device")
        got = list(al.lcs_hits(s))
        monkeypatch.setenv("SEQALIGN_FORCE", "host")
        want = list(al.lcs_hits(s))
        assert got == want, s


@pytest.mark.parametrize("cfg", ["wild", "swap", "matrix"])
def test_aligner_pallas_dirs_lut_wiring(monkeypatch, cfg):
    """align_batch on matrix-scoring configs must route through the Pallas
    dirs kernel's LUT mode and reproduce the host path exactly —
    alignments, SW hit streams, and NW corners."""
    import seqalign_tpu.ops.pallas_dp as pdp
    import seqalign_tpu.ops.pallas_dp2 as pdp2
    from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman

    sc, alpha = _lut_cfgs()[cfg]
    rng = np.random.default_rng(5 + len(cfg))
    seqs_a = ["".join(rng.choice(list(alpha), rng.integers(2, 18)))
              for _ in range(4)]
    seqs_b = ["".join(rng.choice(list(alpha), rng.integers(2, 18)))
              for _ in range(4)]

    monkeypatch.setenv("SEQALIGN_FORCE", "host")
    want_nw = NeedlemanWunsch(sc).align_batch(seqs_a, seqs_b)
    want_sw = [list(h) for h in SmithWaterman(sc).align_batch(seqs_a,
                                                              seqs_b)]

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    seen = []
    orig = pdp.pallas_fill_dirs
    orig2 = pdp2.pallas_fill_dirs2

    def spy(*a, **k):
        seen.append(k.get("lut_k", 0))
        return orig(*a, **k)

    def spy2(*a, **k):
        # the round-3 chained kernel owns eligible matrix configs —
        # same in-kernel LUT-scoring contract (packed planes)
        seen.append(k.get("lut_np", 0))
        return orig2(*a, **k)

    monkeypatch.setattr(pdp, "pallas_fill_dirs", spy)
    monkeypatch.setattr(pdp2, "pallas_fill_dirs2", spy2)
    got_nw = NeedlemanWunsch(sc).align_batch(seqs_a, seqs_b)
    got_sw = [list(h) for h in SmithWaterman(sc).align_batch(seqs_a,
                                                             seqs_b)]
    assert seen and all(k > 0 for k in seen), seen
    assert got_nw == want_nw
    assert got_sw == want_sw


def test_aligner_pallas_dirs_wiring(monkeypatch):
    """align_batch through the Pallas dirs kernel (interpret) must produce
    exactly the host-path alignments/hits."""
    from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman

    rng = np.random.default_rng(11)
    seqs_a = ["".join(rng.choice(list("acgt"), rng.integers(2, 14)))
              for _ in range(4)]
    seqs_b = ["".join(rng.choice(list("acgt"), rng.integers(2, 14)))
              for _ in range(4)]

    monkeypatch.setenv("SEQALIGN_FORCE", "host")
    want_nw = NeedlemanWunsch().align_batch(seqs_a, seqs_b)
    want_sw = [list(h) for h in SmithWaterman().align_batch(seqs_a, seqs_b)]

    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    got_nw = NeedlemanWunsch().align_batch(seqs_a, seqs_b)
    got_sw = [list(h) for h in SmithWaterman().align_batch(seqs_a, seqs_b)]
    assert got_nw == want_nw
    assert got_sw == want_sw
