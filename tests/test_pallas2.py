"""v2 chained scores kernel (ops/pallas_dp2) — interpret-mode exactness
against the v1 XLA fill across modes, chain counts, and ragged batches,
plus the aligners dispatch gate."""

import dataclasses

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from seqalign_tpu.ops import dp  # noqa: E402
from seqalign_tpu.ops.pallas_dp2 import (  # noqa: E402
    chain_geometry, f32_safe2, lut2_eligible, pallas_scores2,
)
from seqalign_tpu.scoring.config import ScoringConfig  # noqa: E402
from seqalign_tpu.scoring.presets import (  # noqa: E402
    scoring_system_BLOSUM62,
    scoring_system_default,
    scoring_system_sw_default,
)

DNA = b"acgt"
PROT = b"ARNDCQEGHILKMFPSTWYV"

CASES = [
    # (name, sc_factory, is_sw, lut, alpha, B, LA, LB, chain)
    ("nw_c1", scoring_system_default, False, False, DNA, 12, 48, 48, 1),
    ("nw_c4", scoring_system_default, False, False, DNA, 16, 48, 48, 4),
    ("sw_c4", scoring_system_sw_default, True, False, DNA, 16, 48, 48, 4),
    ("nw_ragged", scoring_system_default, False, False, DNA, 13, 80, 48, 3),
    ("sw_ragged", scoring_system_sw_default, True, False, DNA, 13, 80, 48,
     3),
    ("nw_nsg", lambda: ScoringConfig(1, -2, -4, -1,
                                     no_start_gap_penalty=True),
     False, False, DNA, 10, 48, 48, 3),
    ("nw_ilv", scoring_system_default, False, False, DNA, 24, 32, 32, 2),
    ("sw_ilv", scoring_system_sw_default, True, False, DNA, 24, 32, 32, 2),
    ("nw_blosum", scoring_system_BLOSUM62, False, True, PROT, 10, 48, 48,
     3),
    ("sw_blosum", scoring_system_BLOSUM62, True, True, PROT, 10, 48, 48,
     3),
    ("nw_ab_short_a", scoring_system_default, False, False, DNA, 10, 17,
     48, 3),
    ("nw_zero_gaps", lambda: ScoringConfig(1, -1, 0, 0), False, False,
     DNA, 10, 48, 48, 3),
    ("sw_zero_gaps", lambda: ScoringConfig(2, -1, 0, 0), True, False,
     DNA, 10, 48, 48, 3),
    # round 4: free-END-gap mode on the chained kernel, incl. lengths
    # whose free column crosses into the next chunk's blocks (na+nb > W
    # — the rolling ncv plane regression) and nsg+neg combined
    ("nw_neg", lambda: ScoringConfig(1, -2, -4, -1,
                                     no_end_gap_penalty=True),
     False, False, DNA, 10, 56, 60, 2),
    ("nw_neg_lut", lambda: dataclasses.replace(
        scoring_system_BLOSUM62(), no_end_gap_penalty=True),
     False, True, PROT, 8, 56, 60, 2),
    ("nw_neg_nsg", lambda: ScoringConfig(1, -2, -4, -1,
                                         no_end_gap_penalty=True,
                                         no_start_gap_penalty=True),
     False, False, DNA, 10, 56, 60, 3),
    # round 4: constrained modes on the chained kernel (NW)
    ("nw_nga", lambda: ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True),
     False, False, DNA, 10, 56, 60, 2),
    ("nw_ngb", lambda: ScoringConfig(1, -2, -4, -1, no_gaps_in_b=True),
     False, False, DNA, 10, 56, 60, 2),
    ("nw_nmm", lambda: ScoringConfig(1, -2, -4, -1, no_mismatches=True),
     False, False, DNA, 10, 48, 48, 3),
    ("sw_nmm", lambda: ScoringConfig(2, -2, -4, -1, no_mismatches=True),
     True, False, DNA, 10, 48, 48, 3),
    ("nw_nga_neg", lambda: ScoringConfig(1, -2, -4, -1,
                                         no_gaps_in_a=True,
                                         no_end_gap_penalty=True),
     False, False, DNA, 8, 56, 60, 2),
    # round 5: SW constrained modes on the chained scores kernel (the
    # v2 dirs kernel keeps them NW-only) — same chunk-crossing lengths
    # as the NW round-4 cases
    ("sw_neg", lambda: ScoringConfig(2, -2, -4, -1,
                                     no_end_gap_penalty=True),
     True, False, DNA, 10, 56, 60, 2),
    ("sw_nga", lambda: ScoringConfig(2, -2, -4, -1, no_gaps_in_a=True),
     True, False, DNA, 10, 56, 60, 2),
    ("sw_ngb", lambda: ScoringConfig(2, -2, -4, -1, no_gaps_in_b=True),
     True, False, DNA, 10, 56, 60, 2),
    ("sw_neg_lut", lambda: dataclasses.replace(
        scoring_system_BLOSUM62(), no_end_gap_penalty=True),
     True, True, PROT, 8, 56, 60, 2),
    ("sw_nga_neg", lambda: ScoringConfig(2, -2, -4, -1,
                                         no_gaps_in_a=True,
                                         no_end_gap_penalty=True),
     True, False, DNA, 8, 56, 60, 2),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_v2_scores_vs_xla(case):
    name, scf, is_sw, lut, alpha, B, LA, LB, chain = case
    sc = scf()
    lutarr = np.frombuffer(alpha, dtype=np.uint8)
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    seqs_a, seqs_b = [], []
    for _ in range(B):
        la = int(rng.integers(1, LA + 1))
        lb = int(rng.integers(1, LB + 1))
        seqs_a.append(
            bytes(lutarr[rng.integers(0, len(lutarr), la)]).decode())
        seqs_b.append(
            bytes(lutarr[rng.integers(0, len(lutarr), lb)]).decode())
    a, na = dp.pad_batch(seqs_a, pad_to=LA)
    b, nb = dp.pad_batch(seqs_b, pad_to=LB)
    if lut:
        ac, bc, subK, _ = dp.compact_inputs(sc, a, b)
        lut_np = lut2_eligible(sc, subK)
        assert lut_np > 0
        match = mismatch = None
        subj = jnp.asarray(subK)
    else:
        assert dp.mm_eligible(sc)
        ac, bc = dp.compact_inputs_mm(sc, a, b)
        lut_np = 0
        match, mismatch = np.int32(sc.match), np.int32(sc.mismatch)
        subj = None
    geo = chain_geometry(B, LA, LB, chain=chain, bs=8)
    assert f32_safe2(sc, LA, LB, geo["C"], geo["W"])
    got = np.asarray(pallas_scores2(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
        jnp.asarray(nb), np.int32(sc.gap_open), np.int32(sc.gap_extend),
        is_sw=is_sw, match=match, mismatch=mismatch, subK=subj,
        interpret=True, chain=chain, bs=8,
        nsg=sc.no_start_gap_penalty, neg=sc.no_end_gap_penalty,
        nga=sc.no_gaps_in_a, ngb=sc.no_gaps_in_b,
        nmm=sc.no_mismatches, lut_np=lut_np))
    out, _, _ = dp.fill_batch(sc, seqs_a, seqs_b, is_sw=is_sw,
                              emit_dirs=False, pow2_pad=True,
                              validate=False)
    want = (np.asarray(out.best) if is_sw
            else np.asarray(out.corner).max(axis=1))
    np.testing.assert_array_equal(got, want)


def test_v2_gate_rejects_unsupported_modes():
    from seqalign_tpu.aligners import _v2_scores_eligible

    neg = ScoringConfig(1, -2, -4, -1, no_end_gap_penalty=True)
    # round 5: free END gaps ride the v2 SCORES kernel for both NW and
    # SW; the v2 DIRS kernel keeps SW constrained modes on v1
    assert _v2_scores_eligible(neg, True, None, 128, 128) == 0
    assert _v2_scores_eligible(neg, True, None, 128, 128,
                               is_sw=True) == 0
    assert _v2_scores_eligible(neg, True, None, 128, 128,
                               is_sw=True, dirs=True) is None
    pos = ScoringConfig(2, -3, 1, -1)  # gap_open > 0: G-fold invalid
    assert _v2_scores_eligible(pos, True, None, 128, 128) is None
    # round 4: single no-gaps flags ride v2 (NW); the BOTH-flags combo
    # stays on the int32 paths (sentinel-wrap parity)
    nga = ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True)
    assert _v2_scores_eligible(nga, True, None, 128, 128) == 0
    both = ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True,
                         no_gaps_in_b=True)
    assert _v2_scores_eligible(both, True, None, 128, 128) is None
    nmm = ScoringConfig(1, -2, -4, -1, no_mismatches=True)
    assert _v2_scores_eligible(nmm, True, None, 128, 128) == 0
    assert _v2_scores_eligible(nmm, False, np.zeros((8, 8), np.int32),
                               128, 128) is None
    ok = scoring_system_default()
    assert _v2_scores_eligible(ok, True, None, 128, 128) == 0
    # large-alphabet matrix -> packed planes
    b62 = scoring_system_BLOSUM62()
    a, _ = dp.pad_batch(["ARND"], pad_to=8)
    _, _, subK, _ = dp.compact_inputs(b62, a, a)
    lp = _v2_scores_eligible(b62, False, subK, 128, 128)
    assert lp and lp * 4 >= subK.shape[0]


def test_v2_via_aligners_dispatch(monkeypatch):
    """The library dispatch routes eligible device batches through v2
    (interpret mode) and stays bit-identical."""
    from seqalign_tpu import aligners

    monkeypatch.setenv("SEQALIGN_PALLAS", "interpret")
    monkeypatch.setenv("SEQALIGN_FORCE", "device")
    monkeypatch.setenv("SEQALIGN_PALLAS_FLOOR", "16")
    rng = np.random.default_rng(5)
    lutarr = np.frombuffer(DNA, dtype=np.uint8)
    seqs = [bytes(lutarr[rng.integers(0, 4, rng.integers(1, 33))]).decode()
            for _ in range(24)]
    nw = aligners.NeedlemanWunsch()
    got = nw.score_batch(seqs[:12], seqs[12:])
    monkeypatch.setenv("SEQALIGN_V2", "off")
    want = nw.score_batch(seqs[:12], seqs[12:])
    np.testing.assert_array_equal(got, want)


DIRS_CASES = [
    ("d_nw_c3", scoring_system_default, False, False, DNA, 9, 40, 40, 3),
    ("d_sw_c3", scoring_system_sw_default, True, False, DNA, 9, 40, 40, 3),
    ("d_nw_ilv", scoring_system_default, False, False, DNA, 16, 24, 24, 2),
    ("d_sw_ilv", scoring_system_sw_default, True, False, DNA, 16, 24, 24,
     2),
    ("d_nw_blosum", scoring_system_BLOSUM62, False, True, PROT, 6, 40, 40,
     3),
    ("d_sw_blosum", scoring_system_BLOSUM62, True, True, PROT, 6, 40, 40,
     3),
    ("d_nw_nsg", lambda: ScoringConfig(1, -2, -4, -1,
                                       no_start_gap_penalty=True),
     False, False, DNA, 8, 40, 40, 3),
    ("d_nw_neg", lambda: ScoringConfig(1, -2, -4, -1,
                                       no_end_gap_penalty=True),
     False, False, DNA, 8, 56, 60, 2),
    ("d_nw_neg_nsg", lambda: ScoringConfig(1, -2, -4, -1,
                                           no_end_gap_penalty=True,
                                           no_start_gap_penalty=True),
     False, False, DNA, 8, 56, 60, 3),
    ("d_nw_nga", lambda: ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True),
     False, False, DNA, 7, 56, 60, 2),
    ("d_nw_ngb", lambda: ScoringConfig(1, -2, -4, -1, no_gaps_in_b=True),
     False, False, DNA, 7, 56, 60, 2),
    # nmm rides the v2 dirs kernel via _v2_scores_eligible (inline
    # equality scoring): cover the chunk-transition/band-crossing shapes
    # the other round-4 modes use (ADVICE round 4)
    ("d_nw_nmm", lambda: ScoringConfig(1, -2, -4, -1, no_mismatches=True),
     False, False, DNA, 8, 56, 60, 2),
    ("d_sw_nmm", lambda: ScoringConfig(2, -2, -2, -1, no_mismatches=True),
     True, False, DNA, 8, 56, 60, 2),
]


@pytest.mark.parametrize("case", DIRS_CASES, ids=[c[0] for c in DIRS_CASES])
def test_v2_dirs_end_to_end(case):
    """Chained dirs kernel: NW traceback strings and SW hit streams must
    reproduce the host path exactly (codes, corners, M planes)."""
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.ops.pallas_dp2 import (
        pallas_fill_dirs2, pair_planes_device2, unpack_pair_plane2,
    )
    from seqalign_tpu.ops.traceback import SwHitIterator, nw_traceback

    name, scf, is_sw, lut, alpha, B, LA, LB, chain = case
    sc = scf()
    lutarr = np.frombuffer(alpha, dtype=np.uint8)
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    seqs_a, seqs_b = [], []
    for _ in range(B):
        la = int(rng.integers(1, LA + 1))
        lb = int(rng.integers(1, LB + 1))
        seqs_a.append(
            bytes(lutarr[rng.integers(0, len(lutarr), la)]).decode())
        seqs_b.append(
            bytes(lutarr[rng.integers(0, len(lutarr), lb)]).decode())
    a, na = dp.pad_batch(seqs_a, pad_to=LA)
    b, nb = dp.pad_batch(seqs_b, pad_to=LB)
    if lut:
        ac, bc, subK, _ = dp.compact_inputs(sc, a, b)
        lut_np = lut2_eligible(sc, subK)
        assert lut_np > 0
        match = mismatch = None
        subj = jnp.asarray(subK)
    else:
        ac, bc = dp.compact_inputs_mm(sc, a, b)
        lut_np = 0
        match, mismatch = np.int32(sc.match), np.int32(sc.mismatch)
        subj = None
    geo = chain_geometry(B, LA, LB, chain=chain, bs=8, state_bytes=140)
    dirs, mdev, corner = pallas_fill_dirs2(
        jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
        jnp.asarray(nb), np.int32(sc.gap_open), np.int32(sc.gap_extend),
        is_sw=is_sw, emit_m=is_sw, match=match, mismatch=mismatch,
        subK=subj, interpret=True, chain=chain, bs=8,
        nsg=sc.no_start_gap_penalty, neg=sc.no_end_gap_penalty,
        nga=sc.no_gaps_in_a, ngb=sc.no_gaps_in_b,
        nmm=sc.no_mismatches, lut_np=lut_np)
    dirs_np = np.asarray(dirs)
    if is_sw:
        mnp = np.asarray(pair_planes_device2(mdev, geo, LA, LB, B))
        for j in range(B):
            pl2 = unpack_pair_plane2(dirs_np, j, geo, LA, LB)
            got = [(h.result_a, h.result_b, h.score, h.pos_a, h.pos_b)
                   for h in SwHitIterator(sc, seqs_a[j], seqs_b[j],
                                          int(na[j]), int(nb[j]), pl2,
                                          mnp[j])]
            want = [(h.result_a, h.result_b, h.score, h.pos_a, h.pos_b)
                    for h in host_dp.HostSwHits(sc, seqs_a[j], seqs_b[j])]
            assert got == want, (name, j)
    else:
        cn = np.asarray(corner)
        for j in range(B):
            pl2 = unpack_pair_plane2(dirs_np, j, geo, LA, LB)
            aln = nw_traceback(seqs_a[j], seqs_b[j], int(na[j]),
                               int(nb[j]), pl2, cn[j])
            want = host_dp.nw_align(sc, seqs_a[j], seqs_b[j])
            assert (aln.result_a, aln.result_b, aln.score) == (
                want.result_a, want.result_b, want.score), (name, j)


def test_lut2_planes_non_pow2():
    """Round 5: plane counts are ceil(Ka/4) (non-pow2 trees pass the odd
    node through) — BLOSUM's 24 letters take 6 planes, not 8."""
    from seqalign_tpu.ops.pallas_dp2 import lut2_planes

    assert [lut2_planes(k) for k in (1, 4, 5, 8, 16, 17, 20, 24, 32)] \
        == [1, 1, 2, 2, 4, 5, 5, 6, 8]
    assert lut2_planes(33) == 0


def test_m16_safe_gate():
    """int16 SW M emission only when the best possible score fits."""
    from seqalign_tpu.ops.pallas_dp2 import m16_safe

    sc = ScoringConfig(2, -2, -4, -1)
    assert m16_safe(sc, 512, 512)
    assert not m16_safe(sc, 20000, 20000)


def test_sw_m16_planes_bit_exact():
    """SW dirs with int16 M emission matches the int32 emission exactly
    (interpret mode; the kernel-level analogue of the on-chip A/B)."""
    from seqalign_tpu.ops.pallas_dp2 import (
        chain_geometry, pallas_fill_dirs2, pair_planes_device2,
    )
    from seqalign_tpu.scoring.presets import scoring_system_sw_default

    sc = scoring_system_sw_default()
    rng = np.random.default_rng(77)
    lutarr = np.frombuffer(DNA, dtype=np.uint8)
    seqs = [bytes(lutarr[rng.integers(0, 4, int(n))]).decode()
            for n in rng.integers(10, 48, 8)]
    a, na = dp.pad_batch(seqs, pad_to=48)
    ac, bc = dp.compact_inputs_mm(sc, a, a)
    outs = {}
    for m16 in (False, True):
        d, mdev, _ = pallas_fill_dirs2(
            jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
            jnp.asarray(na), np.int32(sc.gap_open),
            np.int32(sc.gap_extend), is_sw=True, emit_m=True,
            m_i16=m16, match=np.int32(sc.match),
            mismatch=np.int32(sc.mismatch), interpret=True, chain=2,
            bs=8)
        geo = chain_geometry(8, 48, 48, chain=2, bs=8, state_bytes=140)
        outs[m16] = (np.asarray(d),
                     np.asarray(pair_planes_device2(mdev, geo, 48, 48,
                                                    8)))
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    assert outs[True][1].dtype == np.int32  # consumers see int32
