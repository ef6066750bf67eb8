"""The vectorized numpy host path (ops/host_dp.py) — the CLI latency path —
must reproduce the reference bit-for-bit on the full golden corpus, and the
aligner API must return identical results however a call is routed
(host / device; SEQALIGN_FORCE pins the route)."""

import os

import numpy as np
import pytest

from seqalign_tpu.ops import host_dp, oracle
from seqalign_tpu import aligners
from golden_util import load_golden

CASES = load_golden()


@pytest.mark.parametrize(
    "case", CASES, ids=[f"{i}-{c.mode}" for i, c in enumerate(CASES)]
)
def test_host_path_matches_reference(case):
    if case.mode in ("nw", "mat"):
        aln = host_dp.nw_align(case.scoring, case.seq_a, case.seq_b)
        assert (aln.result_a, aln.result_b, aln.score) == case.nw
        if case.matrices:
            M, Ga, Gb = host_dp.fill_matrices(
                case.scoring, case.seq_a, case.seq_b, is_sw=False
            )
            np.testing.assert_array_equal(M, case.matrices["match"])
            np.testing.assert_array_equal(Ga, case.matrices["gap_a"])
            np.testing.assert_array_equal(Gb, case.matrices["gap_b"])
    else:
        it = host_dp.HostSwHits(case.scoring, case.seq_a, case.seq_b)
        if case.matrices:
            np.testing.assert_array_equal(it.matrices[0],
                                          case.matrices["match"])
        got = []
        while case.max_hits is None or len(got) < case.max_hits:
            h = it.fetch()
            if h is None or (case.min_score is not None
                             and h.score < case.min_score):
                break
            got.append((h.score, h.pos_a, h.pos_b, h.len_a, h.len_b,
                        h.result_a, h.result_b))
        want = [
            (h["score"], h["pos_a"], h["pos_b"], h["len_a"], h["len_b"],
             h["result_a"], h["result_b"])
            for h in case.sw_hits
        ]
        assert got == want


def test_fast_fill_matches_spec_fill_fuzz():
    """Property check: the vectorized fill equals the per-cell spec fill on
    random sequences across every flag combination."""
    import random

    rng = random.Random(20260817)
    from seqalign_tpu.scoring.config import ScoringConfig

    for trial in range(120):
        na, nb = rng.randint(0, 14), rng.randint(0, 14)
        a = "".join(rng.choice("acgtn") for _ in range(na))
        b = "".join(rng.choice("acgtn") for _ in range(nb))
        sc = ScoringConfig(
            rng.randint(0, 3), rng.randint(-4, -1), rng.randint(-6, 0),
            rng.randint(-3, 0),
            no_start_gap_penalty=rng.random() < 0.25,
            no_end_gap_penalty=rng.random() < 0.25,
            no_gaps_in_a=rng.random() < 0.2,
            no_gaps_in_b=rng.random() < 0.2,
            no_mismatches=rng.random() < 0.2,
        )
        for is_sw in (False, True):
            ref = oracle.fill_matrices(sc, a, b, is_sw)
            fast = host_dp.fill_matrices(sc, a, b, is_sw)
            for r, f in zip(ref, fast):
                np.testing.assert_array_equal(r, f)


def test_route_forcing(monkeypatch):
    """Both routes give identical alignments through the public API."""
    nw = aligners.NeedlemanWunsch()
    sw = aligners.SmithWaterman()
    pairs = [("CAGACGT", "CGATA"), ("acgtacgtacgt", "tgcatgca"),
             ("aaaa", "aaaa")]
    results = {}
    for force in ("host", "device"):
        monkeypatch.setenv("SEQALIGN_FORCE", force)
        results[force] = {
            "nw": [(r.result_a, r.result_b, r.score)
                   for r in nw.align_batch(*zip(*pairs))],
            "nws": list(nw.score_batch(*zip(*pairs))),
            "sw": [
                [(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
                 for h in sw.align(a, b)]
                for a, b in pairs
            ],
            "sws": list(sw.best_score_batch(*zip(*pairs))),
        }
    assert results["host"] == results["device"]


def test_host_invalid_pair_message():
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(use_match_mismatch=False)
    with pytest.raises(ValueError, match="Unknown character pair"):
        host_dp.fill_matrices(sc, "ab", "cd", False)


def test_empty_sequences_host_and_device(monkeypatch):
    """Empty-seq edge cases (VERDICT round-1 corpus gap): NW with one or both
    sides empty must produce pure gap runs with the closed-form score."""
    nw = aligners.NeedlemanWunsch()
    for force in ("host", "device"):
        monkeypatch.setenv("SEQALIGN_FORCE", force)
        # scores verified against the reference binary:
        #   needleman_wunsch --printscores "" acg  ->  score: -7
        r = nw.align("", "acg")
        assert (r.result_a, r.result_b, r.score) == ("---", "acg", -7)
        r = nw.align("acg", "")
        assert (r.result_a, r.result_b, r.score) == ("acg", "---", -7)
        r = nw.align("", "")
        assert (r.result_a, r.result_b, r.score) == ("", "", 0)
