"""Named ports of the reference's own unit suite (src/tools/tests.c) —
already covered implicitly by the golden corpus, made explicit here so
parity with SURVEY.md §4 is auditable test-by-test."""

import numpy as np

from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman
from seqalign_tpu.scoring.config import ScoringConfig


def test_nw_test_no_gaps_in_longer():
    """tests.c:65-98 — no_gaps_in_a with the end-gap exception."""
    sc = ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True)
    r = NeedlemanWunsch(sc).align("aaaaacg", "acgt")
    assert (r.result_a, r.result_b) == ("aaaaacg-", "a----cgt")


def test_nw_test_free_gaps_at_ends():
    """tests.c:102-131 — free start+end gaps."""
    sc = ScoringConfig(1, -1, -4, -1, no_start_gap_penalty=True,
                       no_end_gap_penalty=True)
    r = NeedlemanWunsch(sc).align("acg", "tttacgttt")
    assert (r.result_a, r.result_b) == ("---acg---", "tttacgttt")
    assert r.score == 3


def test_nw_test_no_mismatches():
    """tests.c:133-163 — no_mismatches forces gap-only edits."""
    sc = ScoringConfig(1, -2, -4, -1, no_mismatches=True)
    r = NeedlemanWunsch(sc).align("atc", "ac")
    assert (r.result_a, r.result_b) == ("atc", "a-c")
    r = NeedlemanWunsch(sc).align("cgatcga", "catcctcga")
    assert (r.result_a, r.result_b) == ("cgatc---ga", "c-atcctcga")


def test_nw_test_no_mismatches_rand():
    """tests.c:176-218 — property: every aligned column is gap or equal."""
    sc = ScoringConfig(1, -2, -4, -1, no_mismatches=True)
    nw = NeedlemanWunsch(sc)
    rng = np.random.default_rng(20260816)
    seqs_a, seqs_b = [], []
    for _ in range(50):
        la, lb = rng.integers(1, 99, 2)
        seqs_a.append("".join(rng.choice(list("acgt"), la)))
        seqs_b.append("".join(rng.choice(list("acgt"), lb)))
    for r in nw.align_batch(seqs_a, seqs_b):
        for ca, cb in zip(r.result_a, r.result_b):
            assert ca == "-" or cb == "-" or ca == cb


def test_sw_test_no_gaps_smith_waterman():
    """tests.c:233-268 — multi-hit ordering under no_gaps: score-desc +
    leftmost tie-break + overlap masking."""
    sc = ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True, no_gaps_in_b=True,
                       case_sensitive=True)
    hits = SmithWaterman(sc).align("gacag", "tgaagt")
    h1 = hits.fetch()
    assert (h1.result_a, h1.result_b) == ("ga", "ga")
    h2 = hits.fetch()
    assert (h2.result_a, h2.result_b) == ("ag", "ag")
