"""The numpy oracle must reproduce the reference C library bit-for-bit on the
committed golden corpus (497 cases spanning every flag/preset combination)."""

import numpy as np
import pytest

from seqalign_tpu.ops import oracle
from golden_util import load_golden

CASES = load_golden()


@pytest.mark.parametrize(
    "case", CASES, ids=[f"{i}-{c.mode}" for i, c in enumerate(CASES)]
)
def test_oracle_matches_reference(case):
    if case.mode in ("nw", "mat"):
        ra, rb, score = oracle.nw_align(case.scoring, case.seq_a, case.seq_b)
        assert (ra, rb, score) == case.nw
        if case.matrices:
            M, Ga, Gb = oracle.fill_matrices(
                case.scoring, case.seq_a, case.seq_b, is_sw=False
            )
            np.testing.assert_array_equal(M, case.matrices["match"])
            np.testing.assert_array_equal(Ga, case.matrices["gap_a"])
            np.testing.assert_array_equal(Gb, case.matrices["gap_b"])
    else:
        sw = oracle.SwOracle(case.scoring, case.seq_a, case.seq_b)
        if case.matrices:
            np.testing.assert_array_equal(sw.M, case.matrices["match"])
        hits = sw.hits(min_score=case.min_score, max_hits=case.max_hits)
        got = [
            (
                h["score"],
                h["pos_a"],
                h["pos_b"],
                h["len_a"],
                h["len_b"],
                h["result_a"],
                h["result_b"],
            )
            for h in hits
        ]
        want = [
            (
                h["score"],
                h["pos_a"],
                h["pos_b"],
                h["len_a"],
                h["len_b"],
                h["result_a"],
                h["result_b"],
            )
            for h in case.sw_hits
        ]
        assert got == want
