"""The JAX wavefront fill + direction-code traceback must reproduce the
reference C library bit-for-bit on the full golden corpus — same contract as
the numpy oracle, but through the real device path (batched, padded shapes).

Cases sharing a scoring config are aligned in one batched fill to exercise
ragged batching; shapes are padded to fixed sizes so the whole corpus
compiles only one program per static flag combination.
"""

import numpy as np
import pytest

from seqalign_tpu.ops import dp
from seqalign_tpu.ops.traceback import SwHitIterator, nw_traceback
from golden_util import load_golden

CASES = load_golden()

PAD = 64
PAD_B = 8  # fixed batch size per fill


def _config_key(case):
    sc = case.scoring
    return (
        sc.match, sc.mismatch, sc.gap_open, sc.gap_extend,
        sc.no_start_gap_penalty, sc.no_end_gap_penalty, sc.no_gaps_in_a,
        sc.no_gaps_in_b, sc.no_mismatches, sc.case_sensitive,
        sc.use_match_mismatch,
        sc._swap_set.tobytes(), sc._swap_scores.tobytes(),
        sc._wild_set.tobytes(), sc._wild_scores.tobytes(),
        case.mode in ("sw", "swmat"),
    )


def _groups():
    groups = {}
    for i, c in enumerate(CASES):
        groups.setdefault(_config_key(c), []).append((i, c))
    return list(groups.values())


@pytest.mark.parametrize("group", _groups(), ids=lambda g: f"g{g[0][0]}x{len(g)}")
def test_device_path_matches_reference(group):
    sc = group[0][1].scoring
    is_sw = group[0][1].mode in ("sw", "swmat")
    for start in range(0, len(group), PAD_B):
        chunk = [c for _, c in group[start : start + PAD_B]]
        seqs_a = [c.seq_a for c in chunk] + ["a"] * (PAD_B - len(chunk))
        seqs_b = [c.seq_b for c in chunk] + ["a"] * (PAD_B - len(chunk))
        out, na, nb = dp.fill_batch(
            sc, seqs_a, seqs_b, is_sw=is_sw, emit_dirs=True, emit_m=True,
            emit_gab=True, pad_a=PAD, pad_b=PAD,
        )
        dirs = np.asarray(out.dirs)
        mmat = np.asarray(out.mmat)
        corner = np.asarray(out.corner)
        best = np.asarray(out.best)
        for i, case in enumerate(chunk):
            if not is_sw:
                aln = nw_traceback(
                    case.seq_a, case.seq_b, na[i], nb[i], dirs[i], corner[i]
                )
                assert (aln.result_a, aln.result_b, aln.score) == case.nw
            else:
                it = SwHitIterator(
                    sc, case.seq_a, case.seq_b, na[i], nb[i], dirs[i], mmat[i]
                )
                got = []
                while True:
                    h = it.fetch()
                    if h is None:
                        break
                    if case.min_score is not None and h.score < case.min_score:
                        break
                    got.append(
                        (h.score, h.pos_a, h.pos_b, h.len_a, h.len_b,
                         h.result_a, h.result_b)
                    )
                    if case.max_hits is not None and len(got) >= case.max_hits:
                        break
                want = [
                    (h["score"], h["pos_a"], h["pos_b"], h["len_a"], h["len_b"],
                     h["result_a"], h["result_b"])
                    for h in case.sw_hits
                ]
                assert got == want
                if got:
                    assert best[i] == got[0][0]
            if case.matrices:
                M = dp.deskew(mmat[i], int(na[i]), int(nb[i]),
                              fill=sc.dp_floor(is_sw))
                np.testing.assert_array_equal(
                    M[1:, 1:], case.matrices["match"][1:, 1:]
                )
                if "gap_a" in case.matrices:
                    Ga = dp.deskew(np.asarray(out.gamat)[i], int(na[i]),
                                   int(nb[i]), fill=sc.dp_floor(is_sw))
                    Gb = dp.deskew(np.asarray(out.gbmat)[i], int(na[i]),
                                   int(nb[i]), fill=sc.dp_floor(is_sw))
                    np.testing.assert_array_equal(
                        Ga[1:, 1:], case.matrices["gap_a"][1:, 1:]
                    )
                    np.testing.assert_array_equal(
                        Gb[1:, 1:], case.matrices["gap_b"][1:, 1:]
                    )
