"""Sequence-parallel wavefront (lanes sharded over the mesh, per-diagonal
ppermute halo) must agree with single-device scoring."""

import numpy as np

from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman
from seqalign_tpu.parallel.engine import make_mesh
from seqalign_tpu.parallel.wavefront_sp import sp_scores
from seqalign_tpu.scoring.presets import (
    scoring_system_default,
    scoring_system_sw_default,
)


def _pairs(rng, n, lo=30, hi=200):
    out = []
    for _ in range(n):
        la, lb = rng.integers(lo, hi, 2)
        out.append(("".join(rng.choice(list("acgt"), la)),
                    "".join(rng.choice(list("acgt"), lb))))
    return out


def test_sp_nw_scores_match():
    rng = np.random.default_rng(21)
    pairs = _pairs(rng, 3)
    sc = scoring_system_default()
    mesh = make_mesh(8, axis="seq")
    got = sp_scores(sc, [a for a, _ in pairs], [b for _, b in pairs], mesh)
    want = NeedlemanWunsch(sc).score_batch([a for a, _ in pairs],
                                           [b for _, b in pairs])
    np.testing.assert_array_equal(got, want)


def test_sp_sw_best_match():
    rng = np.random.default_rng(22)
    pairs = _pairs(rng, 3)
    sc = scoring_system_sw_default()
    mesh = make_mesh(8, axis="seq")
    got = sp_scores(sc, [a for a, _ in pairs], [b for _, b in pairs], mesh,
                    is_sw=True)
    want = SmithWaterman(sc).best_score_batch([a for a, _ in pairs],
                                              [b for _, b in pairs])
    np.testing.assert_array_equal(got, want)


def test_sp_scores_unsupported_config_routes_to_engine():
    """Constrained configs must fall back to the batch engine instead of
    asserting (VERDICT round-2 weak item 7)."""
    import numpy as np

    from seqalign_tpu.aligners import NeedlemanWunsch
    from seqalign_tpu.parallel.engine import make_mesh
    from seqalign_tpu.parallel.wavefront_sp import sp_scores
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(1, -2, -4, -1, no_gaps_in_a=True)
    seqs_a = ["acgtacgt", "ttgcagca"]
    seqs_b = ["acgtt", "tggca"]
    got = sp_scores(sc, seqs_a, seqs_b, make_mesh(axis="seq"))
    want = NeedlemanWunsch(sc).score_batch(seqs_a, seqs_b)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_sp_align_nw_matches_align_long():
    """Sequence-parallel traceback: a single pair filled with the lane
    axis sharded across the mesh (ppermute halos, per-device dirs slices)
    must produce strings identical to align_long (VERDICT round-2 missing
    item 3 / SURVEY §5 long-context)."""
    import numpy as np

    from seqalign_tpu.aligners import NeedlemanWunsch
    from seqalign_tpu.parallel.engine import make_mesh
    from seqalign_tpu.parallel.wavefront_sp import sp_align_nw
    from seqalign_tpu.scoring.presets import scoring_system_default

    rng = np.random.default_rng(31)
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    sc = scoring_system_default()
    mesh = make_mesh(axis="seq")
    for la, lb, chunk in [(700, 640, 128), (65, 900, 256), (257, 63, 64)]:
        a = bytes(lut[rng.integers(0, 4, la)]).decode()
        b = bytes(lut[rng.integers(0, 4, lb)]).decode()
        got = sp_align_nw(sc, a, b, mesh, chunk=chunk)
        want = NeedlemanWunsch(sc).align_long(a, b, chunk=chunk)
        assert (got.result_a, got.result_b, got.score) == (
            want.result_a, want.result_b, want.score)


def test_sp_align_nw_ineligible_falls_back():
    from seqalign_tpu.parallel.engine import make_mesh
    from seqalign_tpu.parallel.wavefront_sp import sp_align_nw
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(1, -2, -4, -1, no_mismatches=True)
    aln = sp_align_nw(sc, "acgt", "agt", make_mesh(axis="seq"))
    assert aln.score is not None
