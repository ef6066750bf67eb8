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
