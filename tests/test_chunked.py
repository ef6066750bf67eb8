"""Chunked (long-sequence) fill must agree exactly with the one-shot fill:
same corner/best scores, identical traceback strings, identical SW hit
streams — across chunk sizes that do and don't divide the sequence."""

import numpy as np
import pytest

from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman
from seqalign_tpu.scoring.config import ScoringConfig
from seqalign_tpu.scoring.presets import (
    scoring_system_default,
    scoring_system_sw_default,
)


def _rand_seq(rng, n):
    return "".join(rng.choice(list("acgt"), n))


@pytest.mark.parametrize("chunk", [16, 50])
@pytest.mark.parametrize("la,lb", [(120, 40), (37, 90), (100, 100)])
def test_chunked_nw_matches_oneshot(chunk, la, lb):
    rng = np.random.default_rng(la * 7 + lb + chunk)
    a, b = _rand_seq(rng, la), _rand_seq(rng, lb)
    nw = NeedlemanWunsch(scoring_system_default())
    one = nw.align(a, b)
    chk = nw.align_long(a, b, chunk=chunk)
    assert (chk.result_a, chk.result_b, chk.score) == \
        (one.result_a, one.result_b, one.score)


@pytest.mark.parametrize("flags", [
    dict(no_start_gap_penalty=True, no_end_gap_penalty=True),
    dict(no_gaps_in_a=True),
    dict(no_mismatches=True),
])
def test_chunked_nw_flag_modes(flags):
    rng = np.random.default_rng(5)
    a, b = _rand_seq(rng, 70), _rand_seq(rng, 45)
    sc = ScoringConfig(1, -2, -4, -1, **flags)
    nw = NeedlemanWunsch(sc)
    one = nw.align(a, b)
    chk = nw.align_long(a, b, chunk=24)
    assert (chk.result_a, chk.result_b, chk.score) == \
        (one.result_a, one.result_b, one.score)


@pytest.mark.parametrize("chunk", [16, 48])
def test_chunked_sw_matches_oneshot(chunk):
    rng = np.random.default_rng(11)
    a, b = _rand_seq(rng, 90), _rand_seq(rng, 60)
    sw = SmithWaterman(scoring_system_sw_default())
    one = [
        (h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
        for h in sw.align(a, b)
    ]
    chk = [
        (h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
        for h in sw.align_long(a, b, chunk=chunk)
    ]
    assert chk == one


def test_auto_long_routing(monkeypatch):
    """Pairs over LONG_PAIR_CELLS transparently route through align_long."""
    import seqalign_tpu.aligners as al

    monkeypatch.setattr(al, "LONG_PAIR_CELLS", 2000)
    rng = np.random.default_rng(3)
    a_long, b_long = _rand_seq(rng, 80), _rand_seq(rng, 60)  # 4800 > 2000
    a_s, b_s = _rand_seq(rng, 20), _rand_seq(rng, 25)
    nw = NeedlemanWunsch(scoring_system_default())
    got = nw.align_batch([a_long, a_s], [b_long, b_s])
    monkeypatch.setattr(al, "LONG_PAIR_CELLS", 64_000_000)
    want = nw.align_batch([a_long, a_s], [b_long, b_s])
    assert [(g.result_a, g.result_b, g.score) for g in got] == \
        [(w.result_a, w.result_b, w.score) for w in want]
