"""Parse the committed golden fixtures (tests/golden/{cases,golden}.tsv)
produced by tools/gen_golden.py from the reference C library."""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from seqalign_tpu.scoring.config import ScoringConfig
from seqalign_tpu.scoring.presets import (
    scoring_system_BLOSUM62,
    scoring_system_BLOSUM80,
    scoring_system_DNA_hybridization,
    scoring_system_PAM30,
    scoring_system_PAM70,
)

# SEQALIGN_GOLDEN_DIR points the golden tests at a freshly-generated soak
# corpus (tools/gen_golden.py <seed> <dir>) instead of the committed one
GOLD = os.environ.get("SEQALIGN_GOLDEN_DIR") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden")

_PRESETS = {
    "PAM30": scoring_system_PAM30,
    "PAM70": scoring_system_PAM70,
    "BLOSUM80": scoring_system_BLOSUM80,
    "BLOSUM62": scoring_system_BLOSUM62,
    "DNAHYB": scoring_system_DNA_hybridization,
}


@dataclasses.dataclass
class GoldenCase:
    mode: str
    scoring: ScoringConfig
    seq_a: str
    seq_b: str
    min_score: int | None
    max_hits: int | None
    nw: tuple[str, str, int] | None = None  # (aligned_a, aligned_b, score)
    sw_hits: list | None = None  # list of dicts
    matrices: dict | None = None  # name -> np.ndarray (h, w)


def _build_case(line: str) -> GoldenCase:
    toks = line.split()
    mode, m, mm, go, ge, flags, seqa, seqb = toks[:8]
    m, mm, go, ge = int(m), int(mm), int(go), int(ge)
    fl = [c == "1" for c in flags]
    sc = ScoringConfig(m, mm, go, ge, *fl)
    seq_a = "" if seqa == "." else seqa
    seq_b = "" if seqb == "." else seqb
    min_score = None
    max_hits = None
    i = 8
    while i < len(toks):
        t = toks[i]
        if t == "W":
            sc.add_wildcard(toks[i + 1], int(toks[i + 2]))
            i += 3
        elif t == "S":
            sc.add_mutation(toks[i + 1], toks[i + 2], int(toks[i + 3]))
            i += 4
        elif t == "U":
            sc.use_match_mismatch = bool(int(toks[i + 1]))
            sc._luts = None
            i += 2
        elif t == "P":
            preset = _PRESETS[toks[i + 1]]()
            # reference preset calls scoring_init, replacing everything
            sc = preset
            i += 2
        elif t == "L":
            min_score = int(toks[i + 1])
            i += 2
        elif t == "H":
            max_hits = int(toks[i + 1])
            i += 2
        else:
            raise ValueError(f"bad extra token {t} in: {line}")
    return GoldenCase(mode, sc, seq_a, seq_b, min_score, max_hits)


def load_golden():
    with open(os.path.join(GOLD, "cases.tsv")) as fh:
        cases = [_build_case(l) for l in fh if l.strip()]
    with open(os.path.join(GOLD, "golden.tsv")) as fh:
        out_lines = [l.rstrip("\n") for l in fh]

    it = iter(out_lines)
    for case in cases:
        matrices = {}
        if case.mode in ("nw", "mat"):
            line = next(it)
            while line.startswith("MATRIX"):
                p = line.split("\t")
                name, w, h = p[1], int(p[2]), int(p[3])
                matrices[name] = np.array(p[4:], dtype=np.int64).reshape(h, w)
                line = next(it)
            tag, score, ra, rb = line.split("\t")
            assert tag == "NW", line
            case.nw = (
                "" if ra == "." else ra,
                "" if rb == "." else rb,
                int(score),
            )
        else:  # sw / swmat
            hits = []
            line = next(it)
            while line.startswith("MATRIX"):
                p = line.split("\t")
                name, w, h = p[1], int(p[2]), int(p[3])
                matrices[name] = np.array(p[4:], dtype=np.int64).reshape(h, w)
                line = next(it)
            while line != "SWEND":
                tag, score, pa, pb, la, lb, ra, rb = line.split("\t")
                assert tag == "SWHIT", line
                hits.append(
                    dict(
                        score=int(score),
                        pos_a=int(pa),
                        pos_b=int(pb),
                        len_a=int(la),
                        len_b=int(lb),
                        result_a=ra,
                        result_b=rb,
                    )
                )
                line = next(it)
            case.sw_hits = hits
        case.matrices = matrices or None
    try:
        next(it)
        raise AssertionError("golden.tsv has trailing lines")
    except StopIteration:
        pass
    return cases
