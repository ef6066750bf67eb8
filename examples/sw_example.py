#!/usr/bin/env python3
"""Library embedding example — equivalent of the reference's
examples/sw_example.c: the smith_waterman_fetch hit loop
(sw_example.c:56-63)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqalign_tpu import ScoringConfig, SmithWaterman

sc = ScoringConfig(2, -2, -2, -1)
sw = SmithWaterman(sc)

hits = sw.align("CAGACGTTTACGGACGT", "CGATAACGTTGG")
while True:
    hit = hits.fetch()  # best-first, overlap-masked (smith_waterman.c:260)
    if hit is None or hit.score < 4:
        break
    print(f"score {hit.score}: {hit.result_a} / {hit.result_b} "
          f"@({hit.pos_a},{hit.pos_b})")
