#!/usr/bin/env python3
"""Measure the 1-10kb NW alignment path stage by stage on the real chip.

For each padded shape: fill (dirs kernel or XLA), device walk, host
strings — so round-5 long-pair work attacks the right stage.  Usage:
  python tools/exp_align_long.py [pairs_per_shape]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA = np.frombuffer(b"acgt", dtype=np.uint8)


def mk(rng, n):
    return ALPHA[rng.integers(0, 4, n)].tobytes().decode()


def main():
    nper = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(7)
    from seqalign_tpu.aligners import (
        NeedlemanWunsch, pallas_dispatch_counts,
    )
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    nw = NeedlemanWunsch(sc)
    for la, lb in ((3000, 2800), (5000, 4800), (8000, 7800),
                   (10000, 9500)):
        ga = [mk(rng, la) for _ in range(nper)]
        gb = [mk(rng, lb) for _ in range(nper)]
        # warm the compile for the shape
        t0 = time.perf_counter()
        r0 = nw.align_batch(ga[:1], gb[:1])
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = nw.align_batch(ga, gb)
        wall = time.perf_counter() - t0
        cells = nper * la * lb
        print("L=%dx%d n=%d cold1=%.1fs warm=%.2fs %.2f GCUPS "
              "(%.2f s/pair) score0=%d disp=%s" % (
                  la, lb, nper, t_cold, wall, cells / wall / 1e9,
                  wall / nper, res[0].score, pallas_dispatch_counts()),
              flush=True)


if __name__ == "__main__":
    main()
