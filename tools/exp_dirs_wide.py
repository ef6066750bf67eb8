#!/usr/bin/env python3
"""Probe the v2 dirs kernel past the shipped 4096-lane envelope on the
real chip: compile time, fill+walk throughput, and correctness (scores
vs the library score path, alignment strings vs the JAX-free host DP).

Usage: SEQALIGN_DIRS2_LANES=10240 python tools/exp_dirs_wide.py 8
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
    sizes = [(5000, 4900), (6100, 6000), (8100, 8000), (10000, 9900)]
    if len(sys.argv) > 3:
        sizes = [(int(sys.argv[2]), int(sys.argv[3]))]
    rng = np.random.default_rng(11)
    from seqalign_tpu import aligners
    from seqalign_tpu.ops import host_dp
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    nw = aligners.NeedlemanWunsch(sc)
    for la, lb in sizes:
        ga = [mk(rng, la) for _ in range(nper)]
        gb = [mk(rng, lb) for _ in range(nper)]
        t0 = time.perf_counter()
        res = nw.align_batch(ga, gb)
        t_cold = time.perf_counter() - t0
        ga2 = [mk(rng, la) for _ in range(nper)]
        gb2 = [mk(rng, lb) for _ in range(nper)]
        t0 = time.perf_counter()
        res2 = nw.align_batch(ga2, gb2)
        wall = time.perf_counter() - t0
        d = aligners.pallas_dispatch_counts()
        # correctness: corner score vs the scores path on every pair,
        # full alignment parity vs the host DP on pair 0
        scores = nw.score_batch(ga2, gb2)
        assert all(int(r.score) == int(s) for r, s in zip(res2, scores)), \
            (la, lb, [(r.score, int(s)) for r, s in zip(res2, scores)][:4])
        href = host_dp.nw_align(sc, ga2[0], gb2[0])
        assert (res2[0].result_a, res2[0].result_b) == \
            (href.result_a, href.result_b), (la, lb, "alignment mismatch")
        cells = nper * la * lb
        print("L=%dx%d n=%d cold=%.1fs warm=%.2fs %.2f GCUPS "
              "(%.0f ms/pair) disp=%s parity=ok" % (
                  la, lb, nper, t_cold, wall, cells / wall / 1e9,
                  wall / nper * 1e3, d), flush=True)


if __name__ == "__main__":
    main()
