#!/usr/bin/env python3
"""Split long-pair NW align cost into fill / walk / strings on the real
chip (guides the round-5 long-pair work).  Forced fetches after each
stage make the tunnel's lazy dispatch visible."""
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
    la, lb = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 \
        else (3000, 2800)
    rng = np.random.default_rng(7)
    from seqalign_tpu import aligners
    from seqalign_tpu.ops.traceback import (
        nw_strings_from_ops, nw_walk_device,
    )
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()

    for rep in range(3):
        # fresh data per rep: the dev tunnel caches identical dispatches,
        # so repeating the same inputs would time the cache, not the chip
        ga = [mk(rng, la) for _ in range(nper)]
        gb = [mk(rng, lb) for _ in range(nper)]
        t0 = time.perf_counter()
        fast = aligners._pallas_dirs_fill(sc, ga, gb, is_sw=False)
        assert fast is not None, "expected the pallas dirs path"
        planes, _, corner, na, nb, geo = fast
        dirs_dev, gather = planes.device_walk
        # force the fill (fetch one byte)
        _ = np.asarray(dirs_dev[0, 0, 0, 0])
        t1 = time.perf_counter()
        cap = int(np.max(np.asarray(na) + np.asarray(nb)))
        ops, score = nw_walk_device(
            dirs_dev, gather, getattr(planes, "corner_dev", corner),
            na, nb, cap)
        t2 = time.perf_counter()
        alns = nw_strings_from_ops(ga, gb, na, nb, ops, score)
        t3 = time.perf_counter()
        cells = nper * la * lb
        print("rep%d L=%dx%d n=%d fill=%.3fs (%.1f GCUPS) walk=%.3fs "
              "(%.0f us/step, cap=%d) strings=%.3fs score0=%d" % (
                  rep, la, lb, nper, t1 - t0, cells / (t1 - t0) / 1e9,
                  t2 - t1, (t2 - t1) / cap * 1e6, cap, t3 - t2,
                  alns[0].score), flush=True)


if __name__ == "__main__":
    main()
