#!/usr/bin/env python3
"""V-scaling-fit timing for the v2 chained scores kernel on the real chip.

Usage: python tools/bench_kernel2.py --B 256 --L 512 [--sw] [--chain 4]
       [--bs 0] [--unroll 8] [--lut] [--sweep]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit(make_scan_fn, inputs_for, vs=(2, 34), reps=7):
    import jax.numpy as jnp

    res = {}
    for V in vs:
        fn = make_scan_fn(V)
        xs = inputs_for(V)
        np.asarray(fn(xs, jnp.int32(1)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(xs, jnp.int32(i + 2)))
            ts.append(time.perf_counter() - t0)
        res[V] = float(np.min(ts))
    return (res[vs[-1]] - res[vs[0]]) / (vs[-1] - vs[0])


def bench_one(B, L, *, sw, chain, bs, unroll, lut, interp, cf32=None):
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp2 import (
        chain_geometry, lut2_eligible, pallas_scores2,
    )
    from seqalign_tpu.scoring.presets import (
        scoring_system_BLOSUM62,
        scoring_system_default,
        scoring_system_sw_default,
    )

    if lut:
        sc = scoring_system_BLOSUM62()
        alpha = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    else:
        sc = scoring_system_sw_default() if sw else scoring_system_default()
        alpha = np.frombuffer(b"acgt", dtype=np.uint8)
    rng = np.random.default_rng(0)
    bseq = alpha[rng.integers(0, len(alpha), (B, L))]
    na = jnp.full((B,), L, jnp.int32)
    nb = jnp.full((B,), L, jnp.int32)
    if lut:
        _, bc, subK, _ = dp.compact_inputs(sc, bseq, bseq)
        lut_np = lut2_eligible(sc, subK)
        assert lut_np > 0
        subj = jnp.asarray(subK)
        match = mismatch = None
        ci = lambda aa: dp.compact_inputs(sc, aa, bseq)[0]  # noqa: E731
    else:
        _, bc = dp.compact_inputs_mm(sc, bseq, bseq)
        lut_np = 0
        subj = None
        match, mismatch = np.int32(sc.match), np.int32(sc.mismatch)
        ci = lambda aa: dp.compact_inputs_mm(sc, aa, bseq)[0]  # noqa: E731
    bcj = jnp.asarray(bc)
    geo = chain_geometry(B, L, L, K=unroll, chain=chain, bs=bs)

    def inputs_for(V):
        xs = np.stack([
            ci(alpha[np.random.default_rng(1000 + i).integers(
                0, len(alpha), (B, L))]) for i in range(V)])
        return jax.block_until_ready(jnp.asarray(xs))

    def make(V):
        @jax.jit
        def many(xs, salt):
            def body(carry, aa):
                s = pallas_scores2(
                    aa, bcj, na, nb, np.int32(sc.gap_open),
                    np.int32(sc.gap_extend), is_sw=sw, match=match,
                    mismatch=mismatch, subK=subj, interpret=interp,
                    unroll=unroll, bs=bs, chain=chain, lut_np=lut_np,
                    codes_f32=cf32)
                return carry + s.sum() * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    per = fit(make, inputs_for, vs=(2, 10) if interp else (2, 34))
    gcups = B * L * L / per / 1e9
    print("v2 B=%d L=%d sw=%s lut=%s chain=%d(C=%d W=%d BS=%d nB=%d) K=%d"
          " cf32=%s: per-fill %.6fs -> %.1f GCUPS"
          % (B, L, sw, lut, chain, geo["C"], geo["W"], geo["BS"],
             geo["nB"], unroll, cf32, per, gcups))
    return gcups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--sw", action="store_true")
    ap.add_argument("--lut", action="store_true")
    ap.add_argument("--chain", type=int, default=0)
    ap.add_argument("--bs", type=int, default=0)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--cf32", type=int, default=-1,
                    help="-1 auto, 0 int codes, 1 f32 codes")
    ap.add_argument("--matrix", action="store_true",
                    help="same-process A/B sweep (drift-safe)")
    args = ap.parse_args()
    import jax

    interp = jax.default_backend() == "cpu"
    if args.matrix:
        for (B, L, sw, chain) in [(256, 512, False, 2), (256, 512, False, 4),
                                  (256, 512, True, 2), (256, 128, False, 1),
                                  (256, 128, False, 2)]:
            for cf in (False, True):
                bench_one(B, L, sw=sw, chain=chain, bs=0, unroll=8,
                          lut=False, interp=interp, cf32=cf)
        return
    cf32 = None if args.cf32 < 0 else bool(args.cf32)
    bench_one(args.B, args.L, sw=args.sw, chain=args.chain, bs=args.bs,
              unroll=args.unroll, lut=args.lut, interp=interp, cf32=cf32)


if __name__ == "__main__":
    main()
