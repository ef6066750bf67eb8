#!/usr/bin/env python3
"""Probe the v2 chained scores kernel beyond the lb=4096 envelope.

The 1-10kb production regime (BASELINE.json configs[4]) canonicalizes
the shorter side onto lanes, so covering lb up to ~10240 puts nearly
every pair on the fast path.  This probe checks (a) bit-exactness vs
the XLA wavefront fill at wide/non-pow2 LBt, (b) V-scaling-fit GCUPS.

Usage: python tools/exp_long_scores.py [--lbs 5120,6144,8192,10240]
       [--la 10240] [--B 16] [--timing-only]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lbs", default="5120,6144,8192,10240")
    ap.add_argument("--la", type=int, default=10240)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--timing-only", action="store_true")
    ap.add_argument("--sw", action="store_true")
    ap.add_argument("--kernel", default="v2", choices=("v1", "v2"))
    ap.add_argument("--unroll", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seqalign_tpu.aligners import _pallas_bs
    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp import f32_safe, pallas_scores
    from seqalign_tpu.ops.pallas_dp2 import chain_geometry, pallas_scores2
    from seqalign_tpu.scoring.presets import (
        scoring_system_default, scoring_system_sw_default,
    )

    interp = jax.default_backend() == "cpu"
    sc = scoring_system_sw_default() if args.sw else scoring_system_default()
    alpha = np.frombuffer(b"acgt", dtype=np.uint8)
    rng = np.random.default_rng(7)

    for lbs in args.lbs.split(","):
        LBt = int(lbs)
        B, LA = args.B, args.la
        aseq = alpha[rng.integers(0, 4, (B, LA))]
        bseq = alpha[rng.integers(0, 4, (B, LBt))]
        # ragged real lengths inside the padded buckets
        na = rng.integers(max(1, LA - 900), LA + 1, B).astype(np.int32)
        nb = rng.integers(max(1, LBt - 900), LBt + 1, B).astype(np.int32)
        am = aseq.copy()
        bm = bseq.copy()
        for i in range(B):
            am[i, na[i]:] = 0
            bm[i, nb[i]:] = 0
        ac, bc = dp.compact_inputs_mm(sc, am, bm)
        geo = chain_geometry(B, LA, LBt)
        bs1 = _pallas_bs(B, LBt)

        def run(aa):
            if args.kernel == "v2":
                return pallas_scores2(
                    aa, jnp.asarray(bc), jnp.asarray(na),
                    jnp.asarray(nb), np.int32(sc.gap_open),
                    np.int32(sc.gap_extend), is_sw=args.sw,
                    match=np.int32(sc.match),
                    mismatch=np.int32(sc.mismatch),
                    unroll=args.unroll or 16, interpret=interp)
            return pallas_scores(
                aa, jnp.asarray(bc), jnp.asarray(na), jnp.asarray(nb),
                jnp.asarray(np.zeros((8, 8), np.int32)),
                jnp.asarray(np.zeros((8, 8), np.int32)),
                np.int32(sc.gap_open), np.int32(sc.gap_extend),
                np.int32(sc.dp_floor(args.sw)), is_sw=args.sw,
                use_f32=f32_safe(sc, LA, LBt), inline_mm=True,
                match=np.int32(sc.match), mismatch=np.int32(sc.mismatch),
                bs=bs1, unroll=args.unroll or 8, interpret=interp)

        t0 = time.perf_counter()
        try:
            out = np.asarray(run(jnp.asarray(ac)))
        except Exception as e:  # noqa: BLE001 — probing the envelope
            print(f"LBt={LBt}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        compile_s = time.perf_counter() - t0
        ok = "?"
        if not args.timing_only:
            strs_a = ["".join(chr(c) for c in am[i, :na[i]])
                      for i in range(B)]
            strs_b = ["".join(chr(c) for c in bm[i, :nb[i]])
                      for i in range(B)]
            ref, _, _ = dp.fill_batch(sc, strs_a, strs_b, is_sw=args.sw,
                                      emit_dirs=False, pow2_pad=True,
                                      validate=False)
            want = (np.asarray(ref.best) if args.sw
                    else np.asarray(ref.corner).max(axis=1))
            ok = bool(np.array_equal(out, want))

        # V-fit timing: scan over V fresh a-batches
        def make(V):
            @jax.jit
            def many(xs, salt):
                def body(carry, aa):
                    s = run(aa)
                    return carry + s.sum() * salt, None
                tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
                return tot
            return many

        def inputs_for(V):
            xs = np.stack([
                dp.compact_inputs_mm(
                    sc, alpha[np.random.default_rng(50 + i).integers(
                        0, 4, (B, LA))], bm)[0]
                for i in range(V)])
            return jax.block_until_ready(jnp.asarray(xs))

        vs = (1, 3) if interp else (2, 10)
        res = {}
        for V in vs:
            fn = make(V)
            xs = inputs_for(V)
            np.asarray(fn(xs, jnp.int32(1)))
            ts = []
            for i in range(5):
                t1 = time.perf_counter()
                np.asarray(fn(xs, jnp.int32(i + 2)))
                ts.append(time.perf_counter() - t1)
            res[V] = float(np.min(ts))
        per = (res[vs[-1]] - res[vs[0]]) / (vs[-1] - vs[0])
        cells = float(np.sum(na.astype(np.int64) * nb))
        gcups = cells / per / 1e9
        print(f"LBt={LBt} LA={LA} B={B} sw={args.sw} exact={ok} "
              f"C={geo['C']} BS={geo['BS']} nB={geo['nB']} "
              f"compile={compile_s:.1f}s per-fill={per:.4f}s "
              f"-> {gcups:.1f} GCUPS")


if __name__ == "__main__":
    main()
