#!/usr/bin/env python3
"""Kernel timing harness for the real chip.

The axon tunnel adds ~25ms fixed latency per fetched dispatch AND
`block_until_ready` does not actually block, so naive timing is useless.
Methodology here: run V genuinely-distinct fills inside one jitted scan,
force a host fetch of a scalar, and fit time(V) to separate fixed dispatch
cost from marginal per-fill device time.
"""

import argparse
import os
import sys
import time

import numpy as np

# NOTE: do NOT use PYTHONPATH=/root/repo for TPU runs — the axon tunnel
# helper inherits it and fails backend registration.  Self-insert instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit_fills(make_scan_fn, inputs_for, vs=(1, 4, 16), reps=5):
    """make_scan_fn(V) -> jitted fn(xs, salt); inputs_for(V) -> xs.
    Returns (fixed_s, per_fill_s)."""
    import jax
    import jax.numpy as jnp

    res = {}
    for V in vs:
        fn = make_scan_fn(V)
        xs = inputs_for(V)
        np.asarray(fn(xs, jnp.int32(1)))  # compile + warm
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(xs, jnp.int32(i + 2)))
            ts.append(time.perf_counter() - t0)
        res[V] = float(np.median(ts))
    v0, v1 = vs[0], vs[-1]
    slope = (res[v1] - res[v0]) / (v1 - v0)
    fixed = res[v0] - slope * v0
    return fixed, slope, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--LB", type=int, default=0, help="b length (default = L)")
    ap.add_argument("--sw", action="store_true")
    ap.add_argument("--i16", action="store_true")
    ap.add_argument("--i32", action="store_true", help="force int32 kernel")
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--xla", action="store_true", help="bench the XLA path")
    ap.add_argument("--inline", action="store_true",
                    help="in-kernel match/mismatch scoring (mm codes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp import pallas_scores
    from seqalign_tpu.scoring.presets import (
        scoring_system_default,
        scoring_system_sw_default,
    )

    sc = scoring_system_sw_default() if args.sw else scoring_system_default()
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(args.sw))
    B, L = args.B, args.L
    LB = args.LB or L
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    rng = np.random.default_rng(0)
    bseq = lut[rng.integers(0, 4, (B, LB))]
    _, bc, subK, imK = dp.compact_inputs(sc, bseq, bseq)
    na = np.full((B,), L, np.int32)
    nb = np.full((B,), LB, np.int32)
    bc, subK, imK, na_d, nb_d = map(jnp.asarray, (bc, subK, imK, na, nb))

    if args.inline:
        _, bc_mm = dp.compact_inputs_mm(sc, bseq, bseq)
        bc = jnp.asarray(bc_mm)

    def inputs_for(V):
        import jax

        ci = dp.compact_inputs_mm if args.inline else (
            lambda s, x, y: dp.compact_inputs(s, x, y)[:2])
        xs = np.stack([
            ci(sc,
               lut[np.random.default_rng(1000 + i).integers(0, 4, (B, L))],
               bseq)[0]
            for i in range(V)
        ])
        return jax.block_until_ready(jnp.asarray(xs))

    def make_scan_fn(V):
        @jax.jit
        def many(xs, salt):
            def body(carry, aa):
                if args.xla:
                    out = dp.dp_fill(
                        aa, bc, na_d, nb_d, subK, imK, go, ge, mn,
                        is_sw=args.sw, nsg=False, neg=False, nga=False,
                        ngb=False, nmm=False, emit_dirs=False, emit_m=False,
                        emit_gab=False,
                    )
                    s = out.best if args.sw else jnp.max(out.corner, axis=1)
                else:
                    s = pallas_scores(
                        aa, bc, na_d, nb_d, subK, imK, go, ge, mn,
                        is_sw=args.sw, unroll=args.unroll, bs=args.bs,
                        use_f32=not args.i32, inline_mm=args.inline,
                        match=np.int32(sc.match),
                        mismatch=np.int32(sc.mismatch),
                    )
                return carry + s.sum() * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    fixed, per_fill, res = fit_fills(make_scan_fn, inputs_for)
    cells = B * L * LB
    print(
        "B=%d L=%d(LB=%d) sw=%s f32=%s unroll=%d bs=%d xla=%s: fixed %.4fs per-fill "
        "%.6fs -> %.1f GCUPS" % (
            B, L, LB, args.sw, not args.i32, args.unroll, args.bs, args.xla, fixed,
            per_fill,
            cells / per_fill / 1e9,
        )
    )


if __name__ == "__main__":
    main()
