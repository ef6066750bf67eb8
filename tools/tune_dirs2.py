#!/usr/bin/env python3
"""Same-process A/B geometry sweep for the v2 chained kernels (dirs and
scores) on the real chip.  Cross-session chip drift is ~10-15%, so
geometry ranking is only trustworthy when the candidates run interleaved
inside ONE process (memory note: in-process V-fit tight) — this tool
exists to pick K/chain/bs defaults for ops/pallas_dp2.chain_geometry.

Usage:
  python tools/tune_dirs2.py --suite dirs      # NW/SW dirs geometry
  python tools/tune_dirs2.py --suite blosum    # protein scores geometry
  python tools/tune_dirs2.py --suite lutdirs   # lutQ8 dirs geometry
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit(make_scan_fn, inputs_for, vs=(2, 18), reps=5):
    import jax.numpy as jnp

    fns = {}
    for V in vs:
        fns[V] = (make_scan_fn(V), inputs_for(V))
        np.asarray(fns[V][0](fns[V][1], jnp.int32(1)))
    res = {V: [] for V in vs}
    salt = 2
    for _ in range(reps):
        for V in vs:
            fn, xs = fns[V]
            t0 = time.perf_counter()
            np.asarray(fn(xs, jnp.int32(salt)))
            salt += 1
            res[V].append(time.perf_counter() - t0)
    lo, hi = float(np.min(res[vs[0]])), float(np.min(res[vs[-1]]))
    return (hi - lo) / (vs[-1] - vs[0])


def bench_cfg(B, L, *, kind, sw, chain, bs, unroll, lut, neg=False,
              interp=False, vs=(2, 18)):
    """One (geometry, mode) candidate -> GCUPS.  kind: 'dirs'|'scores'."""
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp2 import (
        chain_geometry, lut2_eligible, pallas_fill_dirs2, pallas_scores2,
    )
    from seqalign_tpu.scoring.presets import (
        scoring_system_BLOSUM62,
        scoring_system_default,
        scoring_system_sw_default,
    )

    if lut == "blosum":
        sc = scoring_system_BLOSUM62()
        alpha = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", dtype=np.uint8)
    elif lut == "q8":
        sc = scoring_system_default().add_wildcard("n", 0)
        alpha = np.frombuffer(b"acgt", dtype=np.uint8)
    else:
        sc = scoring_system_sw_default() if sw else scoring_system_default()
        alpha = np.frombuffer(b"acgt", dtype=np.uint8)
    if neg:
        import dataclasses

        sc = dataclasses.replace(sc, no_end_gap_penalty=True)
    rng = np.random.default_rng(0)
    bseq = alpha[rng.integers(0, len(alpha), (B, L))]
    na = jnp.full((B,), L, jnp.int32)
    nb = jnp.full((B,), L, jnp.int32)
    if lut:
        _, bc, subK, _ = dp.compact_inputs(sc, bseq, bseq)
        lut_np = lut2_eligible(sc, subK)
        assert lut_np > 0, "lut config must be lut2-eligible"
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
    geo = chain_geometry(B, L, L, K=unroll, chain=chain, bs=bs,
                         state_bytes=140 if kind == "dirs" else 60)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)

    def inputs_for(V):
        xs = np.stack([
            ci(alpha[np.random.default_rng(1000 + i).integers(
                0, len(alpha), (B, L))]) for i in range(V)])
        return jax.block_until_ready(jnp.asarray(xs))

    def make(V):
        @jax.jit
        def many(xs, salt):
            def body(carry, aa):
                if kind == "scores":
                    s = pallas_scores2(
                        aa, bcj, na, nb, go, ge, is_sw=sw, match=match,
                        mismatch=mismatch, subK=subj, interpret=interp,
                        unroll=unroll, bs=bs, chain=chain, lut_np=lut_np,
                        neg=neg)
                    acc = s.sum()
                else:
                    d, mm_, corner = pallas_fill_dirs2(
                        aa, bcj, na, nb, go, ge, is_sw=sw, emit_m=sw,
                        match=match, mismatch=mismatch, subK=subj,
                        interpret=interp, unroll=unroll, bs=bs,
                        chain=chain, lut_np=lut_np, neg=neg)
                    acc = d[0, 0].astype(jnp.int32).sum()
                    if mm_ is not None:
                        acc = acc + mm_[0, 0].sum()
                    if corner is not None:
                        acc = acc + corner.sum()
                return carry + acc * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    per = fit(make, inputs_for, vs=(2, 6) if interp else vs)
    gcups = B * L * L / per / 1e9
    print("%s B=%d L=%d sw=%s lut=%s neg=%s K=%d chain=%d(C=%d BS=%d "
          "nB=%d): %.6fs -> %.1f GCUPS"
          % (kind, B, L, sw, lut, neg, unroll, chain, geo["C"], geo["BS"],
             geo["nB"], per, gcups), flush=True)
    return gcups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="dirs",
                    choices=["dirs", "blosum", "lutdirs", "negdirs",
                             "one"])
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--kind", default="dirs")
    ap.add_argument("--sw", action="store_true")
    ap.add_argument("--lut", default="")
    ap.add_argument("--neg", action="store_true")
    ap.add_argument("--chain", type=int, default=0)
    ap.add_argument("--bs", type=int, default=0)
    ap.add_argument("--unroll", type=int, default=16)
    args = ap.parse_args()
    import jax

    interp = jax.default_backend() == "cpu"
    results = {}
    if args.suite == "one":
        bench_cfg(args.B, args.L, kind=args.kind, sw=args.sw,
                  chain=args.chain, bs=args.bs, unroll=args.unroll,
                  lut=args.lut, neg=args.neg, interp=interp)
        return
    if args.suite == "dirs":
        cands = []
        for K in (8, 16):
            for chain in (1, 2, 4):
                for bs in (0, 32, 64):
                    cands.append((K, chain, bs))
        for sw in (False, True):
            for (K, chain, bs) in cands:
                try:
                    g = bench_cfg(256, 512, kind="dirs", sw=sw, chain=chain,
                                  bs=bs, unroll=K, lut="", interp=interp)
                    results[("dirs", sw, K, chain, bs)] = g
                except Exception as e:  # noqa: BLE001
                    print("  FAIL K=%d chain=%d bs=%d: %s"
                          % (K, chain, bs, str(e)[:120]), flush=True)
    elif args.suite == "negdirs":
        for K in (8, 16):
            for chain in (1, 2, 4):
                for bs in (0, 32, 64):
                    try:
                        g = bench_cfg(256, 512, kind="dirs", sw=False,
                                      chain=chain, bs=bs, unroll=K, lut="",
                                      neg=True, interp=interp)
                        results[("negdirs", K, chain, bs)] = g
                    except Exception as e:  # noqa: BLE001
                        print("  FAIL: %s" % str(e)[:120], flush=True)
    elif args.suite == "blosum":
        for K in (8, 16):
            for chain in (1, 2, 4):
                for bs in (0, 32, 64):
                    try:
                        g = bench_cfg(128, 512, kind="scores", sw=True,
                                      chain=chain, bs=bs, unroll=K,
                                      lut="blosum", interp=interp)
                        results[("blosum", K, chain, bs)] = g
                    except Exception as e:  # noqa: BLE001
                        print("  FAIL: %s" % str(e)[:120], flush=True)
    elif args.suite == "lutdirs":
        for K in (8, 16):
            for chain in (1, 2, 4):
                try:
                    g = bench_cfg(256, 512, kind="dirs", sw=False,
                                  chain=chain, bs=0, unroll=K, lut="q8",
                                  interp=interp)
                    results[("lutdirs", K, chain)] = g
                except Exception as e:  # noqa: BLE001
                    print("  FAIL: %s" % str(e)[:120], flush=True)
    best = sorted(results.items(), key=lambda kv: -kv[1])[:8]
    print("TOP:", flush=True)
    for k, v in best:
        print("  %s -> %.1f" % (k, v), flush=True)


if __name__ == "__main__":
    main()
