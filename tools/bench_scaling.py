#!/usr/bin/env python3
"""Scaling-efficiency harness: aligned pairs/s at 1 device vs N devices
(BASELINE.json north star: >=90% scaling efficiency at 2+ hosts).

Measures the sharded v2 scores kernel (the same dispatch
``parallel.engine.sharded_score_batch`` uses) over meshes of growing
size, with the V-scaling-fit methodology (the axon tunnel caches
identical dispatches and its block_until_ready does not block).  Writes
SCALING.json.

On this dev machine only ONE real TPU chip is reachable, so real-chip
rows stop at n=1; pass ``--cpu-virtual N`` (or run under
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N) to
exercise the multi-device plumbing on a virtual CPU mesh — those rows
validate sharding/compile, not absolute throughput.  On a real v5e
slice the same command produces the true 1->N chip scaling curve
turnkey.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fit(make_fn, inputs_for, vs, reps=5):
    import jax.numpy as jnp

    res = {}
    for V in vs:
        fn = make_fn(V)
        xs = inputs_for(V)
        np.asarray(fn(xs, jnp.int32(1)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(xs, jnp.int32(i + 2)))
            ts.append(time.perf_counter() - t0)
        res[V] = float(np.min(ts))
    return (res[vs[-1]] - res[vs[0]]) / (vs[-1] - vs[0])


def bench_mesh(n_dev: int, B: int, L: int, vs) -> float:
    """Per-batch seconds for a B-pair NW scores batch sharded over n_dev
    devices (chained v2 kernel per shard)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp2 import pallas_scores2
    from seqalign_tpu.parallel.engine import make_mesh
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    interp = jax.default_backend() == "cpu"
    mesh = make_mesh(n_dev)
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    rng = np.random.default_rng(0)
    bseq = lut[rng.integers(0, 4, (B, L))]
    _, bc = dp.compact_inputs_mm(sc, bseq, bseq)
    na = jnp.full((B,), L, jnp.int32)
    nb = jnp.full((B,), L, jnp.int32)
    bcj = jnp.asarray(bc)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)

    def local_fill(ac, bcs, nas, nbs):
        return pallas_scores2(
            ac, bcs, nas, nbs, go, ge, is_sw=False,
            match=np.int32(sc.match), mismatch=np.int32(sc.mismatch),
            interpret=interp)

    sharded = shard_map(
        local_fill, mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=P("pairs"), check_vma=False)

    def inputs_for(V):
        xs = np.stack([
            dp.compact_inputs_mm(
                sc, lut[np.random.default_rng(100 + i).integers(
                    0, 4, (B, L))], bseq)[0]
            for i in range(V)])
        return jax.block_until_ready(jnp.asarray(xs))

    def make_fn(V):
        @jax.jit
        def many(xs, salt):
            def body(carry, aa):
                return carry + sharded(aa, bcj, na, nb).sum() * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    return _fit(make_fn, inputs_for, vs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=1024,
                    help="global batch (pairs), divided across devices")
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--cpu-virtual", type=int, default=0,
                    help="force a CPU backend with N virtual devices")
    args = ap.parse_args()
    if args.cpu_virtual:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_virtual}")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    backend = jax.default_backend()
    n_avail = len(jax.devices())
    plumbing = backend == "cpu"
    vs = (1, 3) if plumbing else (2, 18)
    rows = []
    base = None
    n = 1
    while n <= n_avail:
        per = bench_mesh(n, args.B, args.L, vs)
        pairs_s = args.B / per
        gcups = args.B * args.L * args.L / per / 1e9
        if base is None:
            base = pairs_s
        eff = pairs_s / (base * n)
        rows.append({
            "n_devices": n, "per_batch_s": round(per, 6),
            "pairs_per_s": round(pairs_s, 1), "gcups": round(gcups, 2),
            "efficiency": round(eff, 4),
        })
        print(json.dumps(rows[-1]), flush=True)
        n *= 2
    out = {
        "backend": backend, "plumbing_only": plumbing,
        "B": args.B, "L": args.L, "n_devices_available": n_avail,
        "note": ("virtual CPU mesh: validates sharding plumbing, not "
                 "throughput" if plumbing else
                 "real-chip rows; single-chip machines stop at n=1"),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"bench_scaling: {len(rows)} rows -> {path}")


if __name__ == "__main__":
    main()
