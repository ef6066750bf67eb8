#!/usr/bin/env python3
"""Scaling-efficiency harness with per-stage decomposition
(BASELINE.json north star: >=90% scaling efficiency at 2+ hosts; the
reference has no parallelism at all, SURVEY §2.4).

What a single dev machine can honestly measure:

* **Stage decomposition** (any backend): per-batch host pack (pad +
  alphabet compaction, pure numpy), H2D transfer, device fill (V-fit),
  and result fetch.  Host stages are backend-independent — they are the
  real per-host serial costs a TPU slice would pay.
* **Pipeline occupancy** (any backend): wall time of M batches through
  the double-buffered ``parallel.engine.sharded_score_stream`` vs the
  pure-fill time — how completely host stages hide behind the fill.
* **Weak-scaling rows on a virtual CPU mesh**: fixed per-device batch,
  growing mesh.  These validate sharding/compile and that per-batch host
  cost grows only with the LOCAL shard (virtual devices share the host's
  cores, so virtual "efficiency" under-reports a real slice — the
  decomposition is the meaningful signal).
* **Extrapolation**: combining measured host s/pair with the real-chip
  kernel rate (committed BENCH_SWEEP.json headline) into the supported
  chips-per-host budget at >=90% efficiency, written into SCALING.json.

On a real v5e slice the same command produces the true 1->N chip curve
turnkey (real-chip rows stop at n=1 on this machine: one tunnel chip).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min_of(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def _fit(make_fn, inputs_for, vs, reps=5):
    import jax.numpy as jnp

    res = {}
    fns = {V: (make_fn(V), inputs_for(V)) for V in vs}
    for V in vs:
        np.asarray(fns[V][0](fns[V][1], jnp.int32(1)))
    salts = iter(range(2, 2 + reps * len(vs)))
    samples = {V: [] for V in vs}
    for _ in range(reps):
        for V in vs:
            fn, xs = fns[V]
            s = next(salts)
            t0 = time.perf_counter()
            np.asarray(fn(xs, jnp.int32(s)))
            samples[V].append(time.perf_counter() - t0)
    lo = float(np.min(samples[vs[0]]))
    hi = float(np.min(samples[vs[-1]]))
    return (hi - lo) / (vs[-1] - vs[0])


def _gen_batch(B, L, seed):
    alpha = "acgt"
    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list(alpha), L)) for _ in range(2 * B)]
    return seqs[:B], seqs[B:]


def stage_decomposition(n_dev, B, L, vs, reps=7):
    """Per-batch seconds for each pipeline stage at mesh size n_dev with
    a GLOBAL batch of B pairs (host stages scale with B, the fill with
    B/n_dev on a real mesh)."""
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
    sa, sb = _gen_batch(B, L, 0)

    # -- stage 1: host pack — the production path (native one-pass
    # pack+fold, ops/dp.pack_inputs_mm; numpy fallback inside) ----------
    def pack():
        return dp.pack_inputs_mm(sc, sa, sb)

    t_pack = _min_of(lambda: pack(), reps)
    ac, bc, na, nb = pack()

    # -- stage 2: H2D transfer ------------------------------------------
    import jax

    def h2d():
        return jax.block_until_ready(
            (jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
             jnp.asarray(nb)))

    t_h2d = _min_of(lambda: h2d(), reps)
    naj = jnp.asarray(na)
    nbj = jnp.asarray(nb)
    bcj = jnp.asarray(bc)
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)

    if interp:
        # virtual CPU mesh: the XLA scan fill (what a CPU shard really
        # runs) — interpret-mode Pallas is ~1000x slow AND serializes
        # shards, so it said nothing about shard parallelism (round-4
        # weak_efficiency 0.27 was that artifact, not a sharding cost).
        # Inputs stay the production folded bytes; the code map is one
        # on-device gather.
        _, _, subK, imK, mapa, mapb = dp.compact_inputs(
            sc, ac, bc, return_maps=True)
        subKj, imKj = jnp.asarray(subK), jnp.asarray(imK)
        mapaj, mapbj = jnp.asarray(mapa), jnp.asarray(mapb)
        mn = np.int32(sc.dp_floor(False))

        def local_fill(a_, b_, na_, nb_):
            out = dp.dp_fill(
                mapaj[a_], mapbj[b_], na_, nb_, subKj, imKj, go, ge, mn,
                emit_dirs=False, emit_m=False, emit_gab=False,
                is_sw=False, nsg=False, neg=False, nga=False, ngb=False,
                nmm=False)
            return jnp.max(out.corner, axis=1)
    else:
        def local_fill(a_, b_, na_, nb_):
            return pallas_scores2(
                a_, b_, na_, nb_, go, ge, is_sw=False,
                match=np.int32(sc.match), mismatch=np.int32(sc.mismatch),
                interpret=interp)

    sharded = shard_map(
        local_fill, mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=P("pairs"), check_vma=False)

    # -- stage 3: device fill (V-fit: marginal per-batch seconds) -------
    def inputs_for(V):
        xs = np.stack([
            dp.compact_inputs_mm(sc, dp.pad_batch(_gen_batch(B, L, 7 + i)[0])[0],
                                 dp.pad_batch(sb)[0])[0]
            for i in range(V)])
        return jax.block_until_ready(jnp.asarray(xs))

    def make_fn(V):
        @jax.jit
        def many(xs, salt):
            def body(carry, aa):
                return carry + sharded(aa, bcj, naj, nbj).sum() * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    t_fill = _fit(make_fn, inputs_for, vs)

    # -- stage 4: result fetch (device -> host numpy, B int32) ----------
    out = jax.block_until_ready(sharded(jnp.asarray(ac), bcj, naj, nbj))
    t_fetch = _min_of(lambda: np.asarray(out), reps)

    return {
        "n_devices": n_dev, "B_global": B, "L": L,
        "t_host_pack_s": round(t_pack, 6),
        "t_h2d_s": round(t_h2d, 6),
        "t_fill_s": round(t_fill, 6),
        "t_fetch_s": round(t_fetch, 6),
        "host_us_per_pair": round(1e6 * (t_pack + t_fetch) / B, 3),
        "fill_gcups": round(B * L * L / t_fill / 1e9, 2),
    }


def pipeline_occupancy(n_dev, B, L, n_batches=8):
    """Wall time of n_batches through the double-buffered stream vs the
    pure-fill floor: occupancy = fill_total / wall (1.0 = host stages
    fully hidden behind the device fill)."""
    import jax

    from seqalign_tpu.parallel.engine import (
        make_mesh, sharded_score_batch, sharded_score_stream,
    )
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    mesh = make_mesh(n_dev)
    batches = [_gen_batch(B, L, 100 + i) for i in range(n_batches)]
    # warm compile + caches
    sharded_score_batch(sc, batches[0][0], batches[0][1], is_sw=False,
                        mesh=mesh)

    t0 = time.perf_counter()
    outs = list(sharded_score_stream(sc, iter(batches), is_sw=False,
                                     mesh=mesh))
    wall_pipe = time.perf_counter() - t0
    assert len(outs) == n_batches

    t0 = time.perf_counter()
    for sa, sb in batches:
        sharded_score_batch(sc, sa, sb, is_sw=False, mesh=mesh)
    wall_serial = time.perf_counter() - t0
    del jax
    return {
        "n_devices": n_dev, "B": B, "L": L, "n_batches": n_batches,
        "wall_pipelined_s": round(wall_pipe, 4),
        "wall_serial_s": round(wall_serial, 4),
        "pipeline_speedup": round(wall_serial / wall_pipe, 3),
    }


def extrapolate(decomp_rows):
    """Combine the measured per-pair HOST cost with the committed
    real-chip kernel rate into the chips-per-host budget at >=90%
    efficiency (the written argument VERDICT r3 item 4 asks for)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(root, "BENCH_SWEEP.json")) as fh:
            sweep = {r.get("label"): r for r in json.load(fh)}
        chip_pairs_s = sweep["nw_scores_B256_L512"]["pairs_per_s"]
    except Exception:  # noqa: BLE001
        chip_pairs_s = None
    host = min(r["host_us_per_pair"] for r in decomp_rows)
    if not chip_pairs_s:
        return {"note": "no committed BENCH_SWEEP headline available"}
    host_pairs_s = 1e6 / host
    # with double buffering the host must only KEEP UP with its chips:
    # efficiency ~= min(1, host_rate / (chips_per_host * chip_rate));
    # chips at 90%: host_rate / (0.9 * chip_rate)
    chips_at_90 = host_pairs_s / (0.9 * chip_pairs_s)
    return {
        "host_us_per_pair_measured": host,
        "host_pairs_per_s": round(host_pairs_s, 1),
        "chip_pairs_per_s_committed": chip_pairs_s,
        "chips_per_host_at_90pct": round(chips_at_90, 2),
        "argument": (
            "Pair-batch data parallelism has no cross-device collective "
            "in the fill; per-host work is pack+fetch (measured above) "
            "and overlaps the fill via the double-buffered stream "
            "(pipeline rows). A host therefore sustains >=90pct scaling "
            "efficiency while chips_per_host <= host_rate/(0.9*chip_rate)"
            " = {:.1f}; scaling across hosts adds only the O(4B/pair) "
            "score allgather on DCN.".format(chips_at_90)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B-per-dev", type=int, default=128,
                    help="pairs per device (weak scaling)")
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--cpu-virtual", type=int, default=0,
                    help="force a CPU backend with N virtual devices")
    ap.add_argument("--pipeline-batches", type=int, default=8)
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
    L = args.L if not plumbing else min(args.L, 256)

    decomp = []
    pipe = []
    n = 1
    while n <= n_avail:
        B = args.B_per_dev * n
        row = stage_decomposition(n, B, L, vs)
        decomp.append(row)
        print(json.dumps(row), flush=True)
        row2 = pipeline_occupancy(n, B, L, args.pipeline_batches)
        pipe.append(row2)
        print(json.dumps(row2), flush=True)
        n *= 2
    # production-batch row: the streaming scorer flushes 1024-pair
    # buckets (aligners.score_pairs_stream flush_pairs), so the host
    # rate that matters for chips-per-host amortizes pack overhead over
    # batches that big — measure it at the full mesh
    row = stage_decomposition(n_avail, max(1024, args.B_per_dev * n_avail),
                              L, vs)
    row["note"] = "production-size batch (stream flush_pairs)"
    decomp.append(row)
    print(json.dumps(row), flush=True)

    base = decomp[0]
    ncores = os.cpu_count() or 1
    weak_eff = []
    for r in decomp:
        if "note" in r:  # production-batch row: not a weak-scaling point
            continue
        # weak scaling: per-device work constant; ideal keeps t_fill flat
        eff = base["t_fill_s"] / r["t_fill_s"]
        row = {
            "n_devices": r["n_devices"],
            "weak_efficiency": round(eff, 4),
        }
        if plumbing:
            # virtual devices share this host's cores: n devices on c
            # cores can at best reach c/n of flat — normalize so the
            # sharding cost is separable from core oversubscription
            ideal = min(1.0, ncores / r["n_devices"])
            row["core_oversubscription_ideal"] = round(ideal, 4)
            row["efficiency_vs_core_ideal"] = round(eff / ideal, 4)
        weak_eff.append(row)

    section = {
        "backend": backend,
        "B_per_device": args.B_per_dev, "L": L,
        "n_devices_available": n_avail,
        "note": (
            "virtual CPU mesh: host-stage decomposition and pipeline "
            "occupancy are the meaningful signals (virtual devices share "
            "the host's cores, so weak_efficiency under-reports a real "
            "slice)" if plumbing else
            "real-chip rows; single-chip machines stop at n=1"),
        "stage_decomposition": decomp,
        "pipeline": pipe,
        "weak_scaling": weak_eff,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    # merge: virtual-mesh and real-chip runs each own one section so a
    # rerun of either never clobbers the other's evidence
    out = {}
    prev = {}
    try:
        with open(path) as fh:
            prev = json.load(fh)
        if isinstance(prev, dict):
            out = {k: prev[k] for k in ("virtual_cpu_mesh", "real_chip")
                   if k in prev}
        else:
            prev = {}
    except Exception:  # noqa: BLE001 — first run / legacy format
        prev = {}
    out["virtual_cpu_mesh" if plumbing else "real_chip"] = section
    if not plumbing:
        # the chips-per-host budget must come from the REAL-chip host
        # rate (same pack path, production L) — a virtual-CPU run keeps
        # the previous real extrapolation instead of clobbering it
        out["extrapolation_real_slice"] = extrapolate(decomp)
    elif "extrapolation_real_slice" in prev:
        out["extrapolation_real_slice"] = prev["extrapolation_real_slice"]
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"bench_scaling -> {path}")


if __name__ == "__main__":
    main()
