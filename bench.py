"""Headline benchmark: batched Needleman-Wunsch fill throughput in GCUPS
(giga cell-updates per second) on one chip, via the Pallas wavefront kernel.

Timing methodology: the axon tunnel adds ~25ms fixed latency per fetched
dispatch and `block_until_ready` does not truly block, so we run V
genuinely-distinct fills inside one jitted scan, force a host fetch, and fit
time(V) to separate fixed dispatch cost from marginal per-fill device time.

The reference publishes no numbers (BASELINE.md); its measured ad-hoc
magnitude is ~0.1-1 GCUPS on one x86 core (-O2).  vs_baseline is computed
against the midpoint estimate 0.5 GCUPS.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_GCUPS = 0.5


def main():
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp import pallas_scores
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(False))

    B, L = 256, 512
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:  # keep the CI/smoke path small
        B, L = 32, 128
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    rng = np.random.default_rng(0)
    bseq = lut[rng.integers(0, 4, (B, L))]
    _, bc, subK, imK = dp.compact_inputs(sc, bseq, bseq)
    na = jnp.full((B,), L, jnp.int32)
    nb = jnp.full((B,), L, jnp.int32)
    bc, subK, imK = map(jnp.asarray, (bc, subK, imK))

    def inputs_for(V):
        xs = np.stack([
            dp.compact_inputs(
                sc, lut[np.random.default_rng(1000 + i).integers(0, 4, (B, L))],
                bseq,
            )[0]
            for i in range(V)
        ])
        return jax.block_until_ready(jnp.asarray(xs))

    def make_many(V):
        @jax.jit
        def many(xs, salt):
            def body(carry, aa):
                s = pallas_scores(aa, bc, na, nb, subK, imK, go, ge, mn,
                                  is_sw=False)
                return carry + s.sum() * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    res = {}
    vs = (1, 4, 16) if not on_cpu else (1, 2)
    for V in vs:
        fn = make_many(V)
        xs = inputs_for(V)
        np.asarray(fn(xs, jnp.int32(1)))  # compile + warm
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(xs, jnp.int32(i + 2)))
            ts.append(time.perf_counter() - t0)
        res[V] = float(np.median(ts))
    per_fill = (res[vs[-1]] - res[vs[0]]) / (vs[-1] - vs[0])
    gcups = B * L * L / per_fill / 1e9
    print(json.dumps({
        "metric": "nw_fill_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


def main_with_retry():
    # the axon tunnel occasionally wedges; one retry with a fresh process
    # state is usually enough, and the driver always needs a JSON line
    try:
        main()
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"bench retry after: {e}\n")
        try:
            time.sleep(20)
            main()
        except Exception as e2:  # noqa: BLE001
            print(json.dumps({
                "metric": "nw_fill_throughput",
                "value": 0.0,
                "unit": "GCUPS",
                "vs_baseline": 0.0,
                "error": str(e2)[:200],
            }))


if __name__ == "__main__":
    main_with_retry()
