"""Headline benchmark: batched Needleman-Wunsch fill throughput in GCUPS
(giga cell-updates per second) on one chip.

The reference publishes no numbers (BASELINE.md); its measured ad-hoc
magnitude is ~0.1-1 GCUPS on one x86 core (-O2).  vs_baseline is computed
against the midpoint estimate 0.5 GCUPS.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

BASELINE_GCUPS = 0.5


def main():
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    _, sub, ismatch, _ = sc.luts()
    sub_flat = jnp.asarray(sub.reshape(-1))
    match_flat = jnp.asarray(ismatch.reshape(-1))
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(False))

    B, L = 256, 512
    rng = np.random.default_rng(0)
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    a = jnp.asarray(lut[rng.integers(0, 4, (B, L))])
    b = jnp.asarray(lut[rng.integers(0, 4, (B, L))])
    na = jnp.full((B,), L, jnp.int32)
    nb = jnp.full((B,), L, jnp.int32)

    def fwd(a, b, na, nb):
        out = dp.dp_fill(
            a, b, na, nb, sub_flat, match_flat, go, ge, mn,
            is_sw=False, nsg=False, neg=False, nga=False, ngb=False,
            nmm=False, emit_dirs=False, emit_m=False, emit_gab=False,
        )
        return jnp.max(out.corner, axis=1)

    fn = jax.jit(fwd)
    fn(a, b, na, nb).block_until_ready()  # compile

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(a, b, na, nb)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    cells = B * L * L
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "nw_fill_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
