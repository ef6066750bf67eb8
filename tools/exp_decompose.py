#!/usr/bin/env python3
"""Decompose pallas_scores time: prologue (profile+shear+pack) vs kernel.

Round-2 diagnostic: the f32 kernel mode changed nothing (5.0 -> 5.1 GCUPS),
so the bound is not VPU elementwise dtype throughput.  Time the pieces.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit(make_fn, inputs_for, vs=(1, 4, 16), reps=5):
    import jax
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
        res[V] = float(np.median(ts))
    return (res[vs[-1]] - res[vs[0]]) / (vs[-1] - vs[0])


def main():
    import jax
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops import pallas_dp as pd
    from seqalign_tpu.scoring.presets import scoring_system_default

    sc = scoring_system_default()
    go, ge = np.int32(sc.gap_open), np.int32(sc.gap_extend)
    mn = np.int32(sc.dp_floor(False))
    B, L = 256, 512
    lut = np.frombuffer(b"acgt", dtype=np.uint8)
    rng = np.random.default_rng(0)
    bseq = lut[rng.integers(0, 4, (B, L))]
    _, bc, subK, imK = dp.compact_inputs(sc, bseq, bseq)
    na = jnp.full((B,), L, jnp.int32)
    nb = jnp.full((B,), L, jnp.int32)
    bc, subK, imK = map(jnp.asarray, (bc, subK, imK))
    cells = B * L * L

    def inputs_for(V):
        xs = np.stack([
            dp.compact_inputs(
                sc, lut[np.random.default_rng(1000 + i).integers(0, 4, (B, L))],
                bseq)[0]
            for i in range(V)
        ])
        return jax.block_until_ready(jnp.asarray(xs))

    # ---- piece 1: prologue only (profile + shear + lane pack)
    dt = jnp.float32
    subKp = jnp.pad(subK, ((0, 1), (0, 1)), constant_values=pd.POISON)

    def prologue(aa):
        ac = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, aa.shape, 1) < na[:, None],
            aa, subK.shape[0])
        p = pd._profile(ac, bc, subKp, dt)
        ss = pd._shear(p)[:, :, : 2 * L - 1]
        return ss.sum(dtype=jnp.float32)

    def make_prol(V):
        @jax.jit
        def many(xs, salt):
            def body(c, aa):
                return c + prologue(aa).astype(jnp.int32) * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    slope = fit(make_prol, inputs_for)
    print(f"prologue only: {slope*1e3:.2f} ms/fill ({cells/slope/1e9:.1f} "
          "GCUPS-equiv)")

    # ---- piece 2: full pallas_scores (f32)
    def make_full(V):
        @jax.jit
        def many(xs, salt):
            def body(c, aa):
                s = pd.pallas_scores(aa, bc, na, nb, subK, imK, go, ge, mn,
                                     is_sw=False, use_f32=True)
                return c + s.sum() * salt, None
            tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return tot
        return many

    slope = fit(make_full, inputs_for)
    print(f"full f32:      {slope*1e3:.2f} ms/fill ({cells/slope/1e9:.1f} "
          "GCUPS)")


if __name__ == "__main__":
    main()
