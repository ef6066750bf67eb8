#!/usr/bin/env python3
"""VPU dtype-throughput probe (round-2 perf experiments).

Round-1 recorded "int16/int8 vector ops fail to compile in Mosaic" and an
elementwise int32 ceiling of ~0.27 T ops/s.  This re-tests those claims on
the current stack with a Pallas chain kernel: N dependent max(add) steps on a
VMEM-resident block, timed with the V-scaling fit (the axon tunnel caches
identical dispatches and adds fixed latency, so naive timing is useless).

Usage: python tools/exp_vpu.py [--dtype int16] [--steps 512] [--rows 256]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int32")
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--op", default="addmax", choices=["addmax", "add", "roll",
                                                       "shift"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(args.dtype)
    R, L, S = args.rows, args.lanes, args.steps

    def kernel(x_ref, o_ref):
        v = x_ref[...]
        w = v
        for i in range(S):
            if args.op == "addmax":
                w = jnp.maximum(w + v, w)  # 2 elementwise ops
            elif args.op == "add":
                w = w + v
            elif args.op == "roll":
                w = pltpu.roll(w, 1, 1) + v
            elif args.op == "shift":
                w = jnp.concatenate(
                    [jnp.full((R, 1), 1, dt), w[:, : L - 1]], axis=1
                ) + v
        o_ref[...] = w

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), dt),
        )(x)

    @functools.partial(jax.jit, static_argnames=("V",))
    def many(xs, salt, V):
        def body(c, x):
            return c + run(x).astype(jnp.int32).sum() * salt, None
        tot, _ = jax.lax.scan(body, jnp.int32(0), xs)
        return tot

    rng = np.random.default_rng(0)
    def inputs_for(V):
        lo, hi = (-100, 100)
        return jax.block_until_ready(
            jnp.asarray(rng.integers(lo, hi, (V, R, L)).astype(dt))
        )

    try:
        x1 = inputs_for(1)
        np.asarray(many(x1, jnp.int32(1), 1))
    except Exception as e:
        print(f"dtype={args.dtype} op={args.op}: FAILED TO COMPILE/RUN: "
              f"{str(e)[:500]}")
        return

    res = {}
    for V in (1, 4, 16):
        xs = inputs_for(V)
        np.asarray(many(xs, jnp.int32(1), V))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            np.asarray(many(xs, jnp.int32(i + 2), V))
            ts.append(time.perf_counter() - t0)
        res[V] = float(np.median(ts))
    slope = (res[16] - res[1]) / 15
    ops_per = {"addmax": 2, "add": 1, "roll": 2, "shift": 2}[args.op]
    tops = R * L * S * ops_per / slope / 1e12
    print(
        f"dtype={args.dtype} op={args.op} R={R} L={L} S={S}: "
        f"per-call {slope*1e6:.1f}us -> {tops:.3f} T ops/s "
        f"(elements/s {R*L*S/slope/1e12:.3f}T)"
    )


if __name__ == "__main__":
    main()
