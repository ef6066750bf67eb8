#!/usr/bin/env python3
"""Reproduce the v2 lut-dirs Mosaic failure (TPU_VALIDATE round-5
FALLBACK on nw_blosum62_planes) with the real exception visible."""
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp2 import (
        lut2_eligible, pallas_fill_dirs2,
    )
    from seqalign_tpu.scoring.presets import scoring_system_BLOSUM62

    sc = scoring_system_BLOSUM62()
    rng = np.random.default_rng(5)
    prot = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    B, L = 8, 256
    seqs = [bytes(prot[rng.integers(0, 20, L)]).decode() for _ in range(B)]
    a, na = dp.pad_batch(seqs)
    ac, bc, subK, _ = dp.compact_inputs(sc, a, a)
    lut_np = lut2_eligible(sc, subK)
    print("lut_np =", lut_np, "subK", subK.shape)
    try:
        d, m, corner = pallas_fill_dirs2(
            jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
            jnp.asarray(na), np.int32(sc.gap_open),
            np.int32(sc.gap_extend), is_sw=False, emit_m=False,
            subK=jnp.asarray(subK), lut_np=lut_np)
        print("corner[:2]:", np.asarray(corner)[:2])
        print("OK")
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
