#!/usr/bin/env python3
"""Correctness harness for the v2 chained scores kernel (interpret mode on
CPU): compares pallas_scores2 against the v1 XLA fill for random ragged
batches across NW/SW, nsg, chain counts, and scoring modes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp
    from seqalign_tpu.ops.pallas_dp2 import (
        chain_geometry, f32_safe2, lut2_eligible, pallas_scores2,
    )
    from seqalign_tpu.scoring.config import ScoringConfig
    from seqalign_tpu.scoring.presets import (
        scoring_system_BLOSUM62,
        scoring_system_default,
        scoring_system_sw_default,
    )

    rng = np.random.default_rng(7)
    fails = 0
    cases = [
        # (name, sc, is_sw, nsg, lut, alpha, B, LA, LB, chain, bs)
        ("nw_eq_c1", scoring_system_default(), False, False, False,
         b"acgt", 24, 64, 64, 1, 8),
        ("nw_eq_c4", scoring_system_default(), False, False, False,
         b"acgt", 24, 64, 64, 4, 8),
        ("nw_eq_c3_ragged", scoring_system_default(), False, False, False,
         b"acgt", 23, 96, 64, 3, 8),
        ("sw_eq_c1", scoring_system_sw_default(), True, False, False,
         b"acgt", 24, 64, 64, 1, 8),
        ("sw_eq_c4", scoring_system_sw_default(), True, False, False,
         b"acgt", 24, 64, 64, 4, 8),
        ("sw_eq_c3_ragged", scoring_system_sw_default(), True, False,
         False, b"acgt", 23, 96, 64, 3, 8),
        ("nw_eq_nsg_c3", ScoringConfig(1, -2, -4, -1,
                                       no_start_gap_penalty=True),
         False, True, False, b"acgt", 16, 64, 64, 3, 8),
        ("nw_eq_ilv_c2", scoring_system_default(), False, False, False,
         b"acgt", 32, 32, 32, 2, 8),  # P>1 interleaved lanes (floor off)
        ("sw_eq_ilv_c2", scoring_system_sw_default(), True, False, False,
         b"acgt", 32, 32, 32, 2, 8),
        ("nw_lut_c1", scoring_system_BLOSUM62(), False, False, True,
         b"ARNDCQEGHILKMFPSTWYV", 16, 64, 64, 1, 8),
        ("nw_lut_c3", scoring_system_BLOSUM62(), False, False, True,
         b"ARNDCQEGHILKMFPSTWYV", 16, 64, 64, 3, 8),
        ("sw_lut_c3", scoring_system_BLOSUM62(), True, False, True,
         b"ARNDCQEGHILKMFPSTWYV", 16, 64, 64, 3, 8),
        ("nw_lut_q8_c3", scoring_system_default().add_wildcard("n", 0),
         False, False, True, b"acgtn", 16, 64, 64, 3, 8),
        ("sw_lut_q8_c3",
         ScoringConfig(2, -2, -2, -1).add_wildcard("n", 1),
         True, False, True, b"acgtn", 16, 64, 64, 3, 8),
        # a shorter than b (W = LBt dominates)
        ("nw_eq_ab", scoring_system_default(), False, False, False,
         b"acgt", 16, 33, 64, 3, 8),
        ("sw_eq_ab", scoring_system_sw_default(), True, False, False,
         b"acgt", 16, 33, 64, 3, 8),
        # zero gap penalties (degenerate ties)
        ("nw_eq_zero", ScoringConfig(1, -1, 0, 0), False, False, False,
         b"acgt", 16, 64, 64, 3, 8),
        ("sw_eq_zero", ScoringConfig(2, -1, 0, 0), True, False, False,
         b"acgt", 16, 64, 64, 3, 8),
    ]
    for (name, sc, is_sw, nsg, lut, alpha, B, LA, LB, chain, bs) in cases:
        lutarr = np.frombuffer(alpha, dtype=np.uint8)
        seqs_a, seqs_b = [], []
        for i in range(B):
            la = int(rng.integers(1, LA + 1))
            lb = int(rng.integers(1, LB + 1))
            seqs_a.append(bytes(lutarr[rng.integers(0, len(lutarr), la)])
                          .decode())
            seqs_b.append(bytes(lutarr[rng.integers(0, len(lutarr), lb)])
                          .decode())
        a, na = dp.pad_batch(seqs_a, pad_to=LA)
        b, nb = dp.pad_batch(seqs_b, pad_to=LB)
        if lut:
            ac, bc, subK, _ = dp.compact_inputs(sc, a, b)
            lut_np = lut2_eligible(sc, subK)
            assert lut_np > 0, name
            match = mismatch = None
        else:
            assert dp.mm_eligible(sc), name
            ac, bc = dp.compact_inputs_mm(sc, a, b)
            subK = None
            lut_np = 0
            match, mismatch = np.int32(sc.match), np.int32(sc.mismatch)
        geo = chain_geometry(B, LA, LB, chain=chain, bs=bs)
        assert f32_safe2(sc, LA, LB, geo["C"], geo["W"]), name
        got = np.asarray(pallas_scores2(
            jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
            jnp.asarray(nb), np.int32(sc.gap_open),
            np.int32(sc.gap_extend), is_sw=is_sw, match=match,
            mismatch=mismatch, subK=None if subK is None
            else jnp.asarray(subK),
            interpret=True, chain=chain, bs=bs, nsg=nsg, lut_np=lut_np))
        # reference: v1 XLA fill
        out, _, _ = dp.fill_batch(sc, seqs_a, seqs_b, is_sw=is_sw,
                                  emit_dirs=False, pow2_pad=True,
                                  validate=False)
        want = (np.asarray(out.best) if is_sw
                else np.asarray(out.corner).max(axis=1))
        ok = np.array_equal(got, want)
        print(f"{name}: {'OK' if ok else 'FAIL'}  C={geo['C']} W={geo['W']}"
              f" BS={geo['BS']} nB={geo['nB']} P={geo['P']}")
        if not ok:
            bad = np.nonzero(got != want)[0][:5]
            for j in bad:
                print(f"  pair {j}: got {got[j]} want {want[j]} "
                      f"na={na[j]} nb={nb[j]}")
            fails += 1
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
