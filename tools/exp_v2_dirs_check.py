#!/usr/bin/env python3
"""Correctness harness for the v2 chained dirs kernel (interpret mode):
per-pair interior direction-code planes, M planes, and corners must match
the v1 XLA fill bit-for-bit; tracebacks must reproduce host strings."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from seqalign_tpu.ops import dp, host_dp
    from seqalign_tpu.ops.pallas_dp2 import (
        chain_geometry, lut2_eligible, pallas_fill_dirs2,
        unpack_pair_plane2, pair_planes_device2,
    )
    from seqalign_tpu.ops.traceback import SwHitIterator, nw_traceback
    from seqalign_tpu.scoring.config import ScoringConfig
    from seqalign_tpu.scoring.presets import (
        scoring_system_BLOSUM62,
        scoring_system_default,
        scoring_system_sw_default,
    )

    rng = np.random.default_rng(17)
    fails = 0
    cases = [
        ("nw_c1", scoring_system_default(), False, False, b"acgt",
         10, 48, 48, 1),
        ("nw_c3", scoring_system_default(), False, False, b"acgt",
         13, 48, 48, 3),
        ("sw_c3", scoring_system_sw_default(), True, False, b"acgt",
         13, 48, 48, 3),
        ("nw_nsg_c3", ScoringConfig(1, -2, -4, -1,
                                    no_start_gap_penalty=True),
         False, True, b"acgt", 10, 48, 48, 3),
        ("nw_ilv_c2", scoring_system_default(), False, False, b"acgt",
         24, 32, 32, 2),
        ("sw_ilv_c2", scoring_system_sw_default(), True, False, b"acgt",
         24, 32, 32, 2),
        ("nw_blosum_c3", scoring_system_BLOSUM62(), False, False,
         b"ARNDCQEGHILKMFPSTWYV", 8, 48, 48, 3),
        ("sw_blosum_c3", scoring_system_BLOSUM62(), True, False,
         b"ARNDCQEGHILKMFPSTWYV", 8, 48, 48, 3),
        ("nw_ragged", scoring_system_default(), False, False, b"acgt",
         11, 80, 48, 3),
        ("sw_zero", ScoringConfig(2, -1, 0, 0), True, False, b"acgt",
         10, 48, 48, 3),
    ]
    for (name, sc, is_sw, nsg, alpha, B, LA, LB, chain) in cases:
        lutarr = np.frombuffer(alpha, dtype=np.uint8)
        seqs_a, seqs_b = [], []
        for _ in range(B):
            la = int(rng.integers(1, LA + 1))
            lb = int(rng.integers(1, LB + 1))
            seqs_a.append(bytes(lutarr[rng.integers(0, len(lutarr), la)])
                          .decode())
            seqs_b.append(bytes(lutarr[rng.integers(0, len(lutarr), lb)])
                          .decode())
        a, na = dp.pad_batch(seqs_a, pad_to=LA)
        b, nb = dp.pad_batch(seqs_b, pad_to=LB)
        if dp.mm_eligible(sc):
            ac, bc = dp.compact_inputs_mm(sc, a, b)
            lut_np = 0
            subj = None
            match, mismatch = np.int32(sc.match), np.int32(sc.mismatch)
        else:
            ac, bc, subK, _ = dp.compact_inputs(sc, a, b)
            lut_np = lut2_eligible(sc, subK)
            assert lut_np > 0, name
            subj = jnp.asarray(subK)
            match = mismatch = None
        geo = chain_geometry(B, LA, LB, chain=chain, bs=8,
                             state_bytes=140)
        dirs, mdev, corner = pallas_fill_dirs2(
            jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
            jnp.asarray(nb), np.int32(sc.gap_open),
            np.int32(sc.gap_extend), is_sw=is_sw, emit_m=is_sw,
            match=match, mismatch=mismatch, subK=subj, interpret=True,
            chain=chain, bs=8, nsg=nsg, lut_np=lut_np)
        dirs_np = np.asarray(dirs)
        # v1 reference fill (XLA scan)
        out, na1, nb1 = dp.fill_batch(
            sc, seqs_a, seqs_b, is_sw=is_sw, emit_dirs=True, emit_m=is_sw,
            pow2_pad=False, validate=False)
        vdirs = np.asarray(out.dirs)
        ok = True
        for j in range(B):
            naj, nbj = int(na[j]), int(nb[j])
            pl2 = unpack_pair_plane2(dirs_np, j, geo, LA, LB)
            v1 = vdirs[j]
            # compare the interior cells (y in [1, nb], x in [1, na])
            for y in range(1, nbj + 1):
                # plane row r = x + y - 2 -> x = r + 2 - y
                xs = np.arange(1, naj + 1)
                rr = xs + y - 2
                g2 = pl2[rr, y]
                g1 = v1[rr, y] if v1.shape[0] >= rr.max() + 1 else None
                if g1 is None or not np.array_equal(g2, g1):
                    ok = False
                    break
            if not ok:
                break
        # corners
        if not is_sw:
            vc = np.asarray(out.corner)
            if not np.array_equal(np.asarray(corner), vc):
                print(f"  corner mismatch {name}")
                ok = False
        # end-to-end traceback strings vs host
        if not is_sw:
            for j in range(B):
                pl2 = unpack_pair_plane2(dirs_np, j, geo, LA, LB)
                aln = nw_traceback(seqs_a[j], seqs_b[j], int(na[j]),
                                   int(nb[j]), pl2,
                                   np.asarray(corner)[j])
                want = host_dp.nw_align(sc, seqs_a[j], seqs_b[j])
                if (aln.result_a, aln.result_b, aln.score) != (
                        want.result_a, want.result_b, want.score):
                    print(f"  traceback mismatch {name} pair {j}")
                    ok = False
                    break
        else:
            mplanes = pair_planes_device2(mdev, geo, LA, LB, B)
            mnp = np.asarray(mplanes)
            for j in range(B):
                pl2 = unpack_pair_plane2(dirs_np, j, geo, LA, LB)
                hits = SwHitIterator(sc, seqs_a[j], seqs_b[j], int(na[j]),
                                     int(nb[j]), pl2, mnp[j])
                want = host_dp.HostSwHits(sc, seqs_a[j], seqs_b[j])
                got_l = [(h.result_a, h.result_b, h.score, h.pos_a,
                          h.pos_b) for h in hits]
                want_l = [(h.result_a, h.result_b, h.score, h.pos_a,
                           h.pos_b) for h in want]
                if got_l != want_l:
                    print(f"  SW hits mismatch {name} pair {j}")
                    print("   got", got_l[:3])
                    print("   want", want_l[:3])
                    ok = False
                    break
        print(f"{name}: {'OK' if ok else 'FAIL'}")
        fails += 0 if ok else 1
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
