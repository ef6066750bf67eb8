"""Pallas TPU wavefront kernel: scores-only batched Gotoh fill.

The XLA scan in ``ops.dp`` round-trips its carry through HBM every diagonal;
this kernel keeps the DP state resident in VMEM across a sequential
``(batch_chunk, diagonal_block)`` grid and unrolls K diagonals per grid step.
The per-diagonal body is tuned against the measured VPU ceiling (~0.3T int32
elementwise ops/s on the target chip):

* **Lane packing**: each 512-lane row holds P = 512/LBt pairs side by side
  (LBt lanes each), so short-b workloads don't waste lanes on the triangular
  ramp of a wide diagonal band, and the sweep is only LA+LBt-1 diagonals.
  Shifted vectors are re-filled with the (pair-independent) row-0 boundary
  value at every lane-block boundary, which both implements the y=0 boundary
  and stops cross-pair leakage.
* **Poisoned padding** instead of validity masks: pad positions are remapped
  to a dedicated alphabet code whose substitution score is a large negative
  poison, so pad-region MATCH values clamp to <= 0 and the SW best-score
  accumulator is a single unmasked ``max`` per diagonal.  (Pad cells never
  feed real cells: cell (y,x) only reads predecessors with smaller coords.)
* **Block-gated column-0 injection** (cell (d,0), alignment.c:59-81): only
  exists while d-1 < LBt; later diagonal blocks run a loop copy without the
  injection selects.
* **Block-gated NW corner capture**: pair corners are hit at d = na+nb;
  blocks outside the chunk's [min, max] of na+nb skip capture entirely.

Row-0 boundary values enter as closed-form fill values baked into the
shifted vectors at *store* time: ``sh(h)`` stored at diagonal d with
boundary-lane fill H[0, d] is consumed at d+1 as the E-predecessor and at
d+2 (via ping-pong) as the M-predecessor — both need exactly H[0, d].

Scores-only uses the H/E/F reduction of the reference's M/Ga/Gb recurrence:
``H = max(M, Ga, Gb)`` satisfies ``E' = max(H+gop, E+ge)`` etc. exactly when
``gap_open <= 0`` (the extra Ga+gop term is absorbed since gop <= ge), and
``H' = max(H2s + sub, E', F')`` needs no explicit floor because E', F' are
already clamped at mn.  Recurrence: alignment.c:89-167 with
gop = gap_open + gap_extend (alignment.c:38-39).

The kernels cover every recurrence mode (default flags, free start/end
gaps, and the no-gaps/no-mismatch constrained modes — the latter need an
in-kernel scoring mode: equality for no_mismatches, equality or LUT for
no-gaps) with gap_open <= 0; large-alphabet matrix scoring streams
substitution planes instead, without the constrained modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp import _profile, _shear

POISON = -(1 << 22)  # pad substitution score; |POISON| < 2^24 (MXU-exact)
POISON8 = -128  # int8 ss-plane marker expanded to POISON in-kernel
TL = 512  # total lanes per row


def _profile_t(codes_a, codes_b, tableK, out_dtype):
    """Transposed profile PT[b, y, x] = tableK[codes_a[b, x], codes_b[b, y]]
    via one-hot MXU matmuls — emitted (B, LB, LA) directly so the diagonal
    shear needs no 256MB transpose.  Exact: one nonzero per contraction."""
    Ka, Kb = tableK.shape
    oa = (codes_a[..., None] == jnp.arange(Ka, dtype=codes_a.dtype)).astype(
        jnp.float32
    )  # (B, LA, Ka)
    ob = (codes_b[..., None] == jnp.arange(Kb, dtype=codes_b.dtype)).astype(
        jnp.float32
    )  # (B, LB, Kb)
    pb = jax.lax.dot_general(
        ob, tableK.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, LB, Ka)
    pt = jax.lax.dot_general(
        pb, oa,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, LB, LA)
    return pt.astype(out_dtype)


def _shear_t(pt):
    """Skew a transposed (B, LB, LA) profile to diagonals:
    out[b, y0, r] = pt[b, y0, r - y0] — the pad+flatten+strided-reshape trick
    of ``dp._shear`` without its leading transpose."""
    B, LB, LA = pt.shape
    W = LA + LB + 2
    pt = jnp.pad(pt, ((0, 0), (0, 0), (0, W - LA)))
    flat = pt.reshape(B, LB * W)
    stride = W - 1
    return flat[:, : LB * stride].reshape(B, LB, stride)


PADA, PADB = (1 << 20), (1 << 20) + 1  # inline-mm pad codes (never equal)


def _kernel(*refs, is_sw, BS, LBt, P, K, DK, dt, ss_i8, inline_mm=False,
            lut_k=0, nsg=False, neg=False, nga=False, ngb=False,
            nmm=False):
    inline = inline_mm or lut_k > 0
    if inline:
        # Equality-scoring fast path: no substitution planes at all.  The
        # sheared a-codes vector lives in VMEM and advances one lane per
        # diagonal (a[d-1] enters at lane 0), and each diagonal's scores are
        # ``a == b ? match : mismatch`` computed in registers — eliminating
        # the prologue's profile matmul + diagonal shear + pack transposes
        # AND the per-diagonal HBM plane stream (they were ~50% of wall
        # time at B=256, L=512).  Covers use_match_mismatch scoring with no
        # swaps/wildcards — the reference's ``substitution_matrix == NULL``
        # hot case (alignment_scoring.c:76-93).
        # aw_ref block (1, 1, BS, K+1): aw[:, j] = a[d0-2+j] — this grid
        # step's entering a-codes (Mosaic cannot prove alignment of a
        # dynamic lane slice into a full a-codes row, so the windows are
        # pre-arranged host-side; K+1 lanes pad to one 128-lane tile)
        #
        # ``lut_k`` generalizes the same in-register scheme to ARBITRARY
        # substitution matrices over small alphabets (wildcards, swaps,
        # case, BLOSUM-style tables — alignment_scoring.c:96-133): the
        # b-codes are static per lane, so the prologue bakes one VMEM
        # plane per a-letter, pl[c][lane] = subK[c, b[lane]], and each
        # diagonal's scores come from a lut_k-way select chain over the
        # rolling a-codes — still no shear and no per-diagonal HBM
        # stream.  bl_ref then holds the (lut_k, BS, LN) planes instead
        # of the b-codes.
        (aw_ref, bl_ref, nabl_ref, drange_ref, scal_ref, out_ref,
         h_ref, hs_ref, es_ref, f_ref, hs2_ref, accv_ref, av_ref) = refs
    else:
        (ss_ref, nabl_ref, drange_ref, scal_ref, out_ref,
         h_ref, hs_ref, es_ref, f_ref, hs2_ref, accv_ref) = refs
    i32 = jnp.int32
    ib = pl.program_id(0)
    dk = pl.program_id(1)
    d0 = dk * K + 2  # first diagonal of this block
    go = scal_ref[0]
    ge = scal_ref[1]
    mn = scal_ref[2]
    gop = go + ge

    LN = P * LBt  # lanes per row
    # Lane layouts.  Plane path (block): pair p owns contiguous lanes
    # [p*LBt, (p+1)*LBt), y0 = lane & (LBt-1) — shifted vectors need a
    # cross-pair refill at every block boundary.  Inline path with P > 1
    # (interleaved): lane l holds pair l % P at y0 = l // P — the
    # per-diagonal shift becomes a P-lane shift whose entering (BS, P)
    # block is the per-pair fill/a-codes, with NO cross-pair leakage (lane
    # l reads l-P, the same pair) and no boundary selects.
    ilv = inline and P > 1
    lane = jax.lax.broadcasted_iota(i32, (BS, LN), 1)
    if ilv:
        y0 = lane // P
    elif P > 1:
        y0 = lane & (LBt - 1)
    else:
        y0 = lane
    bstart = y0 == 0  # first lane(s) of each pair
    SH = P if ilv else 1  # lanes per shift step

    def shift(v, fillv):
        """Advance y by one: lane shift by SH with entering lanes = fillv."""
        s = jnp.concatenate([jnp.full((BS, SH), fillv, dt),
                             v[:, : LN - SH]], axis=1)
        if P > 1 and not ilv:
            s = jnp.where(bstart, fillv, s)
        return s

    @pl.when(dk == 0)
    def _init():
        zero = jnp.zeros((BS, LN), dt)
        if inline:
            # av(d=2)[y0] = a[-y0]: y0 == 0 lanes hold each pair's a[0]
            a0 = aw_ref[0, 0, :, 0:SH]
            if ilv:
                pad = jnp.full((BS, LN - SH), PADA, jnp.int32)
                av_ref[...] = jnp.concatenate([a0, pad], axis=1)
            else:
                av_ref[...] = jnp.where(y0 == 0, a0, jnp.int32(PADA))
        if is_sw:
            h_ref[...] = zero
            hs_ref[...] = zero
            es_ref[...] = zero
            f_ref[...] = zero
            hs2_ref[...] = zero
            accv_ref[...] = zero
        else:
            # boundary gap run of length 1 (free under nsg)
            run1 = jnp.zeros((), dt) if nsg else gop
            mnv = zero + mn
            # prev1 = diagonal 1: lane0 of each block = cell (1,0):
            # H = E = run1, F = mn
            h_ref[...] = jnp.where(bstart, run1, mn)
            f_ref[...] = mnv
            # sh(prev1 h) consumed at d=2 with boundary fill H[0,1] = run1;
            # interior lane1 = h1[lane0] = run1, rest mn
            sh1 = jnp.where(y0 == 1, run1, mn)
            hs_ref[...] = jnp.where(bstart, run1, sh1)
            es_ref[...] = jnp.where(bstart, mn, sh1)  # Ga[0,1] = mn
            # sh(prev0 h) consumed at d=2 as M-predecessor: boundary fill
            # H[0,0] = 0, no interior lanes
            hs2_ref[...] = jnp.where(bstart, jnp.zeros((), dt), mnv)
            accv_ref[...] = mnv

    # NW + float: the sentinel is a true -inf (adds/maxes are exact and
    # saturating), so the per-step floor clamps are dropped entirely.
    clamp = is_sw or dt == jnp.int32
    zero_dt = jnp.zeros((), dt)

    def drun(d):
        """Row-0 boundary gap run go + d*ge at traced diagonal d (free with
        no_start_gap_penalty, alignment.c:59-81)."""
        if nsg:
            return zero_dt
        dv = jnp.asarray(d, i32)
        return go + (dv.astype(dt) * ge if dt != i32 else dv * ge)

    def sweep(inject_col0: bool):
        h, hs, es, f, hs2 = (
            h_ref[...], hs_ref[...], es_ref[...], f_ref[...], hs2_ref[...]
        )
        if is_sw:
            accv = accv_ref[...]
        if neg or nga or ngb:
            nal = nabl_ref[0, 0]
            nbl = nabl_ref[0, 1]
            lane_nb = y0 == (nbl - 1)
        if neg:
            # free end gaps: zero gap penalties in the last column (GAP_A /
            # E) and last row (GAP_B / F) — folded into the summands so the
            # recurrence mirrors alignment.c:128-155 exactly
            bo = jnp.where(lane_nb, zero_dt, gop)
            be = jnp.where(lane_nb, zero_dt, ge)
        if inline:
            av = av_ref[...]
            # (BS, (K+1)*SH): win[:, j*SH:(j+1)*SH] = per-pair a[d0-2+j]
            win = aw_ref[0, 0]
            if inline_mm:
                bl = bl_ref[0]
                mt = scal_ref[3]
                mm = scal_ref[4]
            else:
                pls = bl_ref[0]  # (lut_k, BS, LN) per-a-letter score planes
        h_news = []
        for k in range(K):
            d = d0 + k
            if nmm:
                # no_mismatches (alignment.c:101-104): the MATCH matrix is
                # mn unless the pair matches; only the inline equality mode
                # qualifies (mm_eligible => code equality IS is_match)
                im = av == bl
            if inline:
                if inline_mm:
                    ss = jnp.where(av == bl, mt, mm)
                    if is_sw:
                        # pads must stay hugely negative for the unmasked
                        # best
                        ss = jnp.where((av >= PADA) | (bl >= PADA),
                                       jnp.asarray(POISON, dt), ss)
                else:
                    # lut_k-way select chain over the rolling a-codes; the
                    # POISON default covers a-pads (av == PADA) and the
                    # planes bake b-pad lanes to POISON, so SW's unmasked
                    # best never sees pad scores
                    ss = jnp.full((BS, LN), POISON, dt)
                    for c in range(lut_k):
                        ss = jnp.where(av == c, pls[c], ss)
                # entering a[d-1] = per-pair win slice j = k+1
                av = jnp.concatenate(
                    [win[:, (k + 1) * SH: (k + 2) * SH], av[:, : LN - SH]],
                    axis=1)
            else:
                ss = ss_ref[0, 0, k]
                if ss_i8:
                    # int8 ss plane (4x less HBM): expand the pad marker to
                    # the real POISON only for SW (its best-score max is
                    # unmasked); NW never reads pad-lane values (see module
                    # docstring).
                    ss = ss.astype(dt)
                    if is_sw:
                        ss = jnp.where(ss == POISON8,
                                       jnp.asarray(POISON, dt), ss)
            if neg or nga:
                lastcol = y0 == (d - 1 - nal)  # lane where global x == na
            if neg:
                ao = jnp.where(lastcol, zero_dt, gop)
                ae = jnp.where(lastcol, zero_dt, ge)
                e_new = jnp.maximum(hs + ao, es + ae)
                f_new = jnp.maximum(h + bo, f + be)
            else:
                e_new = jnp.maximum(hs + gop, es + ge)
                f_new = jnp.maximum(h + gop, f + ge)
            if clamp:
                e_new = jnp.maximum(e_new, mn)
                f_new = jnp.maximum(f_new, mn)
            if nga:
                # no_gaps_in_a: GAP_A reachable only in the last column
                # (end-gap exception, alignment.c:121-137 + tests.c:65-98)
                e_new = jnp.where(lastcol, e_new, mn)
            if ngb:
                # no_gaps_in_b: GAP_B reachable only in the last row
                f_new = jnp.where(lane_nb, f_new, mn)
            m_arg = hs2 + ss
            if nmm:
                m_arg = jnp.where(im, m_arg, mn)
            h_new = jnp.maximum(m_arg, jnp.maximum(e_new, f_new))

            if inject_col0:
                # x == 0 boundary: cell (d, 0) at local lane d-1
                at0 = y0 == (d - 1)
                if is_sw:
                    h_new = jnp.where(at0, zero_dt, h_new)
                    e_new = jnp.where(at0, zero_dt, e_new)
                    f_new = jnp.where(at0, zero_dt, f_new)
                else:
                    run = drun(d)
                    h_new = jnp.where(at0, run, h_new)
                    e_new = jnp.where(at0, run, e_new)
                    f_new = jnp.where(at0, mn, f_new)

            if is_sw:
                # poisoned pads keep pad-region M <= 0; unmasked best
                accv = jnp.maximum(accv, jnp.maximum(m_arg, zero_dt))
            else:
                h_news.append(h_new)

            hs2, hs, es, h, f = (
                hs,
                shift(h_new, zero_dt if is_sw else drun(d)),
                shift(e_new, zero_dt if is_sw else mn),
                h_new,
                f_new,
            )

        h_ref[...] = h
        hs_ref[...] = hs
        es_ref[...] = es
        f_ref[...] = f
        hs2_ref[...] = hs2
        if inline:
            av_ref[...] = av
        if is_sw:
            accv_ref[...] = accv
        else:
            # corner capture, only when this block can contain some na+nb
            dlo = drange_ref[ib, 0]
            dhi = drange_ref[ib, 1]

            @pl.when((d0 <= dhi) & (d0 + K > dlo))
            def _capture():
                nal = nabl_ref[0, 0]
                nbl = nabl_ref[0, 1]
                lane_nb = y0 == (nbl - 1)
                accv = accv_ref[...]
                for k in range(K):
                    hit = (nal + nbl) == (d0 + k)
                    accv = jnp.where(lane_nb & hit, h_news[k], accv)
                accv_ref[...] = accv

    # column-0 injection only needed while d-1 < LBt
    @pl.when(d0 <= LBt + K)
    def _with_inject():
        sweep(True)

    @pl.when(d0 > LBt + K)
    def _without_inject():
        sweep(False)

    @pl.when(dk == DK - 1)
    def _emit():
        out_ref[0] = accv_ref[...]


def _dirs_kernel(*refs, is_sw, emit_m, BS, LBt, P, K, DK, dt,
                 inline_mm=False, lut_k=0, nsg=False, neg=False,
                 nga=False, ngb=False, nmm=False,
                 chunked=False, LA=None):
    inline = inline_mm or lut_k > 0
    if chunked:
        # Boundary-column carry (long-sequence decomposition,
        # dp.fill_chunked's Pallas analog; needs an in-kernel scoring mode
        # — equality or LUT planes, which are b-indexed and therefore
        # identical across a-chunks): the carried
        # column x_local = 0 enters exactly where the kernel already
        # injects the closed-form x=0 boundary — lane d-1 at diagonal d
        # wants bcol[y=d], which IS the bcol vector's lane d-1 — so the
        # carry is a vector select, no windows.  bcol_ref rows 0-2 hold
        # M/Ga/Gb at lane l = y0 -> y = y0+1, rows 3-5 the same shifted one
        # lane (y = y0; lane 0 = the (0, x_off) corner).  The chunk's last
        # column x_local = LA accumulates into bout scratch (cell (y, LA)
        # sits at lane y0 = d - LA - 1 on diagonal d) and is emitted for
        # the next chunk's bcol.  xoff_ref holds the chunk's global x
        # offset (drives the row-0 gap runs, corner hits, and neg's
        # last-column lane).
        (aw_ref, bl_ref, bcol_ref, nabl_ref, drange_ref, scal_ref,
         xoff_ref,
         dirs_ref, m_ref, corn_ref, bout_ref,
         sm_ref, sga_ref, sgb_ref,
         hm_ref, hga_ref, hgb_ref,
         h2m_ref, h2ga_ref, h2gb_ref,
         cm_ref, cga_ref, cgb_ref,
         av_ref, bom_ref, boga_ref, bogb_ref) = refs
    elif inline:
        # in-kernel scoring (see _kernel): aw_ref carries this block's
        # entering a-codes, av_ref the rolling sheared codes; bl_ref holds
        # the b-codes (equality mode) or the per-a-letter LUT planes
        (aw_ref, bl_ref, nabl_ref, drange_ref, scal_ref,
         dirs_ref, m_ref, corn_ref,
         sm_ref, sga_ref, sgb_ref,      # S(d): unshifted
         hm_ref, hga_ref, hgb_ref,      # SH(d): shifted
         h2m_ref, h2ga_ref, h2gb_ref,   # SH(d-1): shifted
         cm_ref, cga_ref, cgb_ref,      # NW corner accumulators
         av_ref) = refs
    else:
        (ss_ref, nabl_ref, drange_ref, scal_ref,
         dirs_ref, m_ref, corn_ref,
         sm_ref, sga_ref, sgb_ref,
         hm_ref, hga_ref, hgb_ref,
         h2m_ref, h2ga_ref, h2gb_ref,
         cm_ref, cga_ref, cgb_ref) = refs
    """Full three-matrix fill emitting packed 2-bit direction codes (and the
    M matrix for SW) — the Pallas replacement for the XLA dirs scan.

    Recurrence: alignment.c:89-167, including the free end-gap rewrite
    (nsg/neg) and the constrained modes (nga/ngb/nmm — no-gaps masks +
    the no_mismatches MATCH mask, alignment.c:101-155).  Direction codes
    replicate alignment_reverse_move's guard/equality/priority procedure
    (GAP_A > GAP_B > MATCH, alignment.c:311-327): with unconstrained flags
    the no-gaps guards are vacuous and the equalities reduce to the amax
    shortcut; constrained modes evaluate the guards + direct
    ``pred + penalty == curr`` tests on the masked fills — either way on
    the same values the fill just computed, so codes match the XLA scan on
    every cell a traceback can visit.
    """
    i32 = jnp.int32
    ib = pl.program_id(0)
    dk = pl.program_id(1)
    d0 = dk * K + 2
    go = scal_ref[0]
    ge = scal_ref[1]
    mn = scal_ref[2]
    gop = go + ge

    LN = P * LBt
    # lane layouts: see _kernel — block for the plane path, interleaved
    # (lane l = pair l % P, y0 = l // P) for inline with P > 1
    ilv = inline and P > 1
    lane = jax.lax.broadcasted_iota(i32, (BS, LN), 1)
    if ilv:
        y0 = lane // P
    elif P > 1:
        y0 = lane & (LBt - 1)
    else:
        y0 = lane
    bstart = y0 == 0
    SH = P if ilv else 1

    def shift(v, fillv):
        s = jnp.concatenate([jnp.full((BS, SH), fillv, dt),
                             v[:, : LN - SH]], axis=1)
        if P > 1 and not ilv:
            s = jnp.where(bstart, fillv, s)
        return s

    zero_dt = jnp.zeros((), dt)
    xoff = xoff_ref[0] if chunked else 0

    def drun(d):
        """Row-0 boundary gap run at GLOBAL x = xoff + d (and the y-run for
        the unchunked col-0 inject, where xoff is 0)."""
        if nsg:  # free start gaps: boundary runs cost 0 (alignment.c:59-81)
            return zero_dt
        dv = jnp.asarray(d, i32) + xoff
        return go + (dv.astype(dt) * ge if dt != i32 else dv * ge)

    @pl.when(dk == 0)
    def _init():
        zero = jnp.zeros((BS, LN), dt)
        if inline:
            a0 = aw_ref[0, 0, :, 0:SH]
            if ilv:
                pad = jnp.full((BS, LN - SH), PADA, jnp.int32)
                av_ref[...] = jnp.concatenate([a0, pad], axis=1)
            else:
                av_ref[...] = jnp.where(y0 == 0, a0, jnp.int32(PADA))
        if chunked:
            # carried-column init: S(1) lane0 = cell (1, x_off) = bcol[1];
            # SH(1) = shift of it with the row-0 closed form at x_off+1;
            # SH(0) lane0 = the (0, x_off) corner (shifted bcol lane 0).
            # base = mn (0 for SW, sentinel for NW — scal already holds it)
            bcM_u, bcGa_u, bcGb_u = (bcol_ref[0, r] for r in range(3))
            bcM_s, bcGa_s, bcGb_s = (bcol_ref[0, r] for r in range(3, 6))
            s1m = jnp.where(bstart, bcM_u, mn)
            s1ga = jnp.where(bstart, bcGa_u, mn)
            s1gb = jnp.where(bstart, bcGb_u, mn)
            sm_ref[...] = s1m
            sga_ref[...] = s1ga
            sgb_ref[...] = s1gb
            f_gb = zero_dt if is_sw else drun(1)
            hm_ref[...] = shift(s1m, mn)
            hga_ref[...] = shift(s1ga, mn)
            hgb_ref[...] = shift(s1gb, f_gb)
            h2m_ref[...] = jnp.where(bstart, bcM_s, mn)
            h2ga_ref[...] = jnp.where(bstart, bcGa_s, mn)
            h2gb_ref[...] = jnp.where(bstart, bcGb_s, mn)
            mnv = zero + mn
            bom_ref[...] = mnv
            boga_ref[...] = mnv
            bogb_ref[...] = mnv
        elif is_sw:
            for r in (sm_ref, sga_ref, sgb_ref, hm_ref, hga_ref, hgb_ref,
                      h2m_ref, h2ga_ref, h2gb_ref):
                r[...] = zero
        else:
            run1 = zero_dt if nsg else gop
            mnv = zero + mn
            # S(1): lane0 = cell (1,0) = (mn, run1, mn); rest mn
            sm_ref[...] = mnv
            sga_ref[...] = jnp.where(bstart, run1, mn)
            sgb_ref[...] = mnv
            # SH(1): lane0 = cell (0,1) = (mn, mn, run1);
            #        lane1 = cell (1,0) = (mn, run1, mn); rest mn
            at1 = y0 == 1
            hm_ref[...] = mnv
            hga_ref[...] = jnp.where(at1, run1, mn)
            hgb_ref[...] = jnp.where(bstart, run1, mn)
            # SH(0): lane0 = cell (0,0) = (0, 0, 0); rest mn
            z0 = jnp.where(bstart, zero_dt, mnv)
            h2m_ref[...] = z0
            h2ga_ref[...] = z0
            h2gb_ref[...] = z0
        if not is_sw:
            ninf = zero + mn
            cm_ref[...] = ninf
            cga_ref[...] = ninf
            cgb_ref[...] = ninf

    def pick(ga_ok, gb_ok, m_ok):
        # enum Matrix: MATCH=0, GAP_A=1, GAP_B=2; 3 = traceback-fail marker
        return jnp.where(
            ga_ok, 1, jnp.where(gb_ok, 2, jnp.where(m_ok, 0, 3))
        ).astype(jnp.int32)

    def sweep(inject_col0: bool):
        pm1, pga1, pgb1 = sm_ref[...], sga_ref[...], sgb_ref[...]
        m1s, ga1s, gb1s = hm_ref[...], hga_ref[...], hgb_ref[...]
        m2s, ga2s, gb2s = h2m_ref[...], h2ga_ref[...], h2gb_ref[...]
        constrained = nga or ngb or nmm
        if not is_sw or neg or constrained:
            nal = nabl_ref[0, 0]
            nbl = nabl_ref[0, 1]
            lane_nb = y0 == (nbl - 1)
        if not is_sw:
            cm, cga, cgb = cm_ref[...], cga_ref[...], cgb_ref[...]
            dlo = drange_ref[ib, 0]
            dhi = drange_ref[ib, 1]
            cap = (d0 <= dhi) & (d0 + K > dlo)
        if inline:
            av = av_ref[...]
            # (BS, (K+1)*SH): win[:, j*SH:(j+1)*SH] = per-pair a[d0-2+j]
            win = aw_ref[0, 0]
            if inline_mm:
                bl = bl_ref[0]
                mt = scal_ref[3]
                mm = scal_ref[4]
            else:
                pls = bl_ref[0]  # (lut_k, BS, LN) per-a-letter score planes
        if chunked:
            bcM_u, bcGa_u, bcGb_u = (bcol_ref[0, r] for r in range(3))
            bom, boga, bogb = bom_ref[...], boga_ref[...], bogb_ref[...]
        for k in range(K):
            d = d0 + k
            if nmm:
                # no_mismatches (alignment.c:101-104): MATCH is mn unless
                # the pair matches; inline equality mode only (mm_eligible
                # => code equality IS is_match)
                im = av == bl
            if inline:
                if inline_mm:
                    # pad cells never feed valid cells and pad plane bytes
                    # are never read (interior-only unpack), so plain mm
                    # scoring suffices — no poison select needed here
                    ss = jnp.where(av == bl, mt, mm)
                else:
                    # lut_k-way select chain (see _kernel); POISON default
                    # covers a-pads, planes bake b-pads to POISON — pads
                    # stay hugely negative like the plane path
                    ss = jnp.full((BS, LN), POISON, dt)
                    for c in range(lut_k):
                        ss = jnp.where(av == c, pls[c], ss)
                av = jnp.concatenate(
                    [win[:, (k + 1) * SH: (k + 2) * SH], av[:, : LN - SH]],
                    axis=1)
            else:
                ss = ss_ref[0, 0, k]
                if ss.dtype != dt:
                    ss = ss.astype(dt)
            amax = jnp.maximum(jnp.maximum(m2s, ga2s), gb2s)
            m_arg = amax + ss
            Mv = jnp.maximum(m_arg, zero_dt) if is_sw else m_arg
            if neg or nga:
                lastcol = y0 == (d + xoff - 1 - nal)
            if neg:
                # free end gaps: zero penalties in the last column (GAP_A)
                # / last row (GAP_B), folded into the summands so both the
                # fill values AND the direction-code equalities below see
                # them (alignment.c:128-155, 265-268)
                a_open = jnp.where(lastcol, zero_dt, gop)
                a_ext = jnp.where(lastcol, zero_dt, ge)
                b_open = jnp.where(lane_nb, zero_dt, gop)
                b_ext = jnp.where(lane_nb, zero_dt, ge)
            else:
                a_open = b_open = gop
                a_ext = b_ext = ge
            s1 = m1s + a_open
            s2 = ga1s + a_ext
            s3 = gb1s + a_open
            ga_v = jnp.maximum(jnp.maximum(s1, s2), s3)
            t1 = pm1 + b_open
            t2 = pga1 + b_open
            t3 = pgb1 + b_ext
            gb_v = jnp.maximum(jnp.maximum(t1, t2), t3)
            if is_sw:
                ga_v = jnp.maximum(ga_v, zero_dt)
                gb_v = jnp.maximum(gb_v, zero_dt)
            if nmm:
                Mv = jnp.where(im, Mv, mn)  # alignment.c:101-104
            if nga:
                # no_gaps_in_a: GAP_A reachable only in the last column
                # (end-gap exception, alignment.c:121-137)
                ga_v = jnp.where(lastcol, ga_v, mn)
            if ngb:
                gb_v = jnp.where(lane_nb, gb_v, mn)

            if not constrained:
                # direction codes (priority GAP_A > GAP_B > MATCH); the
                # ga2s + ss == Mv check reduces to ga2s == amax — except
                # where the SW floor clamped Mv to 0 (then every pred+ss
                # test fails and the XLA path emits DIR_FAIL; such cells
                # have M == 0 and are never read by a traceback, but keep
                # planes bit-identical)
                dm = pick(ga2s == amax, gb2s == amax, m2s == amax)
                if is_sw:
                    dm = jnp.where(m_arg == Mv, dm, 3)
                dga = pick(s2 == ga_v, s3 == ga_v, s1 == ga_v)
                dgb = pick(t2 == gb_v, t3 == gb_v, t1 == gb_v)
            else:
                # constrained modes: direct pred+penalty == value tests on
                # the MASKED fills, plus the no-gaps reachability guards of
                # alignment_reverse_move (alignment.c:312-321) translated
                # to lane coordinates (global x = d + xoff - y0 - 1, y =
                # y0 + 1; dp.py:340-380 is the XLA original)
                xd = d + xoff
                x_is1 = y0 == (xd - 2)
                x_is0 = y0 == (xd - 1)
                xm1_na = y0 == (xd - 2 - nal)
                ym1_nb = y0 == nbl

                def andg(g, eq):
                    return eq if g is None else g & eq

                gA_diag = (x_is1 | xm1_na) if nga else None
                gB_diag = (bstart | ym1_nb) if ngb else None
                dm = pick(andg(gA_diag, ga2s + ss == Mv),
                          andg(gB_diag, gb2s + ss == Mv),
                          m2s + ss == Mv)
                gA_up = (x_is0 | lastcol) if nga else None
                dga = pick(andg(gA_up, s2 == ga_v),
                           andg(gB_diag, s3 == ga_v),
                           s1 == ga_v)
                gB_left = lane_nb if ngb else None  # pred y==0 never holds
                dgb = pick(andg(gA_diag, t2 == gb_v),
                           andg(gB_left, t3 == gb_v),
                           t1 == gb_v)
            dirs_ref[0, 0, k] = (dm | (dga << 2) | (dgb << 4)).astype(
                jnp.uint8)
            if emit_m:
                m_ref[0, 0, k] = Mv.astype(jnp.int32)

            if inject_col0:
                at0 = y0 == (d - 1)
                if chunked:
                    # carried column: cell (d, x_off) = bcol[y = d], which
                    # sits at exactly lane d-1 of the bcol vectors
                    Mv = jnp.where(at0, bcM_u, Mv)
                    ga_v = jnp.where(at0, bcGa_u, ga_v)
                    gb_v = jnp.where(at0, bcGb_u, gb_v)
                elif is_sw:
                    Mv = jnp.where(at0, zero_dt, Mv)
                    ga_v = jnp.where(at0, zero_dt, ga_v)
                    gb_v = jnp.where(at0, zero_dt, gb_v)
                else:
                    Mv = jnp.where(at0, mn, Mv)
                    ga_v = jnp.where(at0, drun(d), ga_v)
                    gb_v = jnp.where(at0, mn, gb_v)

            if chunked:
                # capture the chunk's last column x_local = LA for the next
                # chunk's bcol: cell (y, LA) sits at lane y0 = d - LA - 1
                selb = y0 == (d - LA - 1)
                bom = jnp.where(selb, Mv, bom)
                boga = jnp.where(selb, ga_v, boga)
                bogb = jnp.where(selb, gb_v, bogb)

            if not is_sw:
                hit = (nal + nbl) == (d + xoff)
                if chunked:
                    # only the chunk containing global x = na owns the
                    # corner (other chunks' matching diagonals hold
                    # out-of-range lanes)
                    hit = hit & (nal > xoff) & (nal <= xoff + LA)
                sel = lane_nb & hit
                cm = jnp.where(sel, Mv, cm)
                cga = jnp.where(sel, ga_v, cga)
                cgb = jnp.where(sel, gb_v, cgb)

            # rotate carries: SH(d-1) <- SH(d); SH(d) <- shift(S(d+1));
            # S <- new.  Row-0 boundary fills (alignment.c:59-81): cell
            # (0, d) = (mn, mn, run(d)) for NW, zeros for SW.
            m2s, ga2s, gb2s = m1s, ga1s, gb1s
            if is_sw:
                m1s = shift(Mv, zero_dt)
                ga1s = shift(ga_v, zero_dt)
                gb1s = shift(gb_v, zero_dt)
            else:
                m1s = shift(Mv, mn)
                ga1s = shift(ga_v, mn)
                gb1s = shift(gb_v, drun(d))
            pm1, pga1, pgb1 = Mv, ga_v, gb_v

        sm_ref[...], sga_ref[...], sgb_ref[...] = pm1, pga1, pgb1
        hm_ref[...], hga_ref[...], hgb_ref[...] = m1s, ga1s, gb1s
        h2m_ref[...], h2ga_ref[...], h2gb_ref[...] = m2s, ga2s, gb2s
        if inline:
            av_ref[...] = av
        if chunked:
            bom_ref[...], boga_ref[...], bogb_ref[...] = bom, boga, bogb
        if not is_sw:
            cm_ref[...], cga_ref[...], cgb_ref[...] = cm, cga, cgb

    @pl.when(d0 <= LBt + K)
    def _with_inject():
        sweep(True)

    @pl.when(d0 > LBt + K)
    def _without_inject():
        sweep(False)

    if chunked:
        @pl.when(dk == DK - 1)
        def _emit_bout():
            bout_ref[0, 0] = bom_ref[...]
            bout_ref[0, 1] = boga_ref[...]
            bout_ref[0, 2] = bogb_ref[...]

    if not is_sw:
        @pl.when(dk == DK - 1)
        def _emit():
            corn_ref[0, 0] = cm_ref[...]
            corn_ref[0, 1] = cga_ref[...]
            corn_ref[0, 2] = cgb_ref[...]


def int16_safe(sc, LA, LB, is_sw) -> bool:
    """True when every DP value / boundary run / intermediate sum provably
    fits int16.  (Probed again round 2: Mosaic still rejects int16 vector
    ops on this part — tools/exp_vpu.py --dtype int16 fails in the TPU
    compiler — so this gate stays unused; f32 is the fast mode instead.)"""
    L = LA + LB
    tmn, tmx = sc.true_penalty_bounds()
    mp = max(abs(tmn), abs(tmx))
    vmax = max(0, tmx) * L + mp
    run = abs(sc.gap_open) + L * abs(sc.gap_extend)
    return L < 32000 and max(vmax, run + 2 * mp) < 32000


def f32_safe(sc, LA, LB) -> bool:
    """True when the f32 kernel mode is provably bit-exact: every DP value,
    boundary run, and intermediate sum is an integer of magnitude < 2**24
    (f32 integer arithmetic is exact below the 24-bit mantissa limit).

    Bound: |any matrix value| <= (LA+LB+2) * mp + |gap_open| where mp is the
    largest per-step penalty magnitude over CURRENT scores
    (ScoringConfig.true_penalty_bounds — NOT min/max_penalty, which are
    frozen at scoring_init for NEG_INF byte parity and miss CLI-mutated
    match/mismatch values); the largest intermediate is m_arg = H +
    POISON."""
    L = LA + LB + 2
    tmn, tmx = sc.true_penalty_bounds()
    mp = max(abs(tmn), abs(tmx),
             abs(sc.gap_open) + abs(sc.gap_extend), 1)
    bound = L * mp + abs(sc.gap_open)
    return bound + abs(POISON) < (1 << 24) - (1 << 22)


@functools.partial(
    jax.jit,
    static_argnames=("is_sw", "interpret", "unroll", "bs", "use_f32", "ss8",
                     "inline_mm", "lut_k", "nsg", "neg", "nga", "ngb",
                     "nmm"),
)
def pallas_scores(ac, bc, na, nb, subK, imK, gap_open, gap_extend, mn,
                  *, is_sw: bool, interpret: bool = False,
                  unroll: int = 8, bs: int = 128, use_f32: bool = True,
                  ss8: bool = True, inline_mm: bool = False,
                  lut_k: int = 0,
                  match=None, mismatch=None, nsg: bool = False,
                  neg: bool = False, nga: bool = False, ngb: bool = False,
                  nmm: bool = False):
    """Batched optimal scores (NW corner H / SW best M) on TPU via Pallas.

    ac/bc: (B, LA)/(B, LBt) int32 compact codes; LBt (padded b length) should
    be a multiple of 128.  Above TL=512 each row holds one pair across
    LBt lanes; measured bit-exact on TPU v5e up to LBt=4096 with a
    VMEM-scaled batch chunk (``bs`` 32 at 4096 — see aligners._pallas_bs).
    Returns (B,) int32.

    ``use_f32`` runs the DP in float32 — bit-exact while every value stays
    under 2**24 in magnitude (f32 add/max on integers is exact there), with
    a true ``-inf`` NW sentinel that makes the floor clamps free.  The VPU
    runs f32 elementwise ops ~5x faster than int32 on this part (measured
    with tools/exp_vpu.py), so this is the default; callers must gate it
    with :func:`f32_safe` and fall back to the int32 kernel otherwise.

    ``ss8`` streams the sheared substitution-score planes as int8 (4x less
    HBM traffic + copy cost in the prologue, which dominated round 1 at
    ~65% of wall time).  Callers must guarantee max|subK| <= 127 (every
    shipped scoring matrix qualifies); -128 is reserved as the pad marker.

    ``inline_mm`` (with ``match``/``mismatch``): equality scoring computed
    inside the kernel from rolling a-codes — no profile matmul, no diagonal
    shear, no plane stream (they were ~50% of wall time at B=256, L=512).
    Caller contract: use_match_mismatch scoring with no swaps/wildcards,
    and the sequences MUST be coded by :func:`dp.compact_inputs_mm`
    (shared fold-canonical alphabet — per-sequence compact codes give
    wrong equality).  Lane-packed rows (P > 1) use the interleaved layout
    (pair l % P at y0 = l // P).  ``subK``/``imK`` are ignored.

    ``lut_k`` (== subK.shape[0]; exclusive with ``inline_mm``): in-kernel
    LUT scoring for arbitrary substitution matrices over small alphabets.
    The b-codes are static per lane, so the prologue bakes per-a-letter
    VMEM planes pl[c][lane] = subK[c, b[lane]] and the kernel selects
    among them with a lut_k-way chain over the rolling a-codes — no
    shear, no per-diagonal HBM plane stream, same win as ``inline_mm``
    minus the chain cost.  Sequences must be coded by
    :func:`dp.compact_inputs` (per-side alphabets: a-codes index subK
    rows, b-codes its columns).  Callers gate lut_k <= 16 and size ``bs``
    for the extra lut_k*4*LN bytes/sublane of VMEM (aligners._pallas_bs).
    """
    del imK  # scores-only path never needs the is-match table
    B, LA = ac.shape
    _, LBt = bc.shape
    dt = jnp.float32 if use_f32 else jnp.int32
    if nmm:
        assert inline_mm, "no_mismatches needs the inline equality mode"
    if nga or ngb:
        assert inline_mm or lut_k > 0, \
            "no-gaps modes need an in-kernel scoring mode"
    K = unroll
    st = _stage_kernel_inputs(
        ac, bc, na, nb, subK, gap_open, gap_extend, mn, dt=dt, K=K, bs=bs,
        is_sw=is_sw, use_f32=use_f32, ss8=ss8, inline_mm=inline_mm,
        lut_k=lut_k, match=match, mismatch=mismatch,
    )
    BS, P, LN, DK, Bp, nB = (st["BS"], st["P"], st["LN"], st["DK"],
                             st["Bp"], st["nB"])
    inline = st["inline"]
    kernel = functools.partial(
        _kernel, is_sw=is_sw, BS=BS, LBt=LBt, P=P, K=K, DK=DK, dt=dt,
        ss_i8=ss8, inline_mm=inline_mm, lut_k=lut_k, nsg=nsg, neg=neg,
        nga=nga, ngb=ngb, nmm=nmm,
    )
    scratch = [pltpu.VMEM((BS, LN), dt)] * 6
    if inline:
        scratch = scratch + [pltpu.VMEM((BS, LN), jnp.int32)]
    out = pl.pallas_call(
        kernel,
        grid=(nB, DK),
        in_specs=st["first_specs"] + [
            pl.BlockSpec((1, 2, BS, LN), lambda i, d: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, BS, LN), lambda i, d: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nB, BS, LN), dt),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*st["first_args"], st["nabl"], st["drange"], st["scal"])
    # reduce each pair's lanes to its score
    if inline and P > 1:
        out = out.reshape(nB, BS, LBt, P).max(axis=2).reshape(Bp)
    else:
        out = out.reshape(nB, BS, P, LBt).max(axis=3).reshape(Bp)
    return out[:B].astype(jnp.int32)


def _stage_kernel_inputs(ac, bc, na, nb, subK, gap_open, gap_extend, mn, *,
                         dt, K, bs, is_sw, use_f32, ss8, inline_mm, lut_k,
                         match, mismatch, x_off=None):
    """Shared input staging for :func:`pallas_scores` and
    :func:`pallas_fill_dirs` — ONE copy of the contract that feeds both
    kernels (pad the batch to the lane-packed grid; build the in-kernel
    scoring inputs: a-window + b-codes for inline_mm, a-window + LUT
    planes for lut_k, sheared int8/dt substitution planes otherwise;
    assemble the nabl/drange/scal operands).  The kernels' lane math must
    stay in lockstep with the layouts built here.  ``x_off`` (chunked
    fills) offsets the a-pad boundary to the chunk-local coordinate.

    Returns a dict: first_args/first_specs (kernel scoring operands),
    nabl/drange/scal, and the geometry (B, LA, LBt, P, LN, D, DK, BS, Bp,
    nB, Ka, inline)."""
    B, LA = ac.shape
    _, LBt = bc.shape
    inline = inline_mm or lut_k > 0
    geo = pack_geometry(LA, LBt, bs=bs, inline=inline)
    P, LN, D, BS = geo["P"], geo["LN"], geo["D"], geo["BS"]
    DK = -(-D // K)

    # pad B to a multiple of BS*P
    Bp = -(-B // (BS * P)) * (BS * P)
    if Bp != B:
        pad = Bp - B
        ac = jnp.pad(ac, ((0, pad), (0, 0)))
        bc = jnp.pad(bc, ((0, pad), (0, 0)))
        na = jnp.pad(na, (0, pad), constant_values=1)
        nb = jnp.pad(nb, (0, pad), constant_values=1)
    nB = Bp // (BS * P)

    # Remap pad positions to dedicated poison codes so pad-region
    # substitution scores are hugely negative (see module docstring).
    # Codes may arrive uint8 (compact_inputs_mm returns raw folded
    # bytes): widen BEFORE injecting the PADA/PADB sentinels (2^20
    # wraps in uint8).
    ac = ac.astype(jnp.int32)
    bc = bc.astype(jnp.int32)
    Ka, Kb = subK.shape
    if inline:
        # no substitution plane STREAM: pad-coded sequences (+ static
        # per-letter planes in lut mode)
        abound = na[:, None] - (x_off[0] if x_off is not None else 0)
        ac = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, ac.shape, 1) < abound,
            ac, PADA,
        )
        if inline_mm:
            bc = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, bc.shape, 1)
                < nb[:, None],
                bc, PADB,
            )
        # overlapping entering-code windows: aw[b, dk, j] = a[dk*K + j],
        # j in [0, K] — two reshapes + a strided slice, no gathers
        LAp = DK * K + K + 2
        awin = jnp.pad(ac, ((0, 0), (0, LAp - LA)), constant_values=PADA)
        main = awin[:, : DK * K].reshape(Bp, DK, K)
        last = awin[:, K: DK * K + K: K].reshape(Bp, DK, 1)
        aw = jnp.concatenate([main, last], axis=2)  # (Bp, DK, K+1)
        # per-pair windows interleaved to the kernel's lane layout:
        # win[:, j*P + p] = a_pair_p[dk*K + j]
        aw = aw.reshape(nB, BS, P, DK, K + 1).transpose(0, 3, 1, 4, 2)
        aw = aw.reshape(nB, DK, BS, (K + 1) * P)
        if inline_mm:
            # lane l = y0*P + p holds b_pair_p[y0]
            bl = bc.reshape(nB, BS, P, LBt).transpose(0, 1, 3, 2)
            bl = bl.reshape(nB, BS, LN)
            second_spec = pl.BlockSpec((1, BS, LN), lambda i, d: (i, 0, 0))
        else:
            # static per-a-letter score planes
            assert lut_k == Ka, (lut_k, Ka)
            bl = _bake_lut_planes(subK, bc, nb, nB, BS, P, LBt, dt)
            second_spec = pl.BlockSpec((1, Ka, BS, LN),
                                       lambda i, d: (i, 0, 0, 0))
        first_specs = [
            pl.BlockSpec((1, 1, BS, (K + 1) * P), lambda i, d: (i, d, 0, 0)),
            second_spec,
        ]
        first_args = (aw, bl)
    else:
        ac = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, ac.shape, 1) < na[:, None],
            ac, Ka,
        )
        bc = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, bc.shape, 1) < nb[:, None],
            bc, Kb,
        )
        if ss8:
            subKp = jnp.pad(subK, ((0, 1), (0, 1)), constant_values=POISON8)
            sdt = jnp.int8
        else:
            subKp = jnp.pad(subK, ((0, 1), (0, 1)), constant_values=POISON)
            sdt = dt
        pt = _profile_t(ac, bc, subKp, sdt)  # (Bp, LBt, LA)
        ss = _shear_t(pt)[:, :, :D]  # (Bp, LBt, D): [b, y0, r]
        ss = jnp.pad(ss, ((0, 0), (0, 0), (0, DK * K - D)))
        # pack pairs into lanes: pair (i, s, p) -> chunk i, sublane s,
        # block p
        ss = ss.reshape(nB, BS, P, LBt, DK * K)
        ss = ss.transpose(0, 4, 1, 2, 3).reshape(nB, DK * K, BS, LN)
        ss = ss.reshape(nB, DK, K, BS, LN)
        first_specs = [
            pl.BlockSpec((1, 1, K, BS, LN), lambda i, d: (i, d, 0, 0, 0)),
        ]
        first_args = (ss,)

    na32 = na.astype(jnp.int32)
    nb32 = nb.astype(jnp.int32)
    if inline and P > 1:  # interleaved lanes: l = y0*P + p
        nalane = jnp.broadcast_to(
            na32.reshape(nB, BS, 1, P), (nB, BS, LBt, P)
        ).reshape(nB, 1, BS, LN)
        nblane = jnp.broadcast_to(
            nb32.reshape(nB, BS, 1, P), (nB, BS, LBt, P)
        ).reshape(nB, 1, BS, LN)
    else:
        nalane = jnp.broadcast_to(
            na32.reshape(nB, BS, P, 1), (nB, BS, P, LBt)
        ).reshape(nB, 1, BS, LN)
        nblane = jnp.broadcast_to(
            nb32.reshape(nB, BS, P, 1), (nB, BS, P, LBt)
        ).reshape(nB, 1, BS, LN)
    nabl = jnp.concatenate([nalane, nblane], axis=1)  # (nB, 2, BS, LN)

    nsum = (na32 + nb32).reshape(nB, BS * P)
    drange = jnp.stack([nsum.min(axis=1), nsum.max(axis=1)], axis=1)
    if use_f32 and not is_sw:
        mn_val = -jnp.inf  # true sentinel: saturating, clamp-free
    else:
        mn_val = jnp.asarray(mn, dt)
    scal = jnp.array([gap_open, gap_extend, 0, 0, 0, 0, 0, 0],
                     dtype=dt).at[2].set(mn_val)
    if inline_mm:
        scal = scal.at[3].set(jnp.asarray(match, dt))
        scal = scal.at[4].set(jnp.asarray(mismatch, dt))

    return dict(first_specs=first_specs, first_args=first_args, nabl=nabl,
                drange=drange, scal=scal, B=B, LA=LA, LBt=LBt, P=P, LN=LN,
                D=D, DK=DK, BS=BS, Bp=Bp, nB=nB, Ka=Ka, inline=inline)


def _bake_lut_planes(subK, bc, nb, nB, BS, P, LBt, dt):
    """Per-a-letter VMEM score planes for the in-kernel LUT mode:
    pl[c][lane] = subK[c, b[lane]], with b-pad lanes baked to POISON (pad
    column).  Lane layout matches the inline kernels' packing (interleaved
    when P > 1).  Shared by pallas_scores and pallas_fill_dirs — the
    layout here and the kernels' lane math must stay in lockstep."""
    Ka, Kb = subK.shape
    subKp = jnp.pad(subK, ((0, 0), (0, 1)),
                    constant_values=POISON).astype(dt)
    bcp = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, bc.shape, 1) < nb[:, None],
        bc, Kb,
    )
    pt = subKp[:, bcp]  # (Ka, Bp, LBt)
    pt = pt.reshape(Ka, nB, BS, P, LBt)
    pt = pt.transpose(1, 0, 2, 4, 3) if P > 1 else \
        pt.transpose(1, 0, 2, 3, 4)
    return pt.reshape(nB, Ka, BS, P * LBt)


def _pack_lanes(v, nB, BS, P, ilv):
    """(Bp, LBt) per-pair values -> (nB, BS, LN) in the kernel's lane
    layout (block: pair-contiguous; ilv: interleaved)."""
    LBt = v.shape[1]
    v = v.reshape(nB, BS, P, LBt)
    if ilv:
        v = v.transpose(0, 1, 3, 2)
    return v.reshape(nB, BS, P * LBt)


@functools.partial(
    jax.jit,
    static_argnames=("is_sw", "emit_m", "interpret", "unroll", "bs",
                     "use_f32", "ss8", "inline_mm", "lut_k", "nsg", "neg",
                     "nga", "ngb", "nmm", "chunked"),
)
def pallas_fill_dirs(ac, bc, na, nb, subK, gap_open, gap_extend, mn,
                     *, is_sw: bool, emit_m: bool, interpret: bool = False,
                     unroll: int = 8, bs: int = 128, use_f32: bool = True,
                     ss8: bool = True, inline_mm: bool = False,
                     lut_k: int = 0,
                     match=None, mismatch=None, nsg: bool = False,
                     neg: bool = False, nga: bool = False,
                     ngb: bool = False, nmm: bool = False,
                     chunked: bool = False,
                     x_off=None, bcol=None):
    """Batched full fill with packed direction codes on TPU via Pallas —
    the fast path behind ``dp.fill_batch(emit_dirs=True)`` for default
    scoring flags (other modes use the XLA scan).

    Returns ``(dirs, m, corner)``:
      dirs: (nB, DKK, BS, LN) uint8 lane-packed planes (see
            :func:`unpack_pair_plane` for per-pair extraction);
      m:    same layout int32 M-matrix values (SW candidates), or None;
      corner: (B, 3) int32 — M/Ga/Gb at (nb, na) per pair (NW), or None.
    """
    if nmm:
        assert inline_mm, "no_mismatches needs the inline equality mode"
    if nga or ngb:
        assert inline_mm or lut_k > 0, \
            "no-gaps modes need an in-kernel scoring mode"
    B, LA = ac.shape
    _, LBt = bc.shape
    dt = jnp.float32 if use_f32 else jnp.int32
    K = unroll
    if chunked:
        assert inline_mm or lut_k > 0, \
            "chunked Pallas fills require in-kernel scoring"
        x_off32 = jnp.asarray(x_off, jnp.int32).reshape(1)
    st = _stage_kernel_inputs(
        ac, bc, na, nb, subK, gap_open, gap_extend, mn, dt=dt, K=K, bs=bs,
        is_sw=is_sw, use_f32=use_f32, ss8=ss8, inline_mm=inline_mm,
        lut_k=lut_k, match=match, mismatch=mismatch,
        x_off=x_off32 if chunked else None,
    )
    BS, P, LN, DK, Bp, nB = (st["BS"], st["P"], st["LN"], st["DK"],
                             st["Bp"], st["nB"])
    inline = st["inline"]
    kernel = functools.partial(
        _dirs_kernel, is_sw=is_sw, emit_m=emit_m, BS=BS, LBt=LBt, P=P, K=K,
        DK=DK, dt=dt, inline_mm=inline_mm, lut_k=lut_k, nsg=nsg, neg=neg,
        nga=nga, ngb=ngb, nmm=nmm,
        chunked=chunked, LA=LA,
    )
    mshape = (nB, DK, K, BS, LN) if emit_m else (1, 1, 1, 8, 128)
    mmap = ((lambda i, d: (i, d, 0, 0, 0)) if emit_m
            else (lambda i, d: (0, 0, 0, 0, 0)))
    first_specs = list(st["first_specs"])
    first_args = st["first_args"]
    scratch = [pltpu.VMEM((BS, LN), dt)] * 12
    if inline:
        scratch = scratch + [pltpu.VMEM((BS, LN), jnp.int32)]
        if chunked:
            first_specs.append(
                pl.BlockSpec((1, 6, BS, LN), lambda i, d: (i, 0, 0, 0)))
            first_args = first_args + (bcol,)
            scratch = scratch + [pltpu.VMEM((BS, LN), dt)] * 3
    mid_specs = [
        pl.BlockSpec((1, 2, BS, LN), lambda i, d: (i, 0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    mid_args = (st["nabl"], st["drange"], st["scal"])
    out_specs = [
        pl.BlockSpec((1, 1, K, BS, LN), lambda i, d: (i, d, 0, 0, 0)),
        pl.BlockSpec((1, 1, 1 if not emit_m else K, 8 if not emit_m
                      else BS, 128 if not emit_m else LN), mmap),
        pl.BlockSpec((1, 3, BS, LN), lambda i, d: (i, 0, 0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nB, DK, K, BS, LN), jnp.uint8),
        jax.ShapeDtypeStruct(mshape, jnp.int32),
        jax.ShapeDtypeStruct((nB, 3, BS, LN), dt),
    ]
    if chunked:
        mid_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        mid_args = mid_args + (x_off32,)
        out_specs.append(pl.BlockSpec((1, 3, BS, LN),
                                      lambda i, d: (i, 0, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((nB, 3, BS, LN), dt))
    outs = pl.pallas_call(
        kernel,
        grid=(nB, DK),
        in_specs=first_specs + mid_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*first_args, *mid_args)
    if chunked:
        dirs, m, corn, bout = outs
    else:
        dirs, m, corn = outs
        bout = None
    dirs = dirs.reshape(nB, DK * K, BS, LN)
    m_out = m.reshape(nB, DK * K, BS, LN) if emit_m else None
    corner = None
    if not is_sw:
        INT_MIN32 = jnp.int32(np.iinfo(np.int32).min)
        if inline and P > 1:
            c = corn.reshape(nB, 3, BS, LBt, P)
            if dt == jnp.float32:
                c = jnp.where(jnp.isinf(c), jnp.float32(INT_MIN32), c)
            c = c.max(axis=3)  # only lane nb-1 was ever written per pair
        else:
            c = corn.reshape(nB, 3, BS, P, LBt)
            if dt == jnp.float32:
                c = jnp.where(jnp.isinf(c), jnp.float32(INT_MIN32), c)
            c = c.max(axis=4)
        corner = (c.transpose(0, 2, 3, 1).reshape(Bp, 3)[:B]
                  .astype(jnp.int32))
    if chunked:
        return dirs, m_out, corner, bout
    return dirs, m_out, corner


@functools.partial(jax.jit, static_argnames=("SH", "is_sw", "nsg"))
def _next_bcol(bout, x_next, gap_open, gap_extend, mn_val, *, SH, is_sw,
               nsg):
    """Compose the next chunk's bcol input from the emitted boundary
    column: rows 0-2 = bout (lane y0 -> y = y0+1), rows 3-5 the SH-lane
    shift with the (0, x_next) row-0 corner entering (alignment.c:59-81)."""
    nB, _, BS, LN = bout.shape
    dt = bout.dtype
    if is_sw:
        cm = cga = cgb = jnp.zeros((), dt)
    else:
        cm = cga = jnp.asarray(mn_val, dt)
        run = (jnp.zeros((), dt) if nsg
               else (gap_open + x_next * gap_extend).astype(dt))
        cgb = run

    def sh(v, c):
        head = jnp.broadcast_to(jnp.asarray(c, dt), (nB, BS, SH))
        return jnp.concatenate([head, v[:, :, : LN - SH]], axis=-1)

    shifted = jnp.stack(
        [sh(bout[:, 0], cm), sh(bout[:, 1], cga), sh(bout[:, 2], cgb)],
        axis=1)
    return jnp.concatenate([bout, shifted], axis=1)


def fill_dirs_long(ac, bc, na, nb, gap_open, gap_extend, mn, *,
                   is_sw: bool, emit_m: bool, match, mismatch,
                   chunk: int = 2048, nsg: bool = False, neg: bool = False,
                   use_f32: bool = True, interpret: bool = False,
                   bs: int = 8, unroll: int = 8, extract_min=None,
                   subK=None, lut_k: int = 0):
    """Long-sequence Pallas traceback fill: seq_a chunked into ``chunk``
    columns, the boundary column carried ON DEVICE between chunk fills
    (the XLA ``dp.fill_chunked``'s fast analog for in-kernel scoring —
    compact_inputs_mm codes for equality configs, or per-side
    compact_inputs codes + ``subK``/``lut_k`` for small-alphabet matrix
    scoring: the LUT planes are b-indexed, so they are identical across
    a-chunks; lanes still bound |b| <= ~8192).

    Returns ``(dirs_chunks, m_part, corner, geo)``:
      dirs_chunks: per-chunk packed (nB, DKK, BS, LN) uint8 host arrays
        (local-diagonal layout; unpack with :func:`unpack_pair_plane`);
      m_part: with ``extract_min``, per-pair merged (flats, scores)
        candidate lists (M never fetched); else per-chunk packed int32
        host arrays, or None;
      corner: (B, 3) int32 (NW), else None; geo: pack_geometry dict.
    """
    from . import dp  # host-side helpers (no cycle at import time)

    B, LAfull = ac.shape
    _, LBt = bc.shape
    CA = chunk
    nchunks = max(1, -(-LAfull // CA))
    geo = pack_geometry(CA, LBt, bs=bs, inline=True)
    P, BS = geo["P"], geo["BS"]
    SHl = P if geo["ILV"] else 1
    Bp = -(-B // (BS * P)) * (BS * P)
    dt = jnp.float32 if use_f32 else jnp.int32
    mn_val = (-np.inf if (use_f32 and not is_sw) else float(mn))

    ac = np.pad(np.asarray(ac), ((0, Bp - B), (0, nchunks * CA - LAfull)))
    bc = np.pad(np.asarray(bc), ((0, Bp - B), (0, 0)))
    na_p = np.pad(np.asarray(na), (0, Bp - B), constant_values=1)
    nb_p = np.pad(np.asarray(nb), (0, Bp - B), constant_values=1)
    naj, nbj = jnp.asarray(na_p), jnp.asarray(nb_p)
    bcj = jnp.asarray(bc)

    # initial bcol: the x = 0 closed-form column (alignment.c:51-81)
    y = np.arange(LBt + 1, dtype=np.float64)
    if is_sw:
        colM = colGa = colGb = np.zeros(LBt + 1)
    else:
        runy = np.zeros(LBt + 1) if nsg else gap_open + y * gap_extend
        colM = np.where(y == 0, 0.0, mn_val)
        colGa = np.where(y == 0, 0.0, runy)
        colGb = np.where(y == 0, 0.0, mn_val)
    nBc = Bp // (BS * P)

    def pack(col_slice):
        v = np.broadcast_to(col_slice, (Bp, LBt)).astype(
            np.float32 if use_f32 else np.int32)
        return np.asarray(_pack_lanes(jnp.asarray(v), nBc, BS, P,
                                      geo["ILV"]))

    rows = [pack(c[1:]) for c in (colM, colGa, colGb)]
    rows += [pack(c[:LBt]) for c in (colM, colGa, colGb)]
    bcol = jnp.asarray(np.stack(rows, axis=1))  # (nB, 6, BS, LN)

    dirs_chunks = []
    m_chunks = []
    cands = [([], []) for _ in range(B)] if extract_min is not None else None
    corner = None
    godt, gedt = jnp.asarray(gap_open, dt), jnp.asarray(gap_extend, dt)
    subKj = (jnp.asarray(subK) if lut_k > 0
             else np.zeros((8, 8), np.int32))
    for c in range(nchunks):
        acc = jnp.asarray(ac[:, c * CA:(c + 1) * CA])
        dirs, m, corner_c, bout = pallas_fill_dirs(
            acc, bcj, naj, nbj, subKj,
            gap_open, gap_extend, mn, is_sw=is_sw, emit_m=emit_m,
            inline_mm=lut_k == 0, lut_k=lut_k, chunked=True,
            x_off=np.int32(c * CA),
            bcol=bcol, match=match, mismatch=mismatch, nsg=nsg, neg=neg,
            use_f32=use_f32, interpret=interpret, bs=bs, unroll=unroll,
        )
        dirs_chunks.append(np.asarray(dirs))
        if emit_m:
            if extract_min is not None:
                # trim the K-padded plane depth to this chunk's true
                # diagonal count: the harvest derives the slab's x extent
                # from the depth (dp._sw_cand_geometry LA = D - LBp + 2),
                # and na here is GLOBAL, so padded columns past the chunk
                # boundary would otherwise pass the validity mask and be
                # harvested as garbage candidates
                planes = packed_to_pair_planes(
                    m, BS, P, LBt, ilv=geo["ILV"])[:B, : CA + LBt - 1]
                for i, (fl, sv) in enumerate(dp.sw_extract_candidates(
                        planes, na, nb, extract_min, x_off=c * CA)):
                    cands[i][0].append(fl)
                    cands[i][1].append(sv)
            else:
                m_chunks.append(np.asarray(m))
        if corner_c is not None:
            cc = np.asarray(corner_c)[:B]
            corner = cc if corner is None else np.maximum(corner, cc)
        if c + 1 < nchunks:
            bcol = _next_bcol(bout, jnp.asarray((c + 1) * CA, dt), godt,
                              gedt, mn_val, SH=SHl, is_sw=is_sw, nsg=nsg)

    if extract_min is not None:
        m_part = [(np.concatenate(f), np.concatenate(s)) for f, s in cands]
    elif emit_m:
        m_part = m_chunks
    else:
        m_part = None
    return dirs_chunks, m_part, corner, geo


def pack_geometry(LA: int, LBt: int, bs: int = 128,
                  inline: bool = False) -> dict:
    """Lane-packing geometry shared by the kernels and host-side unpackers.
    ``inline`` selects the inline-mm path's interleaved lane layout when
    P > 1 (lane l = pair l % P at y0 = l // P)."""
    P = max(1, TL // LBt)
    if P > 1 and (LBt & (LBt - 1)) != 0:
        P = 1
    return dict(P=P, LN=P * LBt, D=LA + LBt - 1, BS=min(bs, 128),
                ILV=bool(inline and P > 1))


def packed_to_pair_planes(planes, BS: int, P: int, LBt: int,
                          ilv: bool = False):
    """Device-side batch unpack: lane-packed (nB, DKK, BS, LN) kernel
    output -> per-pair skewed (Bp, DKK, LBt+1) planes (dummy lane 0, pair
    order (i, s, p) — the same as :func:`unpack_pair_plane`).  Pure
    reshape/transpose/pad, so the planes stay on device — the SW candidate
    harvest (`dp.sw_extract_candidates`) can then run without ever fetching
    the M matrix to host."""
    nB, DKK, _, LN = planes.shape
    if ilv:
        x = planes.reshape(nB, DKK, BS, LBt, P).transpose(0, 2, 4, 1, 3)
    else:
        x = planes.reshape(nB, DKK, BS, P, LBt).transpose(0, 2, 3, 1, 4)
    x = x.reshape(nB * BS * P, DKK, LBt)
    return jnp.pad(x, ((0, 0), (0, 0), (1, 0)))


def unpack_pair_plane(planes: np.ndarray, j: int, BS: int, P: int,
                      LBt: int, D: int, ilv: bool = False) -> np.ndarray:
    """Extract pair ``j``'s skewed (D, LBt+1) plane (lane = y, dummy lane 0)
    from a lane-packed (nB, DKK, BS, LN) kernel output — host-side numpy,
    matching ``dp.dp_fill``'s per-pair dirs/mmat layout.  ``ilv`` selects
    the interleaved layout (pair p at lanes p, p+P, p+2P, ...)."""
    i, r = divmod(j, BS * P)
    s, p = divmod(r, P)
    if ilv:
        sl = planes[i, :D, s, p::P]
    else:
        sl = planes[i, :D, s, p * LBt:(p + 1) * LBt]
    out = np.empty((D, LBt + 1), dtype=planes.dtype)
    out[:, 1:] = sl
    out[:, 0] = 0
    return out
