"""Pallas TPU wavefront kernel v2: chained, drift-removed scores fill.

Round-3 rework of the scores-only kernel (``pallas_dp.pallas_scores``)
attacking its two measured structural costs on TPU v5e:

* **Anti-diagonal ramp waste.**  A single pair swept over D = LA+LBt-1
  diagonals keeps only ~LA*LBt / (D*LBt) ~= 50% of lane-slots on real
  cells.  v2 **chains C pairs along the a-axis** in each lane row: the
  row sweeps one long composite band of C*W + LBt diagonals (W ~= LA+1),
  and each pair's x=0 boundary column is *injected* at its chunk border
  exactly like the single-pair kernel injects the global x=0 column —
  the wavefront never drains between pairs, so lane utilization rises to
  C*LA / (C*W + LBt) (~89% at C=8, L=512).  The per-lane b-codes (and
  NW capture metadata) ride along: they transition lane-by-lane at the
  same boundary mask the state injection already computes, fed from
  per-chunk input blocks.

* **Per-cell op count.**  Two algebraic rewrites, both exact:

  - **drift removal**: track X'(d) = X(d) - ge*d.  The gap-extend adds
    vanish (E' = max(H'+go, E'), F' = max(H'+go, F')) and the row-0
    boundary gap runs become per-chunk *constants*;
  - **G-folding**: track G = H' + go instead of H'.  The two H+go
    summands (one shifted, one not) collapse into G computed once, and
    the M-predecessor add folds into the match/mismatch constants
    (MT = match - 2*ge - go, MM likewise).

  Per-diagonal vector work drops from 5 adds + 4 maxes to 2 adds +
  4 maxes (NW) before boundary selects.  Exactness: all values are
  integers; the f32 caller gate (:func:`f32_safe2`) bounds |value| +
  |drift| + |POISON| under 2**24 where f32 integer arithmetic is exact.

Recurrence source: /root/reference/src/alignment.c:89-167 (Gotoh, with
gop = gap_open + gap_extend per alignment.c:38-39); boundary closed
forms alignment.c:51-81.  Scores reduction H = max(M,Ga,Gb) as in
``pallas_dp`` (module docstring there proves it for gap_open <= 0).

Scoring modes: in-kernel equality (``compact_inputs_mm`` codes) or
packed-LUT (small-alphabet substitution matrices: per-b-lane score
bytes packed 4-per-int32 into ceil(Ka/4) planes, selected by a bit-tree
over the rolling a-codes then byte-extracted — ~2x fewer vector ops
than the v1 per-letter select chain, and it keeps working across chain
transitions because the planes ride the same boundary select as the
state).

Recurrence modes (since round 4, commit f1024f2): default flags plus
``nsg`` (free start gaps), ``neg`` (free end gaps), ``nga``/``ngb``
(no-gaps constraints) and ``nmm`` (no mismatches, equality scoring
only) — routed here by ``aligners._v2_scores_eligible``.  What still
rides the v1 kernels (ops/pallas_dp.py): large-alphabet plane
streaming, the both-no-gaps int32 sentinel-parity path, SW with
neg/nga/ngb constraints, and widths past the measured envelope
(lb > 10240 for scores since round 5; lb > 4096 for dirs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dp import PADA, PADB, POISON, TL

NEG = float(np.float32(-np.inf))


def f32_safe2(sc, LA, LBt, C, W) -> bool:
    """f32 bit-exactness gate for the chained kernel: every DP value,
    drift term, G-fold, and poisoned intermediate must be an integer of
    magnitude < 2**24.  Conservative bound over the composite band of
    D_last ~= C*W + LBt diagonals."""
    D = C * W + LBt + 2
    tmn, tmx = sc.true_penalty_bounds()
    mp = max(abs(tmn), abs(tmx), abs(sc.gap_open) + abs(sc.gap_extend), 1)
    bound = (LA + LBt + 2) * mp + 2 * abs(sc.gap_open) \
        + 2 * abs(sc.gap_extend) * D
    return bound + (1 << 22) < (1 << 23)


def lut2_planes(Ka: int) -> int:
    """Packed-LUT plane count for an a-alphabet of Ka letters (0 = mode
    unavailable): 4 scores per int32 plane, ceil(Ka/4) planes up to 8.
    Non-pow2 counts are fine — the select tree passes the odd node
    through a level (6 planes = 5 selects vs 8 planes' 7, and two fewer
    VMEM planes; BLOSUM/PAM's 24 letters land exactly there)."""
    np_ = -(-Ka // 4)
    return np_ if np_ <= 8 else 0


def m16_safe(sc, LA, LBt) -> bool:
    """Gate for int16 SW M-plane emission (``pallas_fill_dirs2``
    m_i16): every undrifted SW M value lies in [0, bound] — the
    reference floors each channel at min=0 (alignment.c:112-115) and
    the kernel's poisoned pad cells floor to the same sd — so int16 is
    bit-exact whenever the best possible score fits."""
    _, tmx = sc.true_penalty_bounds()
    return max(int(tmx), 0) * min(LA, LBt) < 32000


def lut2_eligible(sc, subK) -> int:
    """Packed-LUT mode gate -> plane count (0 = ineligible).  The b-pad
    bake (-128 byte) keeps pad cells below any real cell only while
    per-step gap improvements can't exceed the 128 margin over real
    scores; every shipped matrix + sane gap config passes."""
    if np.abs(np.asarray(subK)).max(initial=0) > 127:
        return 0
    if 2 * abs(sc.gap_extend) + abs(sc.gap_open) >= 96:
        return 0
    return lut2_planes(int(subK.shape[0]))


def chain_geometry(B, LA, LBt, *, K=16, chain=0, bs=0, state_bytes=60,
                   lut_np=0):
    """Lane/chain geometry: P = lane-packed pairs per row (interleaved),
    C pairs chained along a per slot, BS sublanes per grid row-chunk.
    ``chain``/``bs`` 0 = auto.  W >= LBt is required so at most one
    chunk's transition band is active per diagonal.  ``lut_np`` (packed-
    LUT plane count) must match the kernel call so the auto choices
    account for the extra VMEM planes — callers that unpack the output
    layout must pass the same value."""
    P = max(1, TL // LBt)
    if P > 1 and (LBt & (LBt - 1)) != 0:
        P = 1
    LN = P * LBt
    # one extra K-block of a-pad per chunk: guarantees W - na >= K + 1 for
    # every pair, so the per-BLOCK early updates of the b-code / capture-
    # diagonal planes in the kernels can never clobber a value still read
    # in the same block (pair c-1's last real-code read or capture is
    # always >= K diagonals before pair c's transition band hits the lane)
    W = -(-max(LA + 1, LBt) // K) * K + K
    if chain <= 0:
        # Round-4 retune (interleaved same-process ranking, B=256): at
        # LBt=512, C=4/BS=64 stays best; short rows flip — the chain's
        # transition band is grid-overhead-bound there, so LBt<=128 runs
        # unchained (C=1: 55.7 vs 43.7 GCUPS at L=128) and LBt<=256 at
        # C=2 (77.5 vs 67.9-71.2).  Deeper chains shrink the sublane
        # chunk below the issue-efficiency knee (C=8/BS=32: 84 vs 104).
        cap = 1 if LBt <= 128 else (2 if LBt <= 256 else 4)
        if lut_np >= 4:
            # big packed-LUT modes (protein alphabets): deep chains only
            # pay off while the batch keeps >=64 sublanes per chunk —
            # C=2/BS=64 measured 47-55 GCUPS vs C=4/BS=32's 44-48 at
            # B=128 (round 4), but C=4/BS=64 measured best at B=256
            # (51.0 vs C=2's 49.7, round-5 same-process A/B)
            cap = min(cap, max(2, B // (P * 64)))
        chain = max(1, min(cap, B // (P * 32)))
    C = chain
    if bs <= 0:
        need = -(-B // (P * C))
        # VMEM residency: state planes + in/out blocks per sublane-lane
        # (scores ~60 B, dirs ~140 B with its 9+ planes and K-deep outs;
        # packed-LUT planes add 4*lut_np B/lane).  Wide rows (LN > 4096,
        # the 1-10kb regime) take a half budget: bs=16 at LN=6144-8192
        # measured 22-28 GCUPS (VMEM spill) vs bs=8's 72-78
        budget = (8 << 20) if LN <= 4096 else (4 << 20)
        cap = max(8, budget // (LN * (state_bytes + 4 * lut_np)))
        while cap & (cap - 1):
            cap &= cap - 1
        bs = 8
        while bs < min(128, cap, need):
            bs *= 2
    BS = min(128, bs)
    nB = -(-B // (BS * P * C))
    m = W // K
    # block t sweeps diagonals [t*K + 1, t*K + K]: chunk c's transition
    # band [c*W + 1, c*W + LBt] then lies entirely within its own blocks
    # t in [c*m, c*m + bb]
    bb = (LBt - 1) // K
    D_last = (C - 1) * W + LA + LBt
    DK = -(-D_last // K)
    SLOTS = (DK - 1) // m + 1
    return dict(P=P, LN=LN, W=W, C=C, BS=BS, nB=nB, m=m, bb=bb, DK=DK,
                SLOTS=SLOTS, K=K, D_last=D_last, ILV=P > 1)


def _lut_tree(plv, avv, lut_np):
    """Select the packed plane for each lane's current a-letter: binary
    tree over the high bits of the code (ceil(log2(lut_np)) select
    levels; a non-pow2 plane count passes its odd node through — codes
    only ever index real planes, so the phantom sibling is never
    selected), then extract the letter's byte (code & 3) and un-bias."""
    hi = avv >> 2
    ps = [plv[i] for i in range(lut_np)]
    bit = 1
    while len(ps) > 1:
        sel = (hi & bit) != 0
        ps = [jnp.where(sel, ps[i + 1], ps[i]) if i + 1 < len(ps)
              else ps[i]
              for i in range(0, len(ps), 2)]
        bit <<= 1
    byte = (ps[0] >> ((avv & 3) << 3)) & 0xFF
    return byte - 0x80


def _kernel2(*refs, is_sw, BS, LBt, P, K, W, m, bb, C, nsg, neg, nga,
             ngb, lut_np, cf32):
    """Grid (nB, DK); diagonals d = t*K + 1 .. t*K + K per step t.

    Scratch state (all (BS, LN)): SG1 = sh(G(d-1)), SG2 = sh(G(d-2)),
    SE = sh(E'(d-1)), G_u/F_u unshifted, acc0/acc1 (NW: parity capture
    planes; SW: snapshot plane / running accumulator), av rolling
    a-codes, blv per-lane b-codes (eq mode) or pls packed LUT planes,
    cdv0/cdv1 per-lane capture diagonals (NW).

    ``neg`` (free END gaps, NW only) switches the Ga updates on each
    pair's last a-column and the Gb updates on its last b-row to the
    penalty-free closed forms (alignment.c:121-155 x==n / y==m
    branches): in drift space a zero-cost true extension ADDS -ge per
    step, so ê = sh(Ĥ(d-1)) - ge = SG1 - (go + ge) on the sweeping
    x==na lane (mask from the streamed per-lane na plane) and
    f̂ = G_u - (go + ge) on the y==nb-1 lane (mask: cdv != 0 — the
    capture-diagonal plane is nonzero exactly there)."""
    lut = lut_np > 0
    ncol = neg or nga  # modes needing the rolling x==na diagonal plane
    swcd = is_sw and (neg or ngb)  # SW last-b-row marker plane needed
    if is_sw:
        rs = list(refs)
        aw_ref, bl_ref = rs[0], rs[1]
        i = 2
        if swcd:
            cd_ref = rs[i]
            i += 1
        if ncol:
            nl_ref = rs[i]
            i += 1
        (scal_ref, out_ref,
         sg1, sg2, se, gu, fu, acc0, acc1, av, bls) = rs[i:i + 11]
        i += 11
        if swcd:
            cdv = rs[i]
            i += 1
        if ncol:
            ncv = rs[i]
    elif ncol:
        (aw_ref, bl_ref, cd_ref, capg_ref, nl_ref, scal_ref, out_ref,
         sg1, sg2, se, gu, fu, acc0, acc1, av, bls, cdv, ncv) = refs
    else:
        (aw_ref, bl_ref, cd_ref, capg_ref, scal_ref, out_ref,
         sg1, sg2, se, gu, fu, acc0, acc1, av, bls, cdv) = refs
    f32 = jnp.float32
    i32 = jnp.int32
    # codes + capture metadata dtype: int32 vs f32 measured within ~5%
    # of each other (same-process A/B); int32 is the default, the f32
    # variant is kept behind codes_f32 for tuning.  The lut bit-tree
    # always needs int32 codes/planes.
    cdt = i32 if (lut_np > 0 or not cf32) else f32
    ib = pl.program_id(0)
    t = pl.program_id(1)
    d0 = t * K + 1
    c = t // m  # chunk (pair-chain slot) of this block
    lt = t - c * m
    cW = c * W
    go = scal_ref[0]
    ge = scal_ref[1]
    MT = scal_ref[2]  # match - 2*ge - go (eq) / -2*ge - go (lut bias)
    MM = scal_ref[3]
    LN = P * LBt
    SH = P
    lane = jax.lax.broadcasted_iota(i32, (BS, LN), 1)
    y0 = lane // P if P > 1 else lane
    y0c = y0.astype(f32) if cf32 else y0  # lane index in the mask dtype
    bstart = y0 == 0

    def shift(v, fillv):
        return jnp.concatenate(
            [jnp.full((BS, SH), fillv, v.dtype), v[:, : LN - SH]], axis=1)

    def sdrift(d):
        return -ge * jnp.asarray(d, i32).astype(f32)

    @pl.when(t == 0)
    def _init():
        # state entering diagonal 1: nothing computed yet — the whole x=0
        # boundary column arrives via the chunk-0 at_t injections (lane y0
        # at d = y0 + 1), and the only pre-existing value is the (0,0)
        # corner (H = 0, both SW and NW) entering as the SG1 lane-0 fill:
        # G(0,0) = 0 + go with zero drift at d = 0
        ninf = jnp.full((BS, LN), NEG, f32)
        av[...] = jnp.full((BS, LN), PADA, cdt)
        bls[...] = bl_ref[0, 0]
        gu[...] = ninf
        fu[...] = ninf
        sg1[...] = jnp.where(bstart, go, NEG)
        se[...] = ninf
        sg2[...] = ninf
        if (not is_sw) or swcd:
            cdv[...] = cd_ref[0, 0]
        if ncol:
            ncv[...] = nl_ref[0, 0]
        acc0[...] = ninf
        acc1[...] = ninf

    def sweep(trans: bool, cap: bool):
        SG1, SG2, SE = sg1[...], sg2[...], se[...]
        G_u, F_u = gu[...], fu[...]
        a0v, a1v = acc0[...], acc1[...]
        avv = av[...]
        win = aw_ref[0, 0]
        blvv = bls[...]
        if trans:
            bin_ = bl_ref[0, 0]
        has_cd = (not is_sw) or swcd  # cdv plane exists for this variant
        if has_cd and (cap or neg or ngb or (trans and not is_sw)):
            cdvv = cdv[...]
            if trans:
                cdin = cd_ref[0, 0]
        if ncol:
            ncvv = ncv[...]
        if trans:
            # per-BLOCK early updates (safe because chain_geometry pads W
            # by one K-block): the per-lane b-codes and NW capture
            # diagonals switch once per block instead of once per
            # diagonal.  Pre-transition reads within the block are benign
            # — the entering a-codes there are already PADA (W - na >= K
            # + 1), so eq-mode ss is MM either way, the lut bytes feed
            # values suppressed at the transition, and pair c-1's capture
            # can never share a block with pair c's band hitting its lane.
            lo = jnp.asarray(d0 - 1 - cW, i32)
            lov = lo.astype(f32) if cf32 else lo
            band = (y0c >= lov) & (y0c <= lov + K - 1)
            if lut:
                blvv = jnp.where(band[None], bin_, blvv)
            else:
                blvv = jnp.where(band, bin_, blvv)
            if has_cd:
                cdvv = jnp.where(band, cdin, cdvv)
            if ncol:
                ncvv = jnp.where(band, nl_ref[0, 0], ncvv)
        if neg or ngb:
            # pre-transition cells in a transition block are pair c-1
            # PADs (the W hazard margin), so the band-updated rolling
            # planes are exact for the whole block
            negb = cdvv != 0  # cd plane is nonzero exactly at lane nb-1
        if neg:
            gog = go + ge
        for k in range(K):
            d = d0 + k
            if lut:
                ss = _lut_tree(blvv, avv, lut_np).astype(f32) + MT
                if is_sw:
                    ss = jnp.where(avv >= PADA, jnp.asarray(POISON, f32),
                                   ss)
            else:
                ss = jnp.where(avv == blvv, MT, MM)
                if is_sw:
                    ss = jnp.where(avv + blvv >= PADA,
                                   jnp.asarray(POISON, f32), ss)
            e_new = jnp.maximum(SG1, SE)
            f_new = jnp.maximum(G_u, F_u)
            m_arg = SG2 + ss
            if is_sw:
                # SW zero floor, folded: clamping e/f each to sd and
                # taking h = max(m, e_c, f_c) equals clamping h once
                # (max distributes), and the un-clamped E/F STATES stay
                # exact because sd grows by |ge| per diagonal, so the
                # next diagonal's fresh floor dominates any stale floor
                # a clamped state would have carried — one VPU op less
                # per cell on the hot path
                sd = sdrift(d)
                m_arg = jnp.maximum(m_arg, sd)
            if ncol:
                dfn = jnp.asarray(d, i32)
                if cf32:
                    dfn = dfn.astype(f32)
                negcol = ncvv == dfn
            if neg:
                # free-end-gap closed forms on the last a-column /
                # b-row (alignment.c:121-155): Ga(y, na) = H(y-1, na),
                # Gb(nb, x) = H(nb, x-1) — in drift space -ge per step
                e_new = jnp.where(negcol, SG1 - gog, e_new)
                f_new = jnp.where(negb, G_u - gog, f_new)
            if nga and not trans:
                # no_gaps_in_a: the Ga channel is unreachable except on
                # the last a-column (end-gap exception,
                # alignment.c:121-137); x==0 boundary cells only occur
                # in trans blocks (kept there via the at_t mask)
                e_new = jnp.where(negcol, e_new, NEG)
            if ngb:
                # no_gaps_in_b: Gb unreachable except on the last b-row;
                # the trans f-cleanse writes NEG at x==0 lanes anyway
                f_new = jnp.where(negb, f_new, NEG)
            if trans:
                # Boundary injection, restructured from three per-channel
                # selects (g/e/f) to at most two:
                # * default NW: e needs NO injection — it propagates
                #   NATURALLY: lane y0-1 held (g, e) = (rc+go, rc) at
                #   d-1 (induction; base = the d == cx*W corner fill), so
                #   e_new[y0] = max(rc+go, rc) = rc = the old e_sel.
                # * nsg/SW: the boundary e closed form is diagonal-
                #   dependent (sd = -ge*d), one step above the natural
                #   value — inject it.
                # * m/f garbage from the drained pair c-1 band is
                #   suppressed by ONE select on h below (h := e at the
                #   transition lane, so g = e + go = the old g_sel); the
                #   f STATE is cleansed to NEG so it cannot leak into
                #   pair c's x'=1 cells (SW's old f_sel = sd is restored
                #   one diagonal later by the sd floor — exact).
                att_s = jnp.asarray(d - 1 - cW, i32)
                at_t = y0c == (att_s.astype(f32) if cf32 else att_s)
                if nga:
                    # keep the x==0 boundary run (unconditional in the
                    # reference, alignment.c:59-81) and the last column
                    e_new = jnp.where(negcol | at_t, e_new, NEG)
                if is_sw or nsg:
                    e_new = jnp.where(at_t, sdrift(d), e_new)
                f_new = jnp.where(at_t, NEG, f_new)
            h_new = jnp.maximum(m_arg, jnp.maximum(e_new, f_new))
            if trans:
                h_new = jnp.where(at_t, e_new, h_new)
            if is_sw:
                a1v = jnp.maximum(a1v - ge, m_arg)
            g_new = h_new + go
            if trans and is_sw:
                a0v = jnp.where(at_t, a1v, a0v)  # snapshot pair c-1
                a1v = jnp.where(at_t, NEG, a1v)  # reset for pair c
            if cap:
                df = jnp.asarray(d, i32)
                if cf32:
                    df = df.astype(f32)
                a0v = jnp.where(cdvv == df, h_new, a0v)
                a1v = jnp.where(cdvv == -df, h_new, a1v)
            # shift fills: lane 0 enters cell (0, x=d) of chunk x // W
            if is_sw:
                gfill = sdrift(d) + go
                efill = sdrift(d)
            else:
                efill = NEG
                if nsg:
                    gfill = go + sdrift(d)
                else:
                    cx = jnp.asarray(d, i32) // W
                    base = go - ge * (cx * W).astype(f32)
                    # x' = 0 (pair corner (0,0)): H = 0, not the gap run
                    gfill = jnp.where(jnp.asarray(d, i32) == cx * W,
                                      base, base + go)
            SG2 = SG1
            SG1 = shift(g_new, gfill)
            SE = shift(e_new, efill)
            G_u, F_u = g_new, f_new
            avv = jnp.concatenate(
                [win[:, (k + 1) * SH: (k + 2) * SH], avv[:, : LN - SH]],
                axis=1)
        sg1[...], sg2[...], se[...] = SG1, SG2, SE
        gu[...], fu[...] = G_u, F_u
        acc0[...], acc1[...] = a0v, a1v
        av[...] = avv
        bls[...] = blvv
        if trans and has_cd:
            cdv[...] = cdvv
        if trans and ncol:
            ncv[...] = ncvv

    # NW cdv transitions must run even in blocks with no capture hit, and
    # captures can fire outside the band — four specializations, each
    # tracing only the work it needs (the cdv WRITE branch in sweep() only
    # changes under trans, so the no-trans+cap branch re-reads but never
    # writes cdv — correct because transitions only happen in-band).
    # trailing blocks (t >= C*m, the last chunk's lower-right tail) have no
    # further chunk: no transitions may fire there
    in_band = (lt <= bb) & (c < C)
    if is_sw:
        @pl.when(in_band)
        def _tr():
            sweep(True, False)

        @pl.when(jnp.logical_not(in_band))
        def _no():
            sweep(False, False)
    else:
        capb = capg_ref[ib, t] != 0

        @pl.when(in_band & capb)
        def _tc():
            sweep(True, True)

        @pl.when(in_band & jnp.logical_not(capb))
        def _t():
            sweep(True, False)

        @pl.when(jnp.logical_not(in_band) & capb)
        def _c():
            sweep(False, True)

        @pl.when(jnp.logical_not(in_band) & jnp.logical_not(capb))
        def _n():
            sweep(False, False)

    @pl.when((lt == m - 1) | (t == pl.num_programs(1) - 1))
    def _flush():
        out_ref[0, 0, 0] = acc0[...]
        out_ref[0, 0, 1] = acc1[...]


def _pack_ilv2(v, nB, BS, P, C, LBt):
    """(Bp, LBt) per-pair rows -> (nB, C, BS, LN) in the chained ilv lane
    layout: pair (i, s, p, c) at block (i, c), sublane s, lanes p::P."""
    x = v.reshape(nB, BS, P, C, LBt).transpose(0, 3, 1, 4, 2)
    return x.reshape(nB, C, BS, P * LBt)


def _stage2(ac, bc, na, nb, geo, *, is_sw, subK=None, lut_np=0,
            cf32=True, neg=False, need_cd=False):
    """jnp staging for :func:`pallas_scores2` (runs under jit): chained
    a-windows, per-chunk b/capture blocks, capture-gate table.
    ``need_cd`` forces the per-lane cd plane for SW constrained modes
    (they only use its nonzero-at-lane-nb-1 property, not the capture
    values); the capture gate table stays NW-only."""
    B, LA = ac.shape
    _, LBt = bc.shape
    P, C, BS, nB, W, K, DK = (geo["P"], geo["C"], geo["BS"], geo["nB"],
                              geo["W"], geo["K"], geo["DK"])
    Bp = nB * BS * P * C
    if Bp != B:
        pad = Bp - B
        ac = jnp.pad(ac, ((0, pad), (0, 0)))
        bc = jnp.pad(bc, ((0, pad), (0, 0)))
        na = jnp.pad(na, (0, pad), constant_values=1)
        nb = jnp.pad(nb, (0, pad), constant_values=1)
    na = na.astype(jnp.int32)
    nb = nb.astype(jnp.int32)

    # codes may arrive uint8 (compact_inputs_mm returns raw folded
    # bytes): widen BEFORE the PADA/PADB sentinel injection (2^20 wraps
    # in uint8)
    ac = ac.astype(jnp.int32)
    bc = bc.astype(jnp.int32)

    # poison a-pads, chain C pairs per row: A_chain[r, c*W + j] = a_c[j]
    cdt = jnp.int32 if (lut_np > 0 or not cf32) else jnp.float32
    acp = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, ac.shape, 1) < na[:, None],
        ac, PADA).astype(cdt)
    R = Bp // C
    achain = jnp.pad(acp.reshape(R, C, LA), ((0, 0), (0, 0), (0, W - LA)),
                     constant_values=PADA).reshape(R, C * W)
    # overlapping entering-code windows aw[r, t, j] = A_chain[t*K + j - 1]
    # (entering a-code at diagonal d is A_chain[d - 2]; blocks start at
    # d0 = t*K + 1, so the window leads with one PADA at t = j = 0)
    LAp = DK * K + K + 2
    awin = jnp.pad(achain, ((0, 0), (1, LAp - C * W - 1)),
                   constant_values=PADA)
    main = awin[:, : DK * K].reshape(R, DK, K)
    last = awin[:, K: DK * K + K: K].reshape(R, DK, 1)
    aw = jnp.concatenate([main, last], axis=2)  # (R, DK, K+1)
    aw = aw.reshape(nB, BS, P, DK, K + 1).transpose(0, 3, 1, 4, 2)
    aw = aw.reshape(nB, DK, BS, (K + 1) * P)

    if lut_np > 0:
        bl = _bake_packed_planes(subK, bc, nb, nB, BS, P, C, LBt, lut_np)
    else:
        bcp = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, bc.shape, 1) < nb[:, None],
            bc, PADB).astype(cdt)
        bl = _pack_ilv2(bcp, nB, BS, P, C, LBt)

    cd = capg = None
    if (not is_sw) or need_cd:
        # per-lane capture diagonals, split by chain parity: pair c's
        # corner H lands at lane nb-1 on diagonal c*W + na + nb
        cidx = jnp.arange(Bp, dtype=jnp.int32) % C
        cvals = cidx * W + na + nb  # (Bp,)
        onlane = (jax.lax.broadcasted_iota(jnp.int32, (Bp, LBt), 1)
                  == nb[:, None] - 1)
        mdt = jnp.float32 if cf32 else jnp.int32
        # chain-parity sign split: even pairs' capture diagonals positive
        # (land in acc0), odd negated (acc1) — one rolling plane suffices
        # because a lane belongs to exactly one pair at a time
        sgn = jnp.where((cidx[:, None] & 1) == 0, 1, -1)
        cdm = jnp.where(onlane, cvals[:, None] * sgn, 0).astype(mdt)
        cd = _pack_ilv2(cdm, nB, BS, P, C, LBt)
    if not is_sw:
        rows = jnp.arange(Bp, dtype=jnp.int32) // (BS * P * C)
        tcd = jnp.clip((cvals - 1) // K, 0, DK - 1)
        capg = jnp.zeros((nB, DK), jnp.int32).at[rows, tcd].set(1)
    nl = None
    if neg:
        # per-lane ABSOLUTE diagonal of the lane's x==na cell for the
        # free-end-gap column mask: c*W + na + y0 + 1.  Rolled into a
        # scratch plane at chunk transitions exactly like the capture
        # diagonals, so the mask stays correct when a pair's free column
        # crosses into the next chunk's blocks (na + nb > W) or the
        # trailing tail blocks (where the block's own c exceeds C-1)
        mdt = jnp.float32 if cf32 else jnp.int32
        cidx2 = jnp.arange(Bp, dtype=jnp.int32) % C
        base = cidx2 * W + na + 1
        nlm = (base[:, None]
               + jax.lax.broadcasted_iota(jnp.int32, (Bp, LBt), 1)
               ).astype(mdt)
        nl = _pack_ilv2(nlm, nB, BS, P, C, LBt)
    return dict(aw=aw, bl=bl, cd=cd, capg=capg, nl=nl, Bp=Bp, na=na,
                nb=nb)


def _bake_packed_planes(subK, bc, nb, nB, BS, P, C, LBt, lut_np):
    """Packed per-b-lane LUT planes: plane j lane l packs the biased
    bytes (subK[4j+r, b_l] + 0x80) for r = 0..3; the b-pad column bakes
    byte 0 (score -128 after bias) so pad cells score strongly negative.
    int32 shifts wrap but the byte extraction is bit-exact."""
    Ka, Kb = subK.shape
    # biased score bytes, padded to 4*NP rows and a zero b-pad column
    subB = jnp.pad(subK.astype(jnp.int32) + 0x80,
                   ((0, 4 * lut_np - Ka), (0, 1)))
    bcp = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, bc.shape, 1) < nb[:, None],
        bc, Kb)
    cols = subB[:, bcp]  # (4*NP, Bp, LBt)
    packed = cols[0::4]
    for r in range(1, 4):
        packed = packed | (cols[r::4] << (8 * r))
    x = packed.reshape(lut_np, nB, BS, P, C, LBt)
    x = x.transpose(1, 4, 0, 2, 5, 3)  # (nB, C, NP, BS, LBt, P)
    return x.reshape(nB, C, lut_np, BS, P * LBt)


@functools.partial(
    jax.jit,
    static_argnames=("is_sw", "interpret", "unroll", "bs", "chain",
                     "nsg", "neg", "nga", "ngb", "nmm", "lut_np",
                     "codes_f32"),
)
def pallas_scores2(ac, bc, na, nb, gap_open, gap_extend, *,
                   is_sw: bool, match=None, mismatch=None,
                   subK=None,
                   interpret: bool = False, unroll: int = 16,
                   bs: int = 0, chain: int = 0, nsg: bool = False,
                   neg: bool = False, nga: bool = False,
                   ngb: bool = False, nmm: bool = False,
                   lut_np: int = 0, codes_f32=None):
    """Batched optimal scores (NW corner / SW best) via the chained v2
    kernel.  ``ac``/``bc`` are ``dp.compact_inputs_mm`` codes (equality
    mode) or ``dp.compact_inputs`` codes + ``subK`` with ``lut_np`` =
    ceil(Ka/4) packed planes (small-alphabet matrix mode, gate with
    :func:`lut2_eligible`).  Caller gates: :func:`f32_safe2`,
    min(na, nb) >= 1, gap_open <= 0, gap_extend <= 0 (lut mode).
    Returns (B,) int32."""
    B, LA = ac.shape
    _, LBt = bc.shape
    geo = chain_geometry(B, LA, LBt, K=unroll, chain=chain, bs=bs,
                         lut_np=lut_np)
    P, C, BS, nB, W, K, DK, SLOTS = (
        geo["P"], geo["C"], geo["BS"], geo["nB"], geo["W"], geo["K"],
        geo["DK"], geo["SLOTS"])
    LN = P * LBt
    m = geo["m"]
    if codes_f32 is None:
        codes_f32 = False  # same-process A/B: int32 codes >= f32 everywhere
    assert not (nmm and lut_np), "no_mismatches needs equality scoring"
    swcd = is_sw and (neg or ngb)  # SW last-b-row marker plane (round 5)
    st = _stage2(ac, bc, na, nb, geo, is_sw=is_sw, subK=subK,
                 lut_np=lut_np, cf32=codes_f32, neg=neg or nga,
                 need_cd=swcd)
    f32 = jnp.float32
    go = jnp.asarray(gap_open, f32)
    ge = jnp.asarray(gap_extend, f32)
    if lut_np > 0:
        MT = -2.0 * ge - go  # bias added to every extracted LUT byte
        MM = jnp.zeros((), f32)
    else:
        MT = jnp.asarray(match, f32) - 2.0 * ge - go
        # no_mismatches (alignment.c:101-104): the mismatch M-candidate
        # is the NEG_INF sentinel in the reference; POISON plays that
        # role in f32 drift space — it loses every max and never reaches
        # a READ value (a gap-only path always exists, so the corner is
        # real; tainted interior cells are never walked)
        MM = (jnp.asarray(POISON, f32) if nmm
              else jnp.asarray(mismatch, f32) - 2.0 * ge - go)
    scal = jnp.stack([go, ge, MT, MM])

    kernel = functools.partial(
        _kernel2, is_sw=is_sw, BS=BS, LBt=LBt, P=P, K=K, W=W, m=m,
        bb=geo["bb"], C=C, nsg=nsg, neg=neg, nga=nga, ngb=ngb,
        lut_np=lut_np, cf32=codes_f32)
    slot_map = (lambda i, t: (i, jnp.minimum(t // m, SLOTS - 1), 0, 0, 0))
    if lut_np > 0:
        bl_spec = pl.BlockSpec(
            (1, 1, lut_np, BS, LN),
            lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0, 0))
        bl_scratch = pltpu.VMEM((lut_np, BS, LN), jnp.int32)
    else:
        bl_spec = pl.BlockSpec(
            (1, 1, BS, LN),
            lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0))
        bl_scratch = pltpu.VMEM(
            (BS, LN), jnp.float32 if codes_f32 else jnp.int32)
    in_specs = [
        pl.BlockSpec((1, 1, BS, (K + 1) * P), lambda i, t: (i, t, 0, 0)),
        bl_spec,
    ]
    args = [st["aw"], st["bl"]]
    chunk_spec = pl.BlockSpec(
        (1, 1, BS, LN),
        lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0))
    if not is_sw:
        in_specs.append(chunk_spec)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args += [st["cd"], st["capg"]]
        if neg or nga:
            in_specs.append(chunk_spec)
            args.append(st["nl"])
    else:
        # SW constrained modes (round 5): cd marker for neg/ngb, x==na
        # diagonal plane for neg/nga — same rolling-chunk streams as NW,
        # no capture gate (SW best rides the acc planes)
        if swcd:
            in_specs.append(chunk_spec)
            args.append(st["cd"])
        if neg or nga:
            in_specs.append(chunk_spec)
            args.append(st["nl"])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(scal)

    avdt = jnp.int32 if (lut_np > 0 or not codes_f32) else jnp.float32
    mdt = jnp.float32 if codes_f32 else jnp.int32
    scratch = [pltpu.VMEM((BS, LN), f32)] * 7 \
        + [pltpu.VMEM((BS, LN), avdt), bl_scratch]
    if not is_sw:
        scratch += [pltpu.VMEM((BS, LN), mdt)]
        if neg or nga:
            scratch += [pltpu.VMEM((BS, LN), mdt)]
    else:
        if swcd:
            scratch += [pltpu.VMEM((BS, LN), mdt)]
        if neg or nga:
            scratch += [pltpu.VMEM((BS, LN), mdt)]

    out = pl.pallas_call(
        kernel,
        grid=(nB, DK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 2, BS, LN), slot_map),
        out_shape=jax.ShapeDtypeStruct((nB, SLOTS, 2, BS, LN), f32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)

    Bp = st["Bp"]
    naj, nbj = st["na"], st["nb"]
    cidx = jnp.arange(Bp, dtype=jnp.int32) % C
    rows = jnp.arange(Bp, dtype=jnp.int32) // C
    pairs = out.reshape(nB, SLOTS, 2, BS, LBt, P)
    pairs = pairs.transpose(0, 3, 5, 1, 2, 4).reshape(
        Bp // C, SLOTS, 2, LBt)
    if is_sw:
        # pair c < C-1: snapshot plane 0 of slot c+1, undrifted per lane
        # at its transition-out diagonal (c+1)*W + y0 + 1; pair C-1:
        # running plane 1 of the final slot, undrifted at d_last
        y = jnp.arange(LBt, dtype=jnp.int32)
        d_last = DK * K

        def per_pair(r, cc):
            snap = pairs[r, jnp.minimum(cc + 1, SLOTS - 1), 0]
            snap = snap + ge * ((cc + 1) * W + y + 1).astype(f32)
            fin = pairs[r, SLOTS - 1, 1] + ge * jnp.float32(d_last)
            return jnp.max(jnp.where(cc == C - 1, fin, snap))

        vals = jax.vmap(per_pair)(rows, cidx)
        vals = jnp.maximum(vals, 0.0)
        return vals[:B].astype(jnp.int32)
    # NW: pair c's corner H' sits in parity plane c&1 of slot
    # min(c+1, last) at lane nb-1; undrift by + ge * capture diagonal
    cdiag = cidx * W + naj + nbj

    def per_pair_nw(r, cc, nbv, cdv):
        v = pairs[r, jnp.minimum(cc + 1, SLOTS - 1), cc & 1, nbv - 1]
        return v + ge * cdv.astype(f32)

    vals = jax.vmap(per_pair_nw)(rows, cidx, nbj, cdiag)
    INT_MIN32 = jnp.float32(np.iinfo(np.int32).min)
    vals = jnp.where(jnp.isinf(vals), INT_MIN32, vals)
    return vals[:B].astype(jnp.int32)


def _dirs_kernel2(*refs, is_sw, emit_m, m_i16, BS, LBt, P, K, W, m, bb,
                  C, nsg, neg, nga, ngb, lut_np, cf32):
    """Chained direction-code fill: three-matrix recurrence in drifted
    space emitting v1-compatible packed 2-bit codes per diagonal (and the
    undrifted M matrix for SW candidates).  Same chunk/transition/capture
    machinery as :func:`_kernel2`; the code equalities are drift-invariant
    because both sides of every ``pred + penalty == value`` test carry the
    same -ge*d term (alignment.c:311-327 tie procedure, GAP_A > GAP_B >
    MATCH priority)."""
    lut = lut_np > 0
    ncol = neg or nga
    if is_sw:
        (aw_ref, bl_ref, scal_ref, dirs_ref, m_ref,
         s_m, s_ga, s_gb, h_m, h_ga, h_gb, g_m, g_ga, g_gb,
         av, bls) = refs
    elif ncol:
        (aw_ref, bl_ref, cd_ref, capg_ref, nl_ref, scal_ref,
         dirs_ref, m_ref, corn_ref,
         s_m, s_ga, s_gb, h_m, h_ga, h_gb, g_m, g_ga, g_gb,
         av, bls, cdv, cp0, cp1, cp2, cp3, cp4, cp5, ncv) = refs
    else:
        (aw_ref, bl_ref, cd_ref, capg_ref, scal_ref,
         dirs_ref, m_ref, corn_ref,
         s_m, s_ga, s_gb, h_m, h_ga, h_gb, g_m, g_ga, g_gb,
         av, bls, cdv, cp0, cp1, cp2, cp3, cp4, cp5) = refs
    f32 = jnp.float32
    i32 = jnp.int32
    cdt = i32 if (lut_np > 0 or not cf32) else f32
    ib = pl.program_id(0)
    t = pl.program_id(1)
    d0 = t * K + 1
    c = t // m
    lt = t - c * m
    cW = c * W
    go = scal_ref[0]
    ge = scal_ref[1]
    MT = scal_ref[2]  # match - 2*ge (eq) / -2*ge (lut bias): no G-fold
    MM = scal_ref[3]
    LN = P * LBt
    SH = P
    lane = jax.lax.broadcasted_iota(i32, (BS, LN), 1)
    y0 = lane // P if P > 1 else lane
    y0c = y0.astype(f32) if cf32 else y0
    bstart = y0 == 0

    def shift(v, fillv):
        return jnp.concatenate(
            [jnp.full((BS, SH), fillv, v.dtype), v[:, : LN - SH]], axis=1)

    def sdrift(d):
        return -ge * jnp.asarray(d, i32).astype(f32)

    @pl.when(t == 0)
    def _init():
        # entering diagonal 1: only the (0,0) corner exists — all three
        # matrices 0 there (both modes), entering as the SH(d-1) lane-0
        # fill; everything else arrives via the chunk-0 injections
        ninf = jnp.full((BS, LN), NEG, f32)
        z0 = jnp.where(bstart, jnp.zeros((), f32), NEG)
        av[...] = jnp.full((BS, LN), PADA, cdt)
        bls[...] = bl_ref[0, 0]
        s_m[...] = ninf
        s_ga[...] = ninf
        s_gb[...] = ninf
        h_m[...] = z0
        h_ga[...] = z0
        h_gb[...] = z0
        g_m[...] = ninf
        g_ga[...] = ninf
        g_gb[...] = ninf
        if not is_sw:
            cdv[...] = cd_ref[0, 0]
            if ncol:
                ncv[...] = nl_ref[0, 0]
            for r in (cp0, cp1, cp2, cp3, cp4, cp5):
                r[...] = ninf

    def pick(ga_ok, gb_ok, m_ok=None):
        # enum Matrix: MATCH=0, GAP_A=1, GAP_B=2; 3 = traceback-fail.
        # When the channel's value is the plain max of its three
        # candidates (no external floor/mask was applied after the max),
        # one candidate ALWAYS matches, so the MATCH arm is the forced
        # default and its compare+select drop out (m_ok=None).  Callers
        # keep the 3-arm exactly where a floor (SW's sd) or mask
        # (nga/ngb NEG) can make every compare miss — there the 3 is a
        # real "channel unreachable / local start" marker.
        if m_ok is None:
            return jnp.where(ga_ok, 1,
                             jnp.where(gb_ok, 2, 0)).astype(jnp.int32)
        return jnp.where(
            ga_ok, 1, jnp.where(gb_ok, 2, jnp.where(m_ok, 0, 3))
        ).astype(jnp.int32)

    def sweep(trans: bool, cap: bool):
        pm1, pga1, pgb1 = s_m[...], s_ga[...], s_gb[...]
        m1s, ga1s, gb1s = h_m[...], h_ga[...], h_gb[...]
        m2s, ga2s, gb2s = g_m[...], g_ga[...], g_gb[...]
        avv = av[...]
        win = aw_ref[0, 0]
        blvv = bls[...]
        if trans:
            bin_ = bl_ref[0, 0]
        if cap or ncol or ngb or (trans and not is_sw):
            cdvv = cdv[...]
            if ncol:
                ncvv = ncv[...]
            if trans:
                cdin = cd_ref[0, 0]
        if cap:
            c0m, c1m = cp0[...], cp1[...]
            c0a, c1a = cp2[...], cp3[...]
            c0b, c1b = cp4[...], cp5[...]
        if trans:
            # per-BLOCK early updates — see _kernel2; identical safety
            # argument (W carries a +K hazard margin)
            lo = jnp.asarray(d0 - 1 - cW, i32)
            lov = lo.astype(f32) if cf32 else lo
            band = (y0c >= lov) & (y0c <= lov + K - 1)
            if lut:
                blvv = jnp.where(band[None], bin_, blvv)
            else:
                blvv = jnp.where(band, bin_, blvv)
            if not is_sw:
                cdvv = jnp.where(band, cdin, cdvv)
                if ncol:
                    ncvv = jnp.where(band, nl_ref[0, 0], ncvv)
        if neg or ngb:
            negb = cdvv != 0  # nonzero exactly at each pair's lane nb-1
        for k in range(K):
            d = d0 + k
            if lut:
                ss = _lut_tree(blvv, avv, lut_np).astype(f32) + MT
                if is_sw:
                    ss = jnp.where(avv >= PADA, jnp.asarray(POISON, f32),
                                   ss)
            else:
                ss = jnp.where(avv == blvv, MT, MM)
                if is_sw:
                    ss = jnp.where(avv + blvv >= PADA,
                                   jnp.asarray(POISON, f32), ss)
            amax = jnp.maximum(jnp.maximum(m2s, ga2s), gb2s)
            m_arg = amax + ss
            if is_sw:
                sd = sdrift(d)
                Mv = jnp.maximum(m_arg, sd)
            else:
                Mv = m_arg
            s1 = m1s + go
            s2 = ga1s
            s3 = gb1s + go
            if ncol:
                dfn = jnp.asarray(d, i32)
                if cf32:
                    dfn = dfn.astype(f32)
                negcol = ncvv == dfn
            if neg:
                # free-end-gap closed forms (alignment.c:121-155,
                # 265-268): on the x==na column Ga's candidates carry NO
                # penalty (which adds -ge per step in drift space), on
                # the y==nb-1 row Gb's likewise.  Substituting the
                # candidates THEMSELVES (pred - ge) makes both the value
                # max AND the standard tie-test pick below exact for the
                # free cells — no separate free-mode max tree or pick
                s1 = jnp.where(negcol, m1s - ge, s1)
                s2 = jnp.where(negcol, ga1s - ge, s2)
                s3 = jnp.where(negcol, gb1s - ge, s3)
            ga_v = jnp.maximum(jnp.maximum(s1, s2), s3)
            if nga:
                # no_gaps_in_a: Ga unreachable off the last a-column
                # (alignment.c:121-137 guard + the x==0 boundary run,
                # re-injected below in trans blocks)
                ga_v = jnp.where(negcol, ga_v, NEG)
            t1 = pm1 + go
            t2 = pga1 + go
            t3 = pgb1
            if neg:
                t1 = jnp.where(negb, pm1 - ge, t1)
                t2 = jnp.where(negb, pga1 - ge, t2)
                t3 = jnp.where(negb, pgb1 - ge, t3)
            gb_v = jnp.maximum(jnp.maximum(t1, t2), t3)
            if ngb:
                gb_v = jnp.where(negb, gb_v, NEG)
            if is_sw:
                ga_v = jnp.maximum(ga_v, sd)
                gb_v = jnp.maximum(gb_v, sd)
            # direction codes — drift-invariant equalities on the same
            # values the fill just computed (pallas_dp._dirs_kernel
            # semantics, alignment.c:244-350)
            dm = pick(ga2s == amax, gb2s == amax)  # amax is one of them
            if is_sw:
                dm = jnp.where(m_arg == Mv, dm, 3)
            dga = pick(s2 == ga_v, s3 == ga_v,
                       (s1 == ga_v) if (is_sw or nga) else None)
            dgb = pick(t2 == gb_v, t3 == gb_v,
                       (t1 == gb_v) if (is_sw or ngb) else None)
            dirs_ref[0, 0, k] = (dm | (dga << 2) | (dgb << 4)).astype(
                jnp.uint8)
            if emit_m:
                # undrift in-kernel: consumers (sw_extract_candidates,
                # ChunkedM) see reference M values.  SW M is exactly
                # representable in int16 when the caller's m16_safe gate
                # holds: every channel carries the reference's min=0
                # floor (alignment.c:112-115 MAX4), Mv = max(m_arg, sd)
                # here, and poisoned pad cells floor to sd too — so the
                # undrifted value lies in [0, max_match * min(na, nb)],
                # and halving the plane bytes halves the kernel's
                # dominant HBM write stream
                m_ref[0, 0, k] = (Mv + ge * jnp.asarray(d, i32)
                                  .astype(f32)).astype(
                    jnp.int16 if m_i16 else jnp.int32)
            if trans:
                # Boundary injections (all three channels — unlike
                # _kernel2, ga cannot propagate naturally here: the
                # corner fill is the all-zero cell sdf, one |go| above
                # the rc gap-run base, so lane 0's natural value would
                # make opens from the corner free); only the blv/cdv
                # per-diagonal selects were hoisted to block level above
                att_s = jnp.asarray(d - 1 - cW, i32)
                at_t = y0c == (att_s.astype(f32) if cf32 else att_s)
                if is_sw:
                    sd = sdrift(d)
                    mv_sel = ga_sel = gb_sel = sd
                elif nsg:
                    mv_sel = gb_sel = NEG
                    ga_sel = sdrift(d)
                else:
                    mv_sel = gb_sel = NEG
                    ga_sel = go - ge * jnp.float32(cW)
                Mv = jnp.where(at_t, mv_sel, Mv)
                ga_v = jnp.where(at_t, ga_sel, ga_v)
                gb_v = jnp.where(at_t, gb_sel, gb_v)
            if cap:
                df = jnp.asarray(d, i32)
                if cf32:
                    df = df.astype(f32)
                hit0 = cdvv == df
                hit1 = cdvv == -df
                c0m = jnp.where(hit0, Mv, c0m)
                c0a = jnp.where(hit0, ga_v, c0a)
                c0b = jnp.where(hit0, gb_v, c0b)
                c1m = jnp.where(hit1, Mv, c1m)
                c1a = jnp.where(hit1, ga_v, c1a)
                c1b = jnp.where(hit1, gb_v, c1b)
            # shift fills: lane 0 enters cell (0, x=d) of chunk x // W —
            # M/Ga = -inf, Gb = the row-0 gap run, except pair corners
            # (x' = 0) where all three are 0 (drifted -ge*d)
            if is_sw:
                sdf = sdrift(d)
                fm = fga = fgb = sdf
            else:
                cx = jnp.asarray(d, i32) // W
                iscorn = jnp.asarray(d, i32) == cx * W
                sdf = sdrift(d)
                fm = jnp.where(iscorn, sdf, NEG)
                fga = fm
                if nsg:
                    fgb = sdf
                else:
                    fgb = jnp.where(iscorn, sdf,
                                    go - ge * (cx * W).astype(f32))
            m2s, ga2s, gb2s = m1s, ga1s, gb1s
            m1s = shift(Mv, fm)
            ga1s = shift(ga_v, fga)
            gb1s = shift(gb_v, fgb)
            pm1, pga1, pgb1 = Mv, ga_v, gb_v
            avv = jnp.concatenate(
                [win[:, (k + 1) * SH: (k + 2) * SH], avv[:, : LN - SH]],
                axis=1)
        s_m[...], s_ga[...], s_gb[...] = pm1, pga1, pgb1
        h_m[...], h_ga[...], h_gb[...] = m1s, ga1s, gb1s
        g_m[...], g_ga[...], g_gb[...] = m2s, ga2s, gb2s
        av[...] = avv
        bls[...] = blvv
        if trans and not is_sw:
            cdv[...] = cdvv
            if ncol:
                ncv[...] = ncvv
        if cap:
            cp0[...], cp1[...] = c0m, c1m
            cp2[...], cp3[...] = c0a, c1a
            cp4[...], cp5[...] = c0b, c1b

    in_band = (lt <= bb) & (c < C)
    if is_sw:
        @pl.when(in_band)
        def _tr():
            sweep(True, False)

        @pl.when(jnp.logical_not(in_band))
        def _no():
            sweep(False, False)
    else:
        capb = capg_ref[ib, t] != 0

        @pl.when(in_band & capb)
        def _tc():
            sweep(True, True)

        @pl.when(in_band & jnp.logical_not(capb))
        def _t():
            sweep(True, False)

        @pl.when(jnp.logical_not(in_band) & capb)
        def _c():
            sweep(False, True)

        @pl.when(jnp.logical_not(in_band) & jnp.logical_not(capb))
        def _n():
            sweep(False, False)

        @pl.when((lt == m - 1) | (t == pl.num_programs(1) - 1))
        def _flush():
            corn_ref[0, 0, 0] = cp0[...]
            corn_ref[0, 0, 1] = cp1[...]
            corn_ref[0, 0, 2] = cp2[...]
            corn_ref[0, 0, 3] = cp3[...]
            corn_ref[0, 0, 4] = cp4[...]
            corn_ref[0, 0, 5] = cp5[...]


@functools.partial(
    jax.jit,
    static_argnames=("is_sw", "emit_m", "m_i16", "interpret", "unroll",
                     "bs", "chain", "nsg", "neg", "nga", "ngb", "nmm",
                     "lut_np", "codes_f32"),
)
def pallas_fill_dirs2(ac, bc, na, nb, gap_open, gap_extend, *,
                      is_sw: bool, emit_m: bool, m_i16: bool = False,
                      match=None,
                      mismatch=None, subK=None,
                      interpret: bool = False, unroll: int = 16,
                      bs: int = 0, chain: int = 0, nsg: bool = False,
                      neg: bool = False, nga: bool = False,
                      ngb: bool = False, nmm: bool = False,
                      lut_np: int = 0, codes_f32=None):
    """Chained batched full fill with packed direction codes (v2).

    Same input contract as :func:`pallas_scores2`.  Returns
    ``(dirs, m, corner)``: dirs (nB, DK*K, BS, LN) uint8 global-diagonal
    planes (plane g holds diagonal g+1; per-pair extraction via
    :func:`unpack_pair_plane2`); m same layout int32 (UNDRIFTED reference
    M values, SW with ``emit_m``) or None; corner (B, 3) int32 M/Ga/Gb at
    each pair's (nb, na) (NW) or None."""
    B, LA = ac.shape
    _, LBt = bc.shape
    geo = chain_geometry(B, LA, LBt, K=unroll, chain=chain, bs=bs,
                         state_bytes=140, lut_np=lut_np)
    P, C, BS, nB, W, K, DK, SLOTS = (
        geo["P"], geo["C"], geo["BS"], geo["nB"], geo["W"], geo["K"],
        geo["DK"], geo["SLOTS"])
    LN = P * LBt
    m = geo["m"]
    if codes_f32 is None:
        codes_f32 = False
    assert not ((neg or nga or ngb) and is_sw), \
        "free-end-gap / no-gaps modes: NW only on the v2 path"
    assert not (nmm and lut_np), "no_mismatches needs equality scoring"
    st = _stage2(ac, bc, na, nb, geo, is_sw=is_sw, subK=subK,
                 lut_np=lut_np, cf32=codes_f32, neg=neg or nga)
    f32 = jnp.float32
    go = jnp.asarray(gap_open, f32)
    ge = jnp.asarray(gap_extend, f32)
    if lut_np > 0:
        MT = -2.0 * ge
        MM = jnp.zeros((), f32)
    else:
        MT = jnp.asarray(match, f32) - 2.0 * ge
        # no_mismatches: POISON plays the reference's NEG_INF sentinel
        # (see pallas_scores2) — tainted cells never win a max and their
        # codes are never walked
        MM = (jnp.asarray(POISON, f32) if nmm
              else jnp.asarray(mismatch, f32) - 2.0 * ge)
    scal = jnp.stack([go, ge, MT, MM])

    kernel = functools.partial(
        _dirs_kernel2, is_sw=is_sw, emit_m=emit_m, m_i16=m_i16, BS=BS,
        LBt=LBt, P=P, K=K, W=W, m=m, bb=geo["bb"], C=C, nsg=nsg,
        neg=neg, nga=nga, ngb=ngb, lut_np=lut_np, cf32=codes_f32)
    if lut_np > 0:
        bl_spec = pl.BlockSpec(
            (1, 1, lut_np, BS, LN),
            lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0, 0))
        bl_scratch = pltpu.VMEM((lut_np, BS, LN), jnp.int32)
    else:
        bl_spec = pl.BlockSpec(
            (1, 1, BS, LN),
            lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0))
        bl_scratch = pltpu.VMEM(
            (BS, LN), jnp.float32 if codes_f32 else jnp.int32)
    in_specs = [
        pl.BlockSpec((1, 1, BS, (K + 1) * P), lambda i, t: (i, t, 0, 0)),
        bl_spec,
    ]
    args = [st["aw"], st["bl"]]
    if not is_sw:
        in_specs.append(pl.BlockSpec(
            (1, 1, BS, LN),
            lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0)))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args += [st["cd"], st["capg"]]
        if neg or nga:
            in_specs.append(pl.BlockSpec(
                (1, 1, BS, LN),
                lambda i, t: (i, jnp.minimum(t // m, C - 1), 0, 0)))
            args.append(st["nl"])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(scal)

    mshape = (nB, DK, K, BS, LN) if emit_m else (1, 1, 1, 8, 128)
    mmap = ((lambda i, t: (i, t, 0, 0, 0)) if emit_m
            else (lambda i, t: (0, 0, 0, 0, 0)))
    out_specs = [
        pl.BlockSpec((1, 1, K, BS, LN), lambda i, t: (i, t, 0, 0, 0)),
        pl.BlockSpec((1, 1, 1 if not emit_m else K, 8 if not emit_m
                      else BS, 128 if not emit_m else LN), mmap),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nB, DK, K, BS, LN), jnp.uint8),
        jax.ShapeDtypeStruct(mshape,
                             jnp.int16 if (emit_m and m_i16)
                             else jnp.int32),
    ]
    avdt = jnp.int32 if (lut_np > 0 or not codes_f32) else jnp.float32
    mdt = jnp.float32 if codes_f32 else jnp.int32
    scratch = [pltpu.VMEM((BS, LN), f32)] * 9 \
        + [pltpu.VMEM((BS, LN), avdt), bl_scratch]
    if not is_sw:
        slot_map = (lambda i, t:
                    (i, jnp.minimum(t // m, SLOTS - 1), 0, 0, 0))
        out_specs.append(pl.BlockSpec((1, 1, 6, BS, LN), slot_map))
        out_shapes.append(
            jax.ShapeDtypeStruct((nB, SLOTS, 6, BS, LN), f32))
        scratch += [pltpu.VMEM((BS, LN), mdt)] \
            + [pltpu.VMEM((BS, LN), f32)] * 6
        if neg or nga:
            scratch += [pltpu.VMEM((BS, LN), mdt)]

    outs = pl.pallas_call(
        kernel,
        grid=(nB, DK),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)
    if is_sw:
        dirs, mm_ = outs
        corner = None
    else:
        dirs, mm_, corn = outs
        Bp = st["Bp"]
        naj, nbj = st["na"], st["nb"]
        cidx = jnp.arange(Bp, dtype=jnp.int32) % C
        rows = jnp.arange(Bp, dtype=jnp.int32) // C
        cdiag = cidx * W + naj + nbj
        pcorn = corn.reshape(nB, SLOTS, 6, BS, LBt, P)
        pcorn = pcorn.transpose(0, 3, 5, 1, 2, 4).reshape(
            Bp // C, SLOTS, 6, LBt)

        def per_pair(r, cc, nbv, cdv):
            sl = jnp.minimum(cc + 1, SLOTS - 1)
            q = cc & 1
            vals = jnp.stack([
                pcorn[r, sl, 0 + q, nbv - 1],
                pcorn[r, sl, 2 + q, nbv - 1],
                pcorn[r, sl, 4 + q, nbv - 1],
            ])
            return vals + ge * cdv.astype(f32)

        vals = jax.vmap(per_pair)(rows, cidx, nbj, cdiag)
        INT_MIN32 = jnp.float32(np.iinfo(np.int32).min)
        vals = jnp.where(jnp.isinf(vals), INT_MIN32, vals)
        corner = vals[:B].astype(jnp.int32)
    dirs = dirs.reshape(nB, DK * K, BS, LN)
    m_out = mm_.reshape(nB, DK * K, BS, LN) if emit_m else None
    return dirs, m_out, corner


def unpack_pair_plane2(planes: np.ndarray, j: int, geo: dict,
                       LA: int, LBt: int) -> np.ndarray:
    """Extract pair ``j``'s skewed (D, LBt+1) plane (row = x + y - 2,
    col = y, dummy col 0 — the ``ops.traceback`` contract) from a chained
    v2 kernel output (nB, DKK, BS, LN): pair (i, s, p, c)'s diagonal d
    lives in global plane d - 1, rows c*W + 1 ... c*W + D."""
    BS, P, C, W = geo["BS"], geo["P"], geo["C"], geo["W"]
    D = LA + LBt - 1
    i, r = divmod(j, BS * P * C)
    sp, c = divmod(r, C)
    s, p = divmod(sp, P)
    rows = planes[i, c * W + 1: c * W + 1 + D, s]
    sl = rows[:, p::P] if P > 1 else rows
    out = np.empty((D, LBt + 1), dtype=planes.dtype)
    out[:, 1:] = sl
    out[:, 0] = 0
    return out


def pair_planes_device2(planes, geo: dict, LA: int, LBt: int, B: int):
    """Device-side batch unpack of a chained v2 output to per-pair skewed
    (B, D, LBt+1) planes (pair order (i, s, p, c)), for
    ``dp.sw_extract_candidates`` — stays on device, M never fetched."""
    BS, P, C, W, nB = (geo["BS"], geo["P"], geo["C"], geo["W"], geo["nB"])
    D = LA + LBt - 1
    per_c = []
    for c in range(C):
        x = planes[:, c * W + 1: c * W + 1 + D]  # (nB, D, BS, LN)
        x = x.reshape(nB, D, BS, LBt, P) if P > 1 else x[..., None]
        per_c.append(x)
    x = jnp.stack(per_c, axis=2)  # (nB, D, C?, ...) — wait axis order
    # (nB, D, C, BS, LBt, P) -> (nB, BS, P, C, D, LBt)
    x = x.transpose(0, 3, 5, 2, 1, 4)
    x = x.reshape(nB * BS * P * C, D, LBt)
    if x.dtype == jnp.int16:  # int16 M emission (m16_safe): consumers
        x = x.astype(jnp.int32)  # (sw_extract_candidates) expect int32
    return jnp.pad(x[:B], ((0, 0), (0, 0), (1, 0)))
