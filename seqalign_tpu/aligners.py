"""High-level aligner API: the TPU-native equivalent of the reference's
``needleman_wunsch_{new,align}`` / ``smith_waterman_{new,align,fetch}``
surface (needleman_wunsch.h:22-32, smith_waterman.h:21-39).

Two execution paths, routed per call by workload size:

* **host** (``ops/host_dp.py``): vectorized numpy fill + reverse-move
  traceback.  No JAX import, no backend init, no compile — a single small
  pair answers in milliseconds, like the reference binary.  This is the
  latency path the CLIs ride.
* **device** (``ops/dp.py`` XLA wavefront / ``ops/pallas_dp.py`` Pallas
  kernel): batched fills, length-bucketed, padded to powers of two so
  repeated batches reuse compiled programs.  This is the throughput path
  (the reference aligns pairs serially in a callback loop,
  alignment_cmdline.c:611-622 — batching is the TPU-native replacement).

Routing: batches whose total cell count exceeds ``HOST_MAX_CELLS`` (or with
enough pairs to amortize a device dispatch) go to the device; everything
else stays on host.  ``SEQALIGN_FORCE=host|device`` pins the path (tests
use it to cover both).  Results are bit-identical either way — both paths
are pinned to the reference by the golden corpus.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import numpy as np

from .ops import host_dp
from .ops.host_dp import Alignment
from .scoring.config import ScoringConfig
from .scoring.presets import scoring_system_default, scoring_system_sw_default

# Route to the device above this much total DP work (cells) or this many
# pairs per batch; below it, vectorized numpy fills answer faster than a
# device dispatch (and infinitely faster than a cold backend+compile).
HOST_MAX_CELLS = int(os.environ.get("SEQALIGN_HOST_MAX_CELLS", 4_000_000))
HOST_MAX_PAIRS = 32

# Beyond this many cells per pair, a traceback fill routes to the chunked
# boundary-carry path to bound device memory (the one-shot fill's skewed
# substitution scores are ~8 transient bytes/cell).
LONG_PAIR_CELLS = 112_000_000  # > 10240^2: 1-10kb reads never go per-pair
# device dirs bytes in flight per alignment sub-batch (the full bucket
# would be B * la * lb bytes — a 100-pair 10kb bucket is ~10GB)
ALIGN_DIRS_BUDGET = int(os.environ.get("SEQALIGN_ALIGN_DIRS_BUDGET",
                                       str(1_500_000_000)))

# Placeholder substitution tables for the inline-mm kernel paths (the
# kernels never read them; a fixed shape keeps one jit cache entry)
_DUMMY_TABLE = np.zeros((8, 8), np.int32)

# Pallas-dispatch accounting: incremented AFTER each successful kernel
# call so validation harnesses (tools/tpu_validate.py) can prove a
# scenario actually exercised a Mosaic-compiled kernel instead of
# silently comparing XLA against XLA (ADVICE round 2, medium).
_PALLAS_DISPATCHES: dict = {}


def _note_dispatch(what: str) -> None:
    _PALLAS_DISPATCHES[what] = _PALLAS_DISPATCHES.get(what, 0) + 1


def pallas_dispatch_counts() -> dict:
    """Snapshot of successful Pallas kernel dispatches by kind."""
    return dict(_PALLAS_DISPATCHES)


def _route(total_cells: int, n_pairs: int,
           sc: Optional[ScoringConfig] = None) -> str:
    # Sentinel-wrap regime (NW only — SW clamps at 0 and has no sentinel,
    # so SW call sites pass sc=None): constrained modes whose per-step
    # penalties exceed the frozen |min_penalty| headroom.  There the
    # REFERENCE overflows int32 (C UB) and aborts with 'Program error:
    # traceback fail'; our int32 device fills would wrap the same way, so
    # this regime always takes the int64 host path and returns the
    # mathematically optimal alignment instead (documented deviation,
    # README).  Checked before SEQALIGN_FORCE: semantics beat test pins.
    if sc is not None and sc.sentinel_wrap_risk():
        return "host"
    force = os.environ.get("SEQALIGN_FORCE", "")
    if force in ("host", "device"):
        return force
    if total_cells <= HOST_MAX_CELLS and n_pairs <= HOST_MAX_PAIRS:
        return "host"
    return "device"


def _pallas_mode() -> str:
    """SEQALIGN_PALLAS: '' (auto: TPU only) | 'off' | 'interpret' (force the
    kernels through the Pallas interpreter on CPU — test wiring coverage)."""
    return os.environ.get("SEQALIGN_PALLAS", "")


def _pallas_pad_floor() -> int:
    """Minimum (LA, LB) pad for Pallas dispatch — 128 keeps TPU lanes full;
    tests lower it so interpret-mode runs stay small."""
    return int(os.environ.get("SEQALIGN_PALLAS_FLOOR", "128"))


def _pallas_eligible(sc: ScoringConfig) -> bool:
    """The Pallas kernels cover every recurrence mode (default flags, free
    start/end gaps, and the no-gaps/no-mismatch constrained modes) with
    gap_open <= 0 on a real accelerator.  The constrained modes
    additionally need an in-kernel scoring mode — no_mismatches needs
    equality scoring (mm_eligible), the no-gaps modes any inline mode —
    which the call sites check once the compact alphabet is known."""
    mode = _pallas_mode()
    if mode == "off":
        return False
    if mode != "interpret":
        import jax

        if jax.default_backend() == "cpu":
            return False
    from .ops import dp

    if sc.no_mismatches and not dp.mm_eligible(sc):
        return False
    return sc.gap_open <= 0


def _pallas_unroll(default: int) -> int:
    """SEQALIGN_UNROLL overrides the diagonal unroll depth K for perf
    experiments (short-b fills are grid-step-bound — ROADMAP item 1; the
    measured defaults stay untouched)."""
    return int(os.environ.get("SEQALIGN_UNROLL", "0")) or default


def _pallas_failed(what: str) -> bool:
    """Shared fallback policy for the Pallas call sites: Mosaic
    compile/VMEM failures on untested width/alphabet combos degrade to the
    XLA path; interpret mode re-raises so tests never mask a kernel bug.
    Call from an ``except`` block; returns True to request the fallback."""
    if _pallas_mode() == "interpret":
        raise
    import logging

    logging.getLogger(__name__).warning(
        "Pallas %s path failed; falling back to XLA", what, exc_info=True)
    return True


def _scores_auto(sc: ScoringConfig, seqs_a, seqs_b, *, is_sw: bool,
                 defer: bool = False):
    """Scores-only batch dispatch: host numpy for small workloads, Pallas
    kernel when eligible, XLA scan otherwise.  Bit-identical results every
    way (tests/test_pallas.py, tests/test_host_path.py).

    ``defer=True`` skips the result fetch on device paths (returns the
    in-flight jax array): callers streaming many batches overlap the next
    batch's host IO/pack with this batch's device fill and fetch at the
    end (parallel/distributed.distributed_score_file)."""
    cells = sum(len(a) * len(b) for a, b in zip(seqs_a, seqs_b))
    if _route(cells, len(seqs_a), None if is_sw else sc) == "host":
        out = np.zeros(len(seqs_a), np.int32)
        for i, (a, b) in enumerate(zip(seqs_a, seqs_b)):
            M, Ga, Gb = host_dp.fill_matrices(sc, a, b, is_sw)
            if is_sw:
                out[i] = M.max(initial=0)
            else:
                out[i] = max(M[-1, -1], Ga[-1, -1], Gb[-1, -1])
        return out

    import jax.numpy as jnp

    from .ops import dp

    for sa, sb in zip(seqs_a, seqs_b):
        dp.check_valid_pairs(sc, sa, sb)
    # pow2 batch-count padding: the kernels already round B up to full
    # sublane chunks internally, so filler pairs cost ~nothing — but a
    # distinct B is a distinct jit shape, and streaming buckets flush at
    # ragged sizes (a 1-10kb E2E smoke spent 290s of its 293s wall in
    # per-shape Mosaic compiles).  Fillers record length 1 (na must stay
    # >= 1 for the v2 gate); every return slices back to n.
    n = len(seqs_a)
    npad = dp._next_pow2(max(8, n))
    if npad != n:
        seqs_a = list(seqs_a) + [""] * (npad - n)
        seqs_b = list(seqs_b) + [""] * (npad - n)
    na = dp.seq_lens(seqs_a)
    nb = dp.seq_lens(seqs_b)
    na[n:] = 1
    nb[n:] = 1
    use_pallas = _pallas_eligible(sc) and min(na.min(initial=1),
                                              nb.min(initial=1)) >= 1
    if use_pallas:
        from .ops.pallas_dp import f32_safe, pallas_scores

        floor = _pallas_pad_floor()
        la = max(floor, dp.pad_width(max(1, int(na.max(initial=0)))))
        lb = max(floor, dp.pad_width(max(1, int(nb.max(initial=0)))))
        # wide-lane envelope: v2 measured exact + 72-78 GCUPS up to
        # 10240 lanes (bs=8); past that, the XLA chunked path
        if lb > 10240:
            use_pallas = False
    if use_pallas:
        # equality-scoring fast path: shared fold-canonical codes computed
        # in-kernel — no substitution tables at all (the kernel never reads
        # subK in inline mode; a fixed dummy keeps the jit signature).
        # pack once at the final padded width, folding during the copy
        # (native packer — the host-side scaling contract, SCALING.json)
        inline = dp.mm_eligible(sc)
        if inline:
            # na/nb keep the filler-as-length-1 override from above
            ac, bc, _, _ = dp.pack_inputs_mm(sc, seqs_a, seqs_b, la, lb)
            subK = imK = _DUMMY_TABLE
            lut = 0
        else:
            a, _ = dp.pad_batch(seqs_a, la)
            b, _ = dp.pad_batch(seqs_b, lb)
            ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
            lut = _lut_k(subK)
        if (sc.no_gaps_in_a or sc.no_gaps_in_b) and not inline and lut == 0:
            use_pallas = False  # plane path lacks the no-gaps guards
    if use_pallas:
        v2 = _v2_scores_eligible(sc, inline, None if inline else subK,
                                 la, lb, is_sw=is_sw)
        if v2 is not None:
            from .ops.pallas_dp2 import pallas_scores2

            try:
                out = pallas_scores2(
                    jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
                    jnp.asarray(nb), np.int32(sc.gap_open),
                    np.int32(sc.gap_extend), is_sw=is_sw,
                    match=np.int32(sc.match),
                    mismatch=np.int32(sc.mismatch),
                    subK=None if inline else jnp.asarray(subK),
                    interpret=_pallas_mode() == "interpret",
                    nsg=sc.no_start_gap_penalty,
                    neg=sc.no_end_gap_penalty, nga=sc.no_gaps_in_a,
                    ngb=sc.no_gaps_in_b, nmm=sc.no_mismatches, lut_np=v2,
                )
                out = out[:n]
                if not defer:
                    out = np.asarray(out)
                _note_dispatch("scores2")
                return out
            except Exception:
                _pallas_failed("scores2")
        if lb > 4096:
            # v1 envelope ends at 4096 lanes; wide widths are v2-only
            use_pallas = False
    if use_pallas:
        try:
            out = pallas_scores(
                jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
                jnp.asarray(nb), jnp.asarray(subK), jnp.asarray(imK),
                np.int32(sc.gap_open), np.int32(sc.gap_extend),
                np.int32(sc.dp_floor(is_sw)), is_sw=is_sw,
                use_f32=f32_safe(sc, la, lb),
                ss8=bool(np.abs(subK).max(initial=0) <= 127),
                interpret=_pallas_mode() == "interpret",
                bs=_pallas_bs(len(seqs_a), lb, lut_k=lut),
                inline_mm=inline, lut_k=lut, match=np.int32(sc.match),
                mismatch=np.int32(sc.mismatch),
                nsg=sc.no_start_gap_penalty, neg=sc.no_end_gap_penalty,
                nga=sc.no_gaps_in_a, ngb=sc.no_gaps_in_b,
                nmm=sc.no_mismatches,
                # K=8 measured fastest across L=128..1024 in round 3
                # (78.7 vs 68.6 GCUPS at L=512 K=16; 58.8 vs 20.6 at
                # L=128 — the round-2 "+30% at K=16" result did not
                # reproduce after the staging rework)
                unroll=_pallas_unroll(8),
            )
            out = out[:n]
            if not defer:
                out = np.asarray(out)
            _note_dispatch("scores")
            return out
        except Exception:
            _pallas_failed("scores")
    out, _, _ = dp.fill_batch(
        sc, seqs_a, seqs_b, is_sw=is_sw, emit_dirs=False, pow2_pad=True,
        validate=False,
    )
    if is_sw:
        return out.best[:n] if defer else np.asarray(out.best)[:n]
    if defer:
        return out.corner.max(axis=1)[:n]
    return np.asarray(out.corner).max(axis=1)[:n]


def _swap_symmetric(sc: ScoringConfig) -> bool:
    """True when score(a, b) == score(b, a) exactly, so a pair may be
    side-swapped for a better device layout: the substitution relation
    must be symmetric (equality scoring always is; matrix/wildcard
    configs iff the baked 256x256 LUT is) and the no-gaps flags must not
    distinguish the sides (gap penalties are side-symmetric in the
    recurrence, alignment.c:89-167; free start/end gaps apply to row 0
    and column 0 alike, alignment.c:59-81,122-145)."""
    if sc.no_gaps_in_a or sc.no_gaps_in_b:
        return False
    from .ops import dp

    if dp.mm_eligible(sc):
        return True
    sub = sc.luts()[1]
    return bool(np.array_equal(sub, sub.T))


def _scores_bucketed(sc: ScoringConfig, seqs_a, seqs_b, *,
                     is_sw: bool) -> np.ndarray:
    """Scores with pow2 length bucketing (mixed-length batches don't pad
    every pair to the global max — SURVEY §7 hard part 4) and, for
    symmetric configs, per-pair side canonicalization so the LANE side b
    is the shorter one: more pairs fit the chained-kernel envelope and
    lane padding drops (the 1-10kb production regime,
    BASELINE.json configs[4])."""
    n = len(seqs_a)
    if n <= 1:
        return _scores_auto(sc, seqs_a, seqs_b, is_sw=is_sw)
    swap_ok = _swap_symmetric(sc)
    if swap_ok:
        sa = [a if len(a) >= len(b) else b
              for a, b in zip(seqs_a, seqs_b)]
        sb = [b if len(a) >= len(b) else a
              for a, b in zip(seqs_a, seqs_b)]
    else:
        sa, sb = list(seqs_a), list(seqs_b)
    out = np.zeros(n, np.int32)
    for key, idx in _buckets(sa, sb, long_key=False):
        out[idx] = _scores_auto(sc, [sa[i] for i in idx],
                                [sb[i] for i in idx], is_sw=is_sw)
    return out


def score_pairs_stream(sc: ScoringConfig, pairs, *, is_sw: bool,
                       flush_cells: int = 2 ** 31,
                       flush_pairs: int = 1024,
                       max_inflight: int = 4):
    """Streaming scores over an iterator of ``(idx, seq_a, seq_b)``:
    pairs accumulate into pow2 length buckets (side-canonicalized for
    symmetric configs), each bucket dispatches deferred once it holds
    ``flush_pairs`` pairs or ``flush_cells`` padded cells, and host IO /
    packing of later pairs overlaps the in-flight device fills (JAX
    dispatch is asynchronous; at most ``max_inflight`` batches stay
    un-fetched).  Yields ``(indices, scores)`` chunks.

    This is the production path for large mixed-length workloads
    (BASELINE.json configs[4]; the reference streams pairs strictly
    serially, alignment_cmdline.c:611-622)."""
    from .ops import dp

    swap_ok = _swap_symmetric(sc)
    buckets: dict = {}
    inflight: list = []

    def bucket_key(a: str, b: str):
        # padded-width buckets (pow2 then 1024-granular, dp.pad_width):
        # scores memory is O(band) in the chained kernel, so even giant
        # pairs take a regular (wide) bucket; flush_cells bounds how many
        # accumulate before dispatch
        return (max(64, dp.pad_width(len(a))),
                max(64, dp.pad_width(len(b))))

    def dispatch(key):
        idxs, sa, sb = buckets.pop(key)
        out = _scores_auto(sc, sa, sb, is_sw=is_sw, defer=True)
        inflight.append((idxs, out))

    def drain(limit):
        while len(inflight) > limit:
            idxs, out = inflight.pop(0)
            yield np.asarray(idxs, np.int64), np.asarray(out)[:len(idxs)]

    for idx, a, b in pairs:
        if swap_ok and len(a) < len(b):
            a, b = b, a
        key = bucket_key(a, b)
        entry = buckets.setdefault(key, ([], [], []))
        entry[0].append(idx)
        entry[1].append(a)
        entry[2].append(b)
        la, lb = key
        if len(entry[0]) >= flush_pairs or \
                la * lb * len(entry[0]) >= flush_cells:
            dispatch(key)
            yield from drain(max_inflight)
    for key in sorted(buckets, key=lambda k: k[0] * k[1]):
        dispatch(key)
    yield from drain(0)


def _v2_scores_eligible(sc: ScoringConfig, inline: bool, subK,
                        la: int, lb: int, is_sw: bool = False,
                        dirs: bool = False):
    """Gate for the chained v2 kernels (ops/pallas_dp2): default flags,
    free-START gaps, free-END gaps, or single no-gaps constraints, with
    in-kernel scoring (equality or packed-LUT) and f32-exactness over
    the chained band.  SW constrained modes ride the v2 SCORES kernel
    since round 5; the v2 DIRS kernel stays NW-only for them (pass
    ``dirs=True``).  Returns the packed-LUT plane count (0 for equality
    mode) or None when the v1 kernel should run instead.
    ``SEQALIGN_V2=off`` pins the v1 path."""
    if os.environ.get("SEQALIGN_V2") == "off":
        return None
    if sc.no_mismatches and not inline:
        return None  # nmm needs in-kernel equality scoring
    if dirs and is_sw and (sc.no_end_gap_penalty or sc.no_gaps_in_a
                           or sc.no_gaps_in_b):
        return None  # constrained-mode v2 DIRS kernels are NW-only
    if sc.no_gaps_in_a and sc.no_gaps_in_b:
        # both-flags fills have unreachable interior cells whose NEG_INF
        # sentinel chains WRAP in the reference's int32 arithmetic (UB)
        # and the wrapped +2^31-ish garbage wins the corner max — byte
        # parity needs the v1/XLA int32 path, not f32 -inf
        return None
    # the G-folded H = max(M, Ga, Gb) reduction needs gap_open <= 0 in
    # EVERY scoring mode (pallas_dp module docstring) — enforce it here
    # so callers that don't route through _pallas_eligible (the sharded
    # engine hooks) can't dispatch v2 on a positive-gap config
    if sc.gap_open > 0:
        return None
    from .ops.pallas_dp2 import chain_geometry, f32_safe2, lut2_eligible

    if inline:
        lut_np = 0
    else:
        # b-pad leak bound in lut2_eligible additionally needs
        # non-positive penalties (pallas_dp2._bake_packed_planes)
        if sc.gap_extend > 0:
            return None
        lut_np = lut2_eligible(sc, subK)
        if lut_np == 0:
            return None
    geo = chain_geometry(1, la, lb)
    if not f32_safe2(sc, la, lb, geo["C"], geo["W"]):
        return None
    return lut_np


def _lut_k(subK) -> int:
    """Chain length for the in-kernel LUT-scoring mode (pallas_dp lut_k):
    the a-side alphabet after kpad rounding, or 0 (plane-streaming path)
    when the select chain would outgrow its win over the HBM stream.
    SEQALIGN_LUT_KMAX tunes the cutover (default 16 ≈ where the chain's
    2*Ka ops/cell model crosses the measured ~14 GCUPS plane path; raise
    to 24+ to pull BLOSUM/PAM protein alphabets in-kernel once measured
    profitable)."""
    kmax = int(os.environ.get("SEQALIGN_LUT_KMAX", "16"))
    return int(subK.shape[0]) if subK.shape[0] <= kmax else 0


def _pallas_bs(n_pairs: int, lbt: int, lut_k: int = 0) -> int:
    """Batch-chunk sublanes for the Pallas kernels: lane packing fits P
    pairs per vector row, so a full (bs, P*LBt) tile holds bs*P pairs —
    don't pad a small batch up to 128 sublanes' worth.  Power-of-two to
    bound compile-shape count.

    For wide rows (LBt > TL, so LN = LBt lanes) the chunk shrinks to keep
    the kernel's VMEM residency (6 scratch planes + the double-buffered
    substitution block, ~LN*(24 + 2K) bytes per sublane) inside an ~8MB
    budget — measured bit-exact on TPU v5e up to LBt=4096 (bs 32)."""
    from .ops import dp
    from .ops.pallas_dp import pack_geometry

    g = pack_geometry(1, lbt)
    P, LN = g["P"], g["LN"]
    # lut mode parks lut_k static dt score planes in VMEM on top of the
    # scratch — shrink the sublane chunk to keep residency in budget
    cap = min(128, (8 << 20) // (LN * (40 + 4 * lut_k)))
    while cap & (cap - 1):
        cap &= cap - 1  # round down to a power of two
    need = -(-n_pairs // P)
    return max(8, min(cap, dp._next_pow2(need)))


def _pallas_dirs_bs(n_pairs: int, lbt: int, lut_k: int = 0) -> int:
    """Batch-chunk sublanes for the dirs kernel: 13 VMEM state planes plus
    the K-deep dirs/M output blocks (~LN*(52 + 5K) bytes per sublane) under
    a ~6MB budget — measured working at 8192 lanes with bs 8."""
    from .ops import dp
    from .ops.pallas_dp import pack_geometry

    g = pack_geometry(1, lbt)
    P, LN = g["P"], g["LN"]
    budget = (12 << 20) if LN <= 1024 else (6 << 20)
    # lut mode parks lut_k static dt score planes in VMEM on top of the
    # 13 state planes
    cap = min(128, budget // (LN * (92 + 4 * lut_k)))
    while cap & (cap - 1):
        cap &= cap - 1
    need = -(-n_pairs // P)
    return max(8, min(max(cap, 8), dp._next_pow2(need)))


def _pallas_dirs_fill(sc: ScoringConfig, seqs_a, seqs_b, *, is_sw: bool,
                      mins=None):
    """Try the Pallas direction-code kernel for a bucket (every recurrence
    mode on a real accelerator; constrained no-gaps/no-mismatch modes
    need an in-kernel scoring mode).  Returns (dirs_accessor, m_part, corner,
    na, nb, geometry) or None for XLA fallback.  m_part is a per-pair
    M-plane accessor — or, when ``mins`` (per-pair SW pruning thresholds)
    is given, the device-harvested per-pair (flats, scores) candidate list
    (M never reaches the host)."""
    if not _pallas_eligible(sc):
        return None
    from .ops import dp

    n = len(seqs_a)
    # no minimum floor here (unlike _scores_auto): dirs memory is
    # O(n*m) per pair, so padding a 1-pair long-sequence batch to 8
    # would 8x the output tensor
    npad = dp._next_pow2(n)
    if npad != n:
        # pow2 batch-count padding (round 5): ragged bucket sizes were a
        # fresh jit shape per batch — the 1-10kb E2E align phase spent
        # its wall in Mosaic recompiles.  Fillers record length 1 (the
        # kernels poison PADA cells, so SW candidate harvest can't see
        # them); every consumer indexes j < its own idx list, and the
        # device walk just walks the fillers one trivial step.
        seqs_a = list(seqs_a) + [""] * (npad - n)
        seqs_b = list(seqs_b) + [""] * (npad - n)
        if mins is not None:
            mins = np.concatenate(
                [np.asarray(mins, np.int64),
                 np.full(npad - n, np.iinfo(np.int32).max, np.int64)])
    a, na = dp.pad_batch(seqs_a)
    b, nb = dp.pad_batch(seqs_b)
    na[n:] = 1
    nb[n:] = 1
    if min(na.min(initial=1), nb.min(initial=1)) < 1:
        return None  # empty seqs: corner capture starts at diagonal 2
    floor = _pallas_pad_floor()
    la = max(floor, dp._next_pow2(a.shape[1]))
    lb = max(floor, dp._next_pow2(b.shape[1]))
    if la * lb > LONG_PAIR_CELLS:
        return None
    import jax.numpy as jnp

    from .ops.pallas_dp import (
        f32_safe, pack_geometry, pallas_fill_dirs, unpack_pair_plane,
    )

    a = np.pad(a, ((0, 0), (0, la - a.shape[1])))
    b = np.pad(b, ((0, 0), (0, lb - b.shape[1])))
    inline = dp.mm_eligible(sc)
    lut = 0
    if inline:  # in-kernel equality scoring (shared fold-canonical codes)
        ac, bc = dp.compact_inputs_mm(sc, a, b)
        subK = _DUMMY_TABLE
    else:
        ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
        del imK
        lut = _lut_k(subK)
    # Envelope: the inline-mm kernel was measured bit-exact up to 8192
    # lanes (VMEM fails past ~10k).  Without a pruning threshold, SW's
    # emit_m int32 planes bound the host fetch at 1024 lanes; with device
    # candidate extraction the M matrix never transfers, so SW gets the
    # full envelope too.  The plane path's shear/pack compile explodes past
    # 512 lanes, so large-alphabet matrix scoring keeps that limit; the
    # in-kernel LUT mode avoids the shear but parks lut_k extra VMEM
    # planes, so it takes a conservative half-envelope.
    if not inline and lut == 0:
        if sc.no_gaps_in_a or sc.no_gaps_in_b:
            return None  # plane path lacks the no-gaps guards
        lim = 512
    elif is_sw and mins is None:
        lim = 1024
    else:
        lim = 8192 if inline else 4096
    if lb > lim:
        return None
    # round-3 chained kernel first (2x the v1 dirs throughput, measured
    # 70.4 vs 35.0 GCUPS NW / 55.3 vs 35.1 SW at B>=128 L=512); the v1
    # kernel remains for the modes/widths it doesn't cover
    v2 = _v2_scores_eligible(sc, inline, None if inline else subK, la,
                             lb, is_sw=is_sw, dirs=True)
    # round-4 envelope lift: v2 dirs measured working at 4096 lanes on
    # TPU v5e (corner == scores kernel, traceback exact); 8192 compiles
    # only at K=8 with a ~9min Mosaic compile — not shipped, v1 covers
    # it.  SEQALIGN_DIRS2_LANES widens/narrows the envelope for
    # experiments (tools/exp_dirs_wide.py).
    if v2 is not None and lb <= int(os.environ.get(
            "SEQALIGN_DIRS2_LANES", "4096")):
        fast = _pallas_dirs_fill2(sc, seqs_a, seqs_b, ac, bc, na, nb,
                                  is_sw=is_sw, mins=mins, la=la, lb=lb,
                                  lut_np=v2,
                                  subK=None if inline else subK)
        if fast is not None:
            return fast
    bs = _pallas_dirs_bs(len(seqs_a), lb, lut_k=lut)
    try:
        dirs, m, corner = pallas_fill_dirs(
            jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
            jnp.asarray(nb), jnp.asarray(subK), np.int32(sc.gap_open),
            np.int32(sc.gap_extend),
            np.int32(sc.dp_floor(is_sw)), is_sw=is_sw, emit_m=is_sw,
            use_f32=f32_safe(sc, la, lb),
            ss8=bool(np.abs(subK).max(initial=0) <= 127),
            interpret=_pallas_mode() == "interpret",
            bs=bs, inline_mm=inline, lut_k=lut, match=np.int32(sc.match),
            mismatch=np.int32(sc.mismatch),
            nsg=sc.no_start_gap_penalty, neg=sc.no_end_gap_penalty,
            nga=sc.no_gaps_in_a, ngb=sc.no_gaps_in_b,
            nmm=sc.no_mismatches,
        )
        geo = pack_geometry(la, lb, bs=bs, inline=inline or lut > 0)
        # NW walks on device (round 5): never eagerly fetch the dirs
        # tensor — a wide bucket is hundreds of MB and the dev tunnel
        # moves ~20MB/s, which dominated the 1-10kb E2E align phase.
        # SW consumers (hit iteration, M planes) still read codes on
        # host, so they keep the eager fetch.
        dirs_np = np.asarray(dirs) if is_sw else None
        _note_dispatch("dirs")
    except Exception:
        _pallas_failed("dirs")
        return None
    corner_np = np.asarray(corner) if corner is not None else None
    _cache = {"np": dirs_np}

    def _fetch():
        if _cache["np"] is None:
            _cache["np"] = np.asarray(dirs)
        return _cache["np"]

    def planes(j):
        return unpack_pair_plane(_fetch(), j, geo["BS"], geo["P"], lb,
                                 geo["D"], ilv=geo["ILV"])

    def _code_at(j, y, x):
        return _v1_code_at(_fetch(), geo, lb)(j, y, x)

    planes.code_at = _code_at
    if not is_sw:
        planes.device_walk = (
            dirs, _v1_gather_cached(geo["BS"], geo["P"], geo["ILV"], lb,
                                    len(seqs_a)))
        if corner is not None:
            planes.corner_dev = corner

    if is_sw and mins is not None:
        from .ops.pallas_dp import packed_to_pair_planes

        mdev = packed_to_pair_planes(m, geo["BS"], geo["P"], lb,
                                     ilv=geo["ILV"])[: len(seqs_a)]
        m_part = dp.sw_extract_candidates(mdev, na, nb,
                                          np.asarray(mins, np.int32))
    elif m is not None:
        m_np = np.asarray(m)

        def m_part(j, _arr=m_np):
            return unpack_pair_plane(_arr, j, geo["BS"], geo["P"], lb,
                                     geo["D"], ilv=geo["ILV"])
    else:
        m_part = None

    return planes, m_part, corner_np, na, nb, geo


def _pallas_dirs_fill2(sc: ScoringConfig, seqs_a, seqs_b, ac, bc, na, nb,
                       *, is_sw: bool, mins, la: int, lb: int,
                       lut_np: int, subK):
    """v2 (chained) dirs dispatch: returns the `_pallas_dirs_fill`
    contract (planes accessor, m_part, corner, na, nb, geo) or None to
    fall through to the v1 kernel."""
    import jax.numpy as jnp

    from .ops import dp
    from .ops.pallas_dp2 import (
        chain_geometry, m16_safe, pallas_fill_dirs2, pair_planes_device2,
        unpack_pair_plane2,
    )

    unroll = _pallas_unroll(16)
    geo = chain_geometry(len(seqs_a), la, lb, K=unroll,
                         state_bytes=140, lut_np=lut_np)
    try:
        dirs, mdev, corner = pallas_fill_dirs2(
            jnp.asarray(ac), jnp.asarray(bc), jnp.asarray(na),
            jnp.asarray(nb), np.int32(sc.gap_open),
            np.int32(sc.gap_extend), is_sw=is_sw, emit_m=is_sw,
            m_i16=is_sw and m16_safe(sc, la, lb),
            match=np.int32(sc.match), mismatch=np.int32(sc.mismatch),
            subK=None if subK is None else jnp.asarray(subK),
            interpret=_pallas_mode() == "interpret", unroll=unroll,
            nsg=sc.no_start_gap_penalty, neg=sc.no_end_gap_penalty,
            nga=sc.no_gaps_in_a, ngb=sc.no_gaps_in_b,
            nmm=sc.no_mismatches, lut_np=lut_np,
        )
        # the dirs tensor is NEVER eagerly fetched (a 51MB bucket fetch
        # measured 2.9s through the dev tunnel): NW walks on device, SW
        # walks candidates on device, and the planes() accessor
        # materializes lazily for the remaining consumers
        dirs_np = None
        _note_dispatch("dirs2")
        # the NW corner stays on device: the traceback walk consumes it
        # there (one fewer tunnel round trip per bucket)
        corner_np = corner

        if is_sw and mins is not None:
            mplanes = pair_planes_device2(mdev, geo, la, lb,
                                          len(seqs_a))
            m_part = dp.sw_extract_candidates(
                mplanes, na, nb, np.asarray(mins, np.int32))
            sw_walk = _v2_sw_walker(sc, dirs, geo, ac, bc,
                                    None if subK is None else subK,
                                    lut_np, len(seqs_a))
        elif mdev is not None:
            m_np = np.asarray(mdev)
            if m_np.dtype == np.int16:  # int16 emission: host
                m_np = m_np.astype(np.int32)  # consumers expect int32

            def m_part(j, _arr=m_np):
                return unpack_pair_plane2(_arr, j, geo, la, lb)
        else:
            m_part = None
    except Exception:
        _pallas_failed("dirs2")
        return None

    cache = {"np": dirs_np}

    def planes(j):
        if cache["np"] is None:
            cache["np"] = np.asarray(dirs)
        return unpack_pair_plane2(cache["np"], j, geo, la, lb)

    planes.device_walk = (dirs, _v2_gather(geo, len(seqs_a)))
    if corner is not None:
        planes.corner_dev = corner
    if is_sw and mins is not None:
        planes.sw_walk = sw_walk
        planes.sw_na = np.asarray(na)
    return planes, m_part, corner_np, na, nb, geo


_SW_PREWALK = 16  # candidates pre-walked per pair in the batched round
# device-walker cutover: above this many harvested candidates per pair,
# per-hit device walks (one tunnel round trip each past the prewalk)
# lose to fetching the dirs once and walking on host
_SW_DEVWALK_CANDS = int(os.environ.get("SEQALIGN_SW_DEVWALK_CANDS",
                                       "4096"))


def _v2_sw_walker(sc, dirs_dev, geo, ac, bc, subK, lut_np, B):
    """Device SW candidate walker bound to a v2 fill: the SwHitIterator
    replays masking over these op traces; the direction codes never
    leave the device (traceback.SwDeviceWalker)."""
    import jax.numpy as jnp

    from .ops.traceback import SwDeviceWalker

    gather_w = _v2_gather_walk(geo["BS"], geo["P"], geo["C"], geo["W"], B)
    return SwDeviceWalker(
        dirs_dev, gather_w, jnp.asarray(ac), jnp.asarray(bc),
        jnp.asarray(subK if subK is not None else _DUMMY_TABLE),
        lut_mode=lut_np > 0, mt=sc.match, mm=sc.mismatch,
        gop=sc.gap_open + sc.gap_extend, ge=sc.gap_extend)


def _sw_prewalk(walker, cands_list, na):
    """One batched device round walking the top candidates of every
    pair (sorted with the iterator's exact tie order), plus per-pair
    walk-ahead closures for deeper consumers.  Returns (pre_paths list,
    walker-closure list)."""
    jws, x0s, y0s, s0s, owners = [], [], [], [], []
    tops = []
    for j, (flat, scv) in enumerate(cands_list):
        w = int(na[j]) + 1
        if len(flat):
            xc = flat % w
            order = np.lexsort((flat, xc, -scv))
            top = order[:_SW_PREWALK]
        else:
            top = np.zeros(0, np.int64)
        tops.append((flat, scv))
        jws.append(np.full(len(top), j, np.int64))
        x0s.append((flat[top] % w).astype(np.int64))
        y0s.append((flat[top] // w).astype(np.int64))
        s0s.append(scv[top].astype(np.int64))
        owners.append(flat[top])
    jw = np.concatenate(jws) if jws else np.zeros(0, np.int64)
    pre = [dict() for _ in cands_list]
    if len(jw):
        ops = walker.walk(jw, np.concatenate(x0s), np.concatenate(y0s),
                          np.concatenate(s0s))
        k = 0
        for j, fl in enumerate(owners):
            for f in fl:
                pre[j][int(f)] = ops[k]
                k += 1

    def mk(j):
        w = int(na[j]) + 1

        def walk_many(flats, scores):
            flats = np.asarray(flats, np.int64)
            ops = walker.walk(np.full(len(flats), j, np.int64),
                              flats % w, flats // w,
                              np.asarray(scores, np.int64))
            return {int(f): ops[i] for i, f in enumerate(flats)}

        return walk_many

    return pre, [mk(j) for j in range(len(cands_list))]


@functools.lru_cache(maxsize=256)
def _v1_gather_cached(BS, P, ilv, lb, B):
    """Device-side gather for the v1 lane-packed dirs layout (mirrors
    :func:`_v1_code_at`, but indexes the DEVICE tensor so the traceback
    can walk without fetching the dirs bytes through the tunnel).
    lru-cached so traceback._walk_jit sees one function id per
    geometry."""
    j = np.arange(B)
    i, r = np.divmod(j, BS * P)
    ss, pp = np.divmod(r, P)

    def gather(dirs, X, Y):
        lane = (Y - 1) * P + pp if ilv else pp * lb + (Y - 1)
        return dirs[i, X + Y - 2, ss, lane]

    return gather


@functools.lru_cache(maxsize=256)
def _v2_gather_cached(BS, P, C, W, B):
    j = np.arange(B)
    i, r = np.divmod(j, BS * P * C)
    sp, c = np.divmod(r, C)
    ss, pp = np.divmod(sp, P)
    cW = (c * W).astype(np.int32)

    def gather(dirs, X, Y):
        lane = (Y - 1) * P + pp if P > 1 else (Y - 1)
        return dirs[i, cW + X + Y - 1, ss, lane]

    return gather


@functools.lru_cache(maxsize=256)
def _v2_gather_walk(BS, P, C, W, B):
    """Per-walk variant of :func:`_v2_gather`: gather(dirs, jw, X, Y)
    where ``jw`` are per-walk pair indices (traced device vector — the
    per-pair metadata must be jnp so tracer indexing works)."""
    import jax.numpy as jnp

    j = np.arange(B)
    i, r = np.divmod(j, BS * P * C)
    sp, c = np.divmod(r, C)
    ss, pp = np.divmod(sp, P)
    i = jnp.asarray(i)
    ss = jnp.asarray(ss)
    pp = jnp.asarray(pp)
    cW = jnp.asarray((c * W).astype(np.int32))

    def gather(dirs, jw, X, Y):
        lane = (Y - 1) * P + pp[jw] if P > 1 else (Y - 1)
        return dirs[i[jw], cW[jw] + X + Y - 1, ss[jw], lane]

    return gather


def _v2_gather(geo, B):
    """Device-side packed-plane gather for the chained v2 layout (see
    pallas_dp2.unpack_pair_plane2): gather(dirs, X, Y) -> per-pair code
    bytes at cells (Y, X), for the on-device traceback walk.  CACHED per
    geometry so traceback._walk_jit reuses one compiled walk per
    bucket shape."""
    return _v2_gather_cached(geo["BS"], geo["P"], geo["C"], geo["W"], B)


@functools.lru_cache(maxsize=256)
def _xla_gather(B):
    """Device gather for the XLA dp_fill dirs layout (B, D, LBp)."""
    def gather(dirs, X, Y):
        import jax.numpy as jnp

        return dirs[jnp.arange(B), X + Y - 2, Y]

    return gather


def _v1_code_at(dirs_np, geo, lb):
    """Vectorized gather for the v1 lane-packed layout
    (pallas_dp.unpack_pair_plane)."""
    BS, P, ilv = geo["BS"], geo["P"], geo["ILV"]

    def code_at(j, y, x):
        i, r = np.divmod(j, BS * P)
        ss, pp = np.divmod(r, P)
        if ilv:
            lane = (y - 1) * P + pp
        else:
            lane = pp * lb + (y - 1)
        return dirs_np[i, x + y - 2, ss, lane]

    return code_at


def _pallas_long_fill(sc: ScoringConfig, seqs_a, seqs_b, *, is_sw: bool,
                      chunk: int, mins=None):
    """Try the chunked Pallas dirs fill for long pairs (boundary-column
    carry on device; in-kernel scoring — equality or small-alphabet LUT
    matrices).  Returns (per-pair dirs-slab builder, m_part, corner, na,
    nb) or None for the XLA chunked path."""
    from .ops import dp

    global _LONG_PALLAS_OK
    if not (_pallas_eligible(sc) and _LONG_PALLAS_OK):
        return None
    if sc.no_gaps_in_a or sc.no_gaps_in_b or sc.no_mismatches:
        return None  # constrained modes: XLA chunked path
    a, na = dp.pad_batch(seqs_a)
    b, nb = dp.pad_batch(seqs_b)
    if min(na.min(initial=1), nb.min(initial=1)) < 1:
        return None
    lb = max(_pallas_pad_floor(), dp._next_pow2(b.shape[1]))
    inline = dp.mm_eligible(sc)
    from .ops.pallas_dp import f32_safe, fill_dirs_long, unpack_pair_plane

    b = np.pad(b, ((0, 0), (0, lb - b.shape[1])))
    lut = 0
    subK = None
    if inline:
        ac, bc = dp.compact_inputs_mm(sc, a, b)
    else:
        ac, bc, subK, imK = dp.compact_inputs(sc, a, b)
        del imK
        lut = _lut_k(subK)
        if lut == 0:
            return None  # large alphabet: XLA chunked path
    # lanes bound |b|; SW without a pruning hint also fetches the packed M
    # chunks, so it keeps a tighter bound; lut mode takes a conservative
    # half-envelope for its extra VMEM planes
    if not inline:
        lim = 4096 if (not is_sw or mins is not None) else 1024
    else:
        lim = 8192 if (not is_sw or mins is not None) else 1024
    if lb > lim:
        return None
    try:
        dirs_chunks, m_part, corner, geo = fill_dirs_long(
            ac, bc, na, nb, np.int32(sc.gap_open), np.int32(sc.gap_extend),
            np.int32(sc.dp_floor(is_sw)), is_sw=is_sw, emit_m=is_sw,
            match=np.int32(sc.match), mismatch=np.int32(sc.mismatch),
            chunk=chunk, nsg=sc.no_start_gap_penalty,
            # f32 exactness bound must cover the FULL global path length
            neg=sc.no_end_gap_penalty, use_f32=f32_safe(sc, a.shape[1], lb),
            interpret=_pallas_mode() == "interpret",
            bs=_pallas_dirs_bs(len(seqs_a), lb, lut_k=lut),
            extract_min=mins, subK=subK, lut_k=lut,
        )
        _note_dispatch("chunked")
    except Exception:
        _pallas_failed("chunked")  # interpret mode re-raises here
        # memoize: a per-pair fallback (align_long) would otherwise retry
        # the same failing compile once per pair
        _LONG_PALLAS_OK = False
        return None
    D_c = chunk + lb - 1

    def slabs(j, chunks):
        return [unpack_pair_plane(ch, j, geo["BS"], geo["P"], lb, D_c,
                                  ilv=geo["ILV"]) for ch in chunks]

    def dirs_for(j):
        return slabs(j, dirs_chunks)

    def m_for(j):
        return slabs(j, m_part)

    mp = m_part if (is_sw and mins is not None) else (
        m_for if is_sw else None)
    return dirs_for, mp, corner, na, nb


_LONG_PALLAS_OK = True  # set False after a Mosaic failure (see except above)


def _long_subbuckets(idx, seqs_a, seqs_b):
    """Group a long-pair bucket by (pow2 |a|, pow2 |b|) so one chunked fill
    serves each group without cross-pair lane-padding waste — and without a
    short-|a| pair paying the group max's chunk count."""
    from .ops import dp

    groups = {}
    for i in idx:
        k = (dp._next_pow2(max(1, len(seqs_a[i]))),
             dp._next_pow2(max(1, len(seqs_b[i]))))
        groups.setdefault(k, []).append(i)
    return [groups[k] for k in sorted(groups)]


class _LazyPlanes:
    """Deferred per-pair dirs plane: only materialized (device fetch) if
    a consumer actually reads a code — the device-walked SW path never
    does.  Implements the ``ops.traceback`` dirs-accessor protocol."""

    def __init__(self, planes_fn, j):
        self._fn = planes_fn
        self._j = j
        self._arr = None

    def code(self, y: int, x: int) -> int:
        if self._arr is None:
            self._arr = self._fn(self._j)
        return int(self._arr[x + y - 2, y])


def _buckets(seqs_a, seqs_b, long_key: bool = True):
    """Group pair indices by padded side widths (pow2 up to 4096, then
    1024-granular — dp.pad_width) so ragged batches don't pay max-length
    padding for every pair (SURVEY §7 hard part 4).  Buckets are floored
    at 64 to bound the number of distinct compiled shapes.  With
    ``long_key`` (the alignment paths, where dirs memory is O(n*m)),
    pairs over LONG_PAIR_CELLS go to the dedicated "long" bucket key
    None; scores-only callers pass False — the chained kernel's memory
    is O(band), so giant pairs just take a (wide) regular bucket."""
    from .ops import dp

    groups = {}
    for i, (sa, sb) in enumerate(zip(seqs_a, seqs_b)):
        if long_key and len(sa) * len(sb) > LONG_PAIR_CELLS:
            key = None
        else:
            key = (max(64, dp.pad_width(len(sa))),
                   max(64, dp.pad_width(len(sb))))
        groups.setdefault(key, []).append(i)
    return groups.items()


class NeedlemanWunsch:
    """Global affine-gap aligner (Gotoh), reference parity incl. traceback."""

    def __init__(self, scoring: Optional[ScoringConfig] = None):
        self.scoring = scoring if scoring is not None else scoring_system_default()

    def align(self, seq_a: str, seq_b: str) -> Alignment:
        return self.align_batch([seq_a], [seq_b])[0]

    def align_batch(
        self, seqs_a: Sequence[str], seqs_b: Sequence[str]
    ) -> List[Alignment]:
        if os.environ.get("SEQALIGN_REF_WRAP") == "1":
            # bug-compat: the reference's exact int32-wrap semantics incl.
            # the traceback-fail abort (README known deviations)
            return [host_dp.nw_align_ref_wrap(self.scoring, a, b)[0]
                    for a, b in zip(seqs_a, seqs_b)]
        cells = sum(len(a) * len(b) for a, b in zip(seqs_a, seqs_b))
        if _route(cells, len(seqs_a), self.scoring) == "host":
            return [host_dp.nw_align(self.scoring, a, b)
                    for a, b in zip(seqs_a, seqs_b)]
        return self._align_batch_device(seqs_a, seqs_b)

    def _align_batch_device(self, seqs_a, seqs_b) -> List[Alignment]:
        from .ops import dp
        from .ops.traceback import (
            ChunkedDirs, nw_strings_from_ops, nw_traceback,
            nw_traceback_batch, nw_walk_device,
        )

        results: List[Optional[Alignment]] = [None] * len(seqs_a)
        for key, idx in _buckets(seqs_a, seqs_b):
            if key is None:  # long pairs: chunked boundary-carry path
                for sub in _long_subbuckets(idx, seqs_a, seqs_b):
                    ga = [seqs_a[i] for i in sub]
                    gb = [seqs_b[i] for i in sub]
                    fast = _pallas_long_fill(self.scoring, ga, gb,
                                             is_sw=False, chunk=2048)
                    if fast is not None:
                        dirs_for, _, corner, na, nb = fast
                        for j, i in enumerate(sub):
                            results[i] = nw_traceback(
                                ga[j], gb[j], int(na[j]), int(nb[j]),
                                ChunkedDirs(dirs_for(j), 2048), corner[j])
                    else:
                        for i in sub:
                            results[i] = self.align_long(seqs_a[i],
                                                         seqs_b[i])
                continue
            # sub-batch so the in-flight dirs tensor stays bounded (a
            # 100-pair 10kb bucket would be ~10GB of device dirs).  The
            # XLA fallback (lb past the 8192-lane v1 envelope)
            # materializes int32 M/Ga/Gb planes alongside the codes, so
            # it budgets ~20 bytes/cell instead of 1 (a B=8 10kb batch
            # measured a 17GB HBM allocation failure)
            per_cell = 1 if key[1] <= 8192 else 20
            step = max(1, ALIGN_DIRS_BUDGET // (per_cell * key[0] * key[1]))
            for s in range(0, len(idx), step):
                sub = idx[s:s + step]
                ga = [seqs_a[i] for i in sub]
                gb = [seqs_b[i] for i in sub]
                fast = _pallas_dirs_fill(self.scoring, ga, gb, is_sw=False)
                if fast is not None:
                    planes, _, corner, na, nb, geo = fast
                    if hasattr(planes, "device_walk"):
                        # on-device walk: only the ~1 byte/step op trace
                        # is fetched, never the dirs tensor (a 51MB
                        # bucket fetch measured 2.9s through the tunnel)
                        dirs_dev, gather = planes.device_walk
                        cap = int(np.max(np.asarray(na)[:len(sub)]
                                         + np.asarray(nb)[:len(sub)]))
                        ops, score = nw_walk_device(
                            dirs_dev, gather,
                            getattr(planes, "corner_dev", corner),
                            na, nb, cap)
                        alns = nw_strings_from_ops(ga, gb, na, nb, ops,
                                                   score)
                    else:
                        # vectorized whole-bucket host walk (the per-pair
                        # Python chase was 1000x the kernel fill)
                        alns = nw_traceback_batch(ga, gb, na, nb,
                                                  planes.code_at, corner)
                    for j, i in enumerate(sub):
                        results[i] = alns[j]
                    continue
                out, na, nb = dp.fill_batch(
                    self.scoring, ga, gb, is_sw=False, emit_dirs=True,
                    pow2_pad=True,
                )
                corner = np.asarray(out.corner)
                cap = int(np.max(np.asarray(na) + np.asarray(nb)))
                ops, score = nw_walk_device(out.dirs, _xla_gather(len(ga)),
                                            corner, na, nb, cap)
                alns = nw_strings_from_ops(ga, gb, na, nb, ops, score)
                for j, i in enumerate(sub):
                    results[i] = alns[j]
        return results  # type: ignore[return-value]

    def score(self, seq_a: str, seq_b: str) -> int:
        return int(self.score_batch([seq_a], [seq_b])[0])

    def score_batch(self, seqs_a, seqs_b) -> np.ndarray:
        """Scores only — no O(n*m) dirs materialization on the device path
        (Pallas wavefront kernel on TPU when eligible).  Mixed-length
        batches are pow2-bucketed, and symmetric configs canonicalize
        each pair so the lane side is the shorter sequence."""
        return _scores_bucketed(self.scoring, seqs_a, seqs_b,
                                is_sw=False)

    def align_long(self, seq_a: str, seq_b: str, chunk: int = 2048) -> Alignment:
        """Long-sequence global alignment: chunked fill with boundary-column
        carry (device memory O(chunk * len_b)); traceback walks the streamed
        per-chunk direction codes.  Equality and small-alphabet LUT
        scoring run the carry through the Pallas dirs kernel
        (fill_dirs_long); large-alphabet matrices take the XLA chunked
        scan."""
        if self.scoring.sentinel_wrap_risk():
            # int32 device fills would wrap like the reference's UB crash
            # (see _route); slow-but-correct int64 host fill instead
            return host_dp.nw_align(self.scoring, seq_a, seq_b)
        from .ops import dp
        from .ops.traceback import ChunkedDirs, nw_traceback

        fast = _pallas_long_fill(self.scoring, [seq_a], [seq_b],
                                 is_sw=False, chunk=chunk)
        if fast is not None:
            dirs_for, _, corner, na, nb = fast
            dirs = ChunkedDirs(dirs_for(0), chunk)
            return nw_traceback(seq_a, seq_b, int(na[0]), int(nb[0]), dirs,
                                corner[0])
        corner, _, dirs_chunks, _, na, nb = dp.fill_chunked(
            self.scoring, [seq_a], [seq_b], is_sw=False, chunk=chunk,
            emit_dirs=True,
        )
        dirs = ChunkedDirs([c[0] for c in dirs_chunks], chunk)
        return nw_traceback(seq_a, seq_b, int(na[0]), int(nb[0]), dirs,
                            corner[0])

    def align_with_matrices(self, seq_a: str, seq_b: str):
        """One fill shared by the alignment and the (M, Ga, Gb) row-major
        matrices (--printmatrices parity without a second fill — the
        reference prints from live fill state, tools/nw_cmdline.c:107-110)."""
        if os.environ.get("SEQALIGN_REF_WRAP") == "1":
            return host_dp.nw_align_ref_wrap(self.scoring, seq_a, seq_b)
        if _route(len(seq_a) * len(seq_b), 1, self.scoring) == "host":
            return host_dp.nw_align_with_matrices(self.scoring, seq_a, seq_b)
        from .ops import dp
        from .ops.traceback import nw_traceback

        out, na, nb = dp.fill_batch(
            self.scoring, [seq_a], [seq_b], is_sw=False, emit_dirs=True,
            emit_m=True, emit_gab=True,
        )
        aln = nw_traceback(seq_a, seq_b, na[0], nb[0],
                           np.asarray(out.dirs)[0], np.asarray(out.corner)[0])
        mats = _deskew_all(self.scoring, out, int(na[0]), int(nb[0]),
                           is_sw=False)
        return aln, mats

    def matrices(self, seq_a: str, seq_b: str):
        """Full (M, Ga, Gb) row-major matrices for --printmatrices parity."""
        return self.align_with_matrices(seq_a, seq_b)[1]


class SmithWaterman:
    """Local multi-hit aligner; ``align`` returns a stateful hit iterator.

    ``ref_mask_compat`` (or env ``SEQALIGN_SW_REF_MASK=1``) opts into the
    reference's buggy shared overlap mask across the pairs THIS instance
    aligns — one instance == one reference ``sw_aligner_t``
    (smith_waterman.c:149 quarter-reset; see traceback.SwRefMaskHistory).
    Iterators must then be consumed in pair order, as the reference's
    align/fetch loop does.
    """

    def __init__(self, scoring: Optional[ScoringConfig] = None,
                 ref_mask_compat: Optional[bool] = None):
        self.scoring = scoring if scoring is not None else scoring_system_sw_default()
        if ref_mask_compat is None:
            ref_mask_compat = os.environ.get("SEQALIGN_SW_REF_MASK") == "1"
        if ref_mask_compat:
            from .ops.traceback import SwRefMaskHistory

            self.history = SwRefMaskHistory()
        else:
            self.history = None

    def align(self, seq_a: str, seq_b: str, min_score: Optional[int] = None):
        return self.align_batch(
            [seq_a], [seq_b],
            None if min_score is None else [min_score])[0]

    def align_batch(self, seqs_a, seqs_b,
                    min_scores: Optional[Sequence[int]] = None) -> List:
        """``min_scores`` (per pair) is an optimization HINT: hits below it
        may be pruned from the stream (never walked, so best-first
        consumption up to the threshold — the CLI loop,
        sw_cmdline.c:204-216 — is byte-identical); hits >= it are exact.
        On the device paths it enables on-device candidate extraction, so
        the M matrix never transfers to host."""
        cells = sum(len(a) * len(b) for a, b in zip(seqs_a, seqs_b))
        if _route(cells, len(seqs_a)) == "host":  # SW: sentinel-free
            return [host_dp.HostSwHits(self.scoring, a, b,
                                       history=self.history)
                    for a, b in zip(seqs_a, seqs_b)]
        if min_scores is None:
            # reference hits always score > 0 (integer scores: M >= 1), so
            # a threshold of 1 prunes nothing — but it turns on the
            # on-device candidate harvest, so the M matrix never
            # transfers to host and the Pallas envelope stays at full
            # width for hint-less callers (round-2 weak item 6: the
            # 1024-lane emit_m cliff)
            min_scores = [1] * len(seqs_a)
        return self._align_batch_device(seqs_a, seqs_b, min_scores)

    def _align_batch_device(self, seqs_a, seqs_b, min_scores=None) -> List:
        from .ops import dp
        from .ops.traceback import SwHitIterator

        results: List = [None] * len(seqs_a)
        for key, idx in _buckets(seqs_a, seqs_b):
            mins = None if min_scores is None else [min_scores[i]
                                                   for i in idx]
            if key is None:  # long pairs: chunked boundary-carry path
                for sub in _long_subbuckets(idx, seqs_a, seqs_b):
                    ga = [seqs_a[i] for i in sub]
                    gb = [seqs_b[i] for i in sub]
                    msub = None if min_scores is None else \
                        [min_scores[i] for i in sub]
                    fast = _pallas_long_fill(self.scoring, ga, gb,
                                             is_sw=True, chunk=2048,
                                             mins=msub)
                    if fast is not None:
                        dirs_for, mp, _, na, nb = fast
                        from .ops.traceback import ChunkedDirs, ChunkedM
                        for j, i in enumerate(sub):
                            if msub is not None:
                                results[i] = SwHitIterator(
                                    self.scoring, ga[j], gb[j],
                                    int(na[j]), int(nb[j]),
                                    ChunkedDirs(dirs_for(j), 2048),
                                    history=self.history,
                                    candidates=mp[j])
                            else:
                                results[i] = SwHitIterator(
                                    self.scoring, ga[j], gb[j],
                                    int(na[j]), int(nb[j]),
                                    ChunkedDirs(dirs_for(j), 2048),
                                    ChunkedM(mp(j), 2048),
                                    history=self.history)
                    else:
                        for j, i in enumerate(sub):
                            results[i] = self.align_long(
                                seqs_a[i], seqs_b[i],
                                min_score=None if msub is None
                                else msub[j])
                continue
            ga = [seqs_a[i] for i in idx]
            gb = [seqs_b[i] for i in idx]
            fast = _pallas_dirs_fill(self.scoring, ga, gb, is_sw=True,
                                     mins=mins)
            if fast is not None:
                planes, m_part, _, na, nb, geo = fast
                pre = walkers = None
                if mins is not None and hasattr(planes, "sw_walk") and \
                        all(len(m_part[j][0]) <= _SW_DEVWALK_CANDS
                            for j in range(len(idx))):
                    # batched device pre-walk: hit paths come back as op
                    # traces, the dirs tensor never transfers.  Only a
                    # WIN while the candidate set is small (a real
                    # min-score hint): each deeper walk is a ~25ms
                    # tunnel round trip, so a hint-less wide pair
                    # (min=1 harvests ~every cell — 1.8M candidates at
                    # L~1300 measured) must fetch the dirs once and
                    # walk on host instead (the round-4 envelope lift
                    # silently put such pairs on the device walker;
                    # TPU_VALIDATE sw_wide_L1500 wedged for hours)
                    pre, walkers = _sw_prewalk(planes.sw_walk, m_part,
                                               planes.sw_na)
                for j, i in enumerate(idx):
                    if pre is not None:
                        results[i] = SwHitIterator(
                            self.scoring, ga[j], gb[j], int(na[j]),
                            int(nb[j]), _LazyPlanes(planes, j),
                            history=self.history, candidates=m_part[j],
                            pre_paths=pre[j], walker=walkers[j],
                        )
                    elif mins is not None:  # device-harvested candidates
                        results[i] = SwHitIterator(
                            self.scoring, ga[j], gb[j], int(na[j]),
                            int(nb[j]), planes(j), history=self.history,
                            candidates=m_part[j],
                        )
                    else:
                        results[i] = SwHitIterator(
                            self.scoring, ga[j], gb[j], int(na[j]),
                            int(nb[j]), planes(j), m_part(j),
                            history=self.history,
                        )
                continue
            out, na, nb = dp.fill_batch(
                self.scoring, ga, gb, is_sw=True, emit_dirs=True,
                emit_m=True, pow2_pad=True,
            )
            dirs = np.asarray(out.dirs)
            if mins is not None:
                # device-side harvest: M stays on device, only (flat, score)
                # candidate pairs land on host
                cands = dp.sw_extract_candidates(
                    out.mmat, na, nb, np.asarray(mins, np.int32))
                for j, i in enumerate(idx):
                    results[i] = SwHitIterator(
                        self.scoring, ga[j], gb[j], int(na[j]), int(nb[j]),
                        dirs[j], history=self.history, candidates=cands[j],
                    )
                continue
            mmat = np.asarray(out.mmat)
            for j, i in enumerate(idx):
                results[i] = SwHitIterator(
                    self.scoring, ga[j], gb[j], int(na[j]), int(nb[j]),
                    dirs[j], mmat[j], history=self.history,
                )
        return results

    def best_score(self, seq_a: str, seq_b: str) -> int:
        return int(self.best_score_batch([seq_a], [seq_b])[0])

    def best_score_batch(self, seqs_a, seqs_b) -> np.ndarray:
        return _scores_bucketed(self.scoring, seqs_a, seqs_b, is_sw=True)

    def align_long(self, seq_a: str, seq_b: str, chunk: int = 2048,
                   min_score: Optional[int] = None):
        """Long-sequence local multi-hit alignment via the chunked fill,
        streaming by default: per-chunk on-device candidate harvest, M
        slabs never materialized on host — memory is O(dirs +
        candidates), bounded for giant pairs.  (``min_score`` tightens
        the harvest threshold; the default 1 is exact — reference hits
        always score >= 1.)  Equality and small-alphabet LUT scoring run
        the carry through the Pallas dirs kernel."""
        from .ops import dp
        from .ops.traceback import ChunkedDirs, ChunkedM, SwHitIterator

        if min_score is None:
            min_score = 1

        fast = _pallas_long_fill(
            self.scoring, [seq_a], [seq_b], is_sw=True, chunk=chunk,
            mins=None if min_score is None else [min_score])
        if fast is not None:
            dirs_for, mp, _, na, nb = fast
            if min_score is not None:
                return SwHitIterator(
                    self.scoring, seq_a, seq_b, int(na[0]), int(nb[0]),
                    ChunkedDirs(dirs_for(0), chunk),
                    history=self.history, candidates=mp[0],
                )
            return SwHitIterator(
                self.scoring, seq_a, seq_b, int(na[0]), int(nb[0]),
                ChunkedDirs(dirs_for(0), chunk),
                ChunkedM(mp(0), chunk), history=self.history,
            )
        _, _, dirs_chunks, m_chunks, na, nb = dp.fill_chunked(
            self.scoring, [seq_a], [seq_b], is_sw=True, chunk=chunk,
            emit_dirs=True, emit_m=True, extract_min=min_score,
        )
        if min_score is not None:
            return SwHitIterator(
                self.scoring, seq_a, seq_b, int(na[0]), int(nb[0]),
                ChunkedDirs([c[0] for c in dirs_chunks], chunk),
                history=self.history, candidates=m_chunks[0],
            )
        return SwHitIterator(
            self.scoring, seq_a, seq_b, int(na[0]), int(nb[0]),
            ChunkedDirs([c[0] for c in dirs_chunks], chunk),
            ChunkedM([c[0] for c in m_chunks], chunk),
            history=self.history,
        )

    def align_with_matrices(self, seq_a: str, seq_b: str):
        """One fill shared by the hit iterator and the row-major matrices."""
        if _route(len(seq_a) * len(seq_b), 1) == "host":  # SW: no sentinel
            mats = host_dp.fill_matrices(self.scoring, seq_a, seq_b,
                                         is_sw=True)
            return host_dp.HostSwHits(self.scoring, seq_a, seq_b,
                                      matrices=mats,
                                      history=self.history), mats
        from .ops import dp
        from .ops.traceback import SwHitIterator

        out, na, nb = dp.fill_batch(
            self.scoring, [seq_a], [seq_b], is_sw=True, emit_dirs=True,
            emit_m=True, emit_gab=True,
        )
        hits = SwHitIterator(
            self.scoring, seq_a, seq_b, int(na[0]), int(nb[0]),
            np.asarray(out.dirs)[0], np.asarray(out.mmat)[0],
            history=self.history,
        )
        return hits, _deskew_all(self.scoring, out, int(na[0]), int(nb[0]),
                                 is_sw=True)

    def matrices(self, seq_a: str, seq_b: str):
        return self.align_with_matrices(seq_a, seq_b)[1]


def _deskew_all(sc: ScoringConfig, out, na: int, nb: int, *, is_sw):
    """Rebuild row-major matrices incl. the closed-form boundary row/col
    (alignment.c:51-81) the wavefront never materializes."""
    from .ops import dp

    mn = sc.dp_floor(is_sw)
    M = dp.deskew(np.asarray(out.mmat)[0], na, nb, fill=mn)
    Ga = dp.deskew(np.asarray(out.gamat)[0], na, nb, fill=mn)
    Gb = dp.deskew(np.asarray(out.gbmat)[0], na, nb, fill=mn)
    if is_sw:
        M[0, :] = Ga[0, :] = Gb[0, :] = 0
        M[1:, 0] = Ga[1:, 0] = Gb[1:, 0] = mn  # == 0
        M[0, 0] = Ga[0, 0] = Gb[0, 0] = 0
    else:
        xs = np.arange(1, na + 1, dtype=np.int64)
        ys = np.arange(1, nb + 1, dtype=np.int64)
        run_x = 0 if sc.no_start_gap_penalty else sc.gap_open + xs * sc.gap_extend
        run_y = 0 if sc.no_start_gap_penalty else sc.gap_open + ys * sc.gap_extend
        M[0, 1:] = Ga[0, 1:] = mn
        Gb[0, 1:] = run_x
        M[1:, 0] = Gb[1:, 0] = mn
        Ga[1:, 0] = run_y
        M[0, 0] = Ga[0, 0] = Gb[0, 0] = 0
    return M, Ga, Gb


def lcs_hits(seq: str, case_sensitive: bool = True,
             sw: Optional[SmithWaterman] = None):
    """Longest-common-substring enumeration of a sequence against itself:
    constrained SW per lcs_cmdline.c:39-64 (match 1 / mismatch -1 / open -4 /
    extend -1, no gaps, no mismatches); yields only pos_a < pos_b hits.
    Pass ``sw`` (an ``lcs_aligner()``) to reuse one aligner across calls —
    the reference lcs CLI aligns every input line with one sw_aligner_t."""
    if sw is None:
        sw = lcs_aligner(case_sensitive)
    for hit in sw.align(seq, seq):
        if hit.pos_a < hit.pos_b:
            yield hit


def lcs_aligner(case_sensitive: bool = True) -> SmithWaterman:
    """The lcs CLI's constrained SW aligner (lcs_cmdline.c:39-64)."""
    sc = ScoringConfig(
        1, -1, -4, -1,
        no_gaps_in_a=True, no_gaps_in_b=True, no_mismatches=True,
        case_sensitive=case_sensitive,
    )
    return SmithWaterman(sc)
