"""Real-TPU validation sweep: Mosaic-compiled Pallas kernels vs the XLA
scan path (and numpy-oracle spot checks) across every production static-arg
combo — in-kernel equality scoring (inline_mm), small-alphabet LUT planes
(lut_k), protein plane-streaming, constrained modes (no-gaps /
no-mismatches / LCS recipe), free start/end gaps, ragged lengths, and
production lane widths (512-4096).

Run standalone with the TPU tunnel free (only one process may hold it):

    python tools/tpu_validate.py            # full sweep, ~minutes
    python tools/tpu_validate.py --quick    # skip the widest rows

Every scenario runs the public aligner API twice in-process — once with the
default dispatch (Pallas on TPU) and once with SEQALIGN_PALLAS=off (XLA
scan) — and requires bit-identical scores, alignment strings, and SW hit
streams.  A logging hook detects the silent Pallas->XLA fallback
(aligners._pallas_failed) and reports it as a FAIL: a fallback here means
Mosaic rejected a production shape.  Small rows additionally cross-check
the numpy oracle (ops/oracle.py) so a hypothetical shared XLA/Mosaic bug
cannot self-certify.

Reference semantics under test: alignment.c:89-167 (fill),
alignment.c:244-350 + needleman_wunsch.c:53-66 (traceback tie-breaks),
smith_waterman.c:131-277 (multi-hit enumeration).
"""

import json
import logging
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _FallbackHook(logging.Handler):
    """Captures ONLY the aligners fallback warnings ('Pallas %s path
    failed...') — any unrelated warning on the logger must not
    misclassify a scenario (ADVICE round 2)."""

    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Pallas "):
            self.events.append(msg)


def _seed(label: str) -> int:
    # deterministic across processes (str hash is salted per process)
    return zlib.crc32(label.encode())


def _ragged(rng, alpha, n, lo, hi):
    lens = rng.integers(lo, hi + 1, n)
    return ["".join(rng.choice(alpha, li)) for li in lens]


def _nw_tuples(res):
    return [(r.result_a, r.result_b, r.score) for r in res]


def _sw_tuples(iters):
    out = []
    for it in iters:
        out.append([(h.score, h.pos_a, h.pos_b, h.result_a, h.result_b)
                    for h in it])
    return out


def main():
    quick = "--quick" in sys.argv
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("tpu_validate: no accelerator (backend=cpu); interpret-mode "
              "coverage lives in tests/ — nothing to do here.")
        return 0

    from seqalign_tpu import aligners
    from seqalign_tpu.aligners import NeedlemanWunsch, SmithWaterman
    from seqalign_tpu.ops import oracle
    from seqalign_tpu.scoring.config import ScoringConfig
    from seqalign_tpu.scoring.presets import (
        scoring_system_BLOSUM62,
        scoring_system_DNA_hybridization,
        scoring_system_default,
        scoring_system_sw_default,
    )

    hook = _FallbackHook()
    logging.getLogger("seqalign_tpu.aligners").addHandler(hook)

    dna = list("acgt")
    dnan = list("acgtn")
    prot = list("ARNDCQEGHILKMFPSTWYV")
    dnacs = list("AaCcGgTt")

    def nwq():  # wildcard kills mm-eligibility -> in-kernel LUT planes (Q8)
        return scoring_system_default().add_wildcard("n", 0)

    def lcs_sc():  # lcs_cmdline.c:39-49 recipe
        return ScoringConfig(1, -1, -4, -1, no_gaps_in_a=True,
                             no_gaps_in_b=True, no_mismatches=True,
                             case_sensitive=True)

    # (label, scoring factory, alphabet, is_sw, (lo, hi) lengths, B)
    scenarios = [
        ("nw_default_inline", scoring_system_default, dna, False, (1, 500), 8),
        ("sw_default_inline", scoring_system_sw_default, dna, True, (1, 400), 6),
        ("nw_wildcard_lutQ8", nwq, dnan, False, (1, 500), 8),
        ("sw_wildcard_lutQ8", nwq, dnan, True, (1, 300), 6),
        ("nw_blosum62_planes", scoring_system_BLOSUM62, prot, False, (1, 400), 8),
        ("sw_blosum62_planes", scoring_system_BLOSUM62, prot, True, (1, 300), 6),
        ("nw_dna_hybrid_cs", scoring_system_DNA_hybridization, dnacs, False,
         (1, 300), 8),
        ("nw_free_gaps", lambda: ScoringConfig(
            1, -2, -4, -1, no_start_gap_penalty=True,
            no_end_gap_penalty=True), dna, False, (1, 500), 8),
        ("nw_nogaps_a", lambda: ScoringConfig(1, -2, -4, -1,
                                              no_gaps_in_a=True),
         dna, False, (50, 300), 8),
        ("nw_nogaps_b", lambda: ScoringConfig(1, -2, -4, -1,
                                              no_gaps_in_b=True),
         dna, False, (50, 300), 8),
        ("nw_nomismatch", lambda: ScoringConfig(1, -2, -4, -1,
                                                no_mismatches=True),
         dna, False, (1, 300), 8),
        ("sw_lcs_recipe", lcs_sc, dna, True, (20, 300), 6),
        # round 5: SW constrained modes ride the v2 SCORES kernel (dirs
        # stay v1) — alignment.c:121-155 with is_sw=1
        ("sw_free_endgaps", lambda: ScoringConfig(
            2, -2, -4, -1, no_end_gap_penalty=True), dna, True,
         (30, 300), 6),
        ("sw_nogaps_a", lambda: ScoringConfig(2, -2, -4, -1,
                                              no_gaps_in_a=True),
         dna, True, (30, 300), 6),
        ("sw_nogaps_b", lambda: ScoringConfig(2, -2, -4, -1,
                                              no_gaps_in_b=True),
         dna, True, (30, 300), 6),
    ]
    if not quick:
        scenarios += [
            ("nw_wide_L2000", scoring_system_default, dna, False,
             (1800, 2000), 4),
            ("sw_wide_L1500", scoring_system_sw_default, dna, True,
             (1200, 1500), 3),
            ("nw_wide_lut_L1800", nwq, dnan, False, (1600, 1800), 4),
            ("nw_wide_L3900", scoring_system_default, dna, False,
             (3700, 3900), 2),
            # round 5: the 1-10kb regime — wide-lane v2 scores + v1 dirs
            # with the on-device walk (no dirs fetch).  The >8192-lane
            # XLA tier has no Pallas dispatch to compare (PALLAS=off is
            # the same route), so its parity lives in
            # tools/exp_dirs_wide.py's host-DP assert instead.
            ("nw_wide_L6000", scoring_system_default, dna, False,
             (5800, 6000), 2),
        ]

    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = sys.argv[i + 1]
    results = []
    fails = 0
    os.environ["SEQALIGN_FORCE"] = "device"

    def _dump_partial():
        # incremental dump: a wedged tunnel mid-sweep must not lose the
        # completed scenarios (round 5: sw_wide_L1500 wedged twice)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TPU_VALIDATE_partial.json")
        with open(path, "w") as fh:
            json.dump({"backend": backend, "fails": fails,
                       "results": results, "partial": True}, fh, indent=1)

    for label, mk, alpha, is_sw, (lo, hi), B in scenarios:
        if only and only not in label:
            continue
        rng = np.random.default_rng(_seed(label))
        sc = mk()
        # the device pin below must actually hold: the NW wrap-risk regime
        # reroutes to host BEFORE SEQALIGN_FORCE (aligners._route), which
        # would silently compare host against host (ADVICE round 2).  SW
        # has no sentinel (clamps at 0; _route takes sc=None for SW).
        assert is_sw or not sc.sentinel_wrap_risk(), label
        sa = _ragged(rng, alpha, B, lo, hi)
        sb = _ragged(rng, alpha, B, lo, hi)
        t0 = time.perf_counter()
        status, detail = "OK", ""
        try:
            os.environ.pop("SEQALIGN_PALLAS", None)
            n_ev = len(hook.events)
            n_disp = sum(aligners.pallas_dispatch_counts().values())
            if is_sw:
                al = SmithWaterman(sc)
                got_s = al.best_score_batch(sa, sb)
                got = _sw_tuples(al.align_batch(list(sa), list(sb)))
            else:
                al = NeedlemanWunsch(sc)
                got_s = al.score_batch(sa, sb)
                got = _nw_tuples(al.align_batch(sa, sb))
            fell_back = hook.events[n_ev:]
            new_disp = (sum(aligners.pallas_dispatch_counts().values())
                        - n_disp)

            os.environ["SEQALIGN_PALLAS"] = "off"
            if is_sw:
                want_s = al.best_score_batch(sa, sb)
                want = _sw_tuples(al.align_batch(list(sa), list(sb)))
            else:
                want_s = al.score_batch(sa, sb)
                want = _nw_tuples(al.align_batch(sa, sb))

            if fell_back:
                status, detail = "FALLBACK", "; ".join(fell_back)[:160]
            elif new_disp == 0:
                # an OK without any kernel dispatch would self-certify
                # XLA against XLA (eligibility gates silently returning
                # None) — surface it as a failure
                status, detail = "NOPALLAS", \
                    "no Pallas kernel dispatched (gates routed to XLA)"
            elif not np.array_equal(np.asarray(got_s), np.asarray(want_s)):
                status, detail = "FAIL", "score mismatch %s vs %s" % (
                    np.asarray(got_s).tolist(), np.asarray(want_s).tolist())
            elif got != want:
                bad = next(i for i, (g, w) in enumerate(zip(got, want))
                           if g != w)
                status, detail = "FAIL", "alignment mismatch at pair %d" % bad
            else:
                # oracle spot check on the smallest pair (skip wide rows —
                # the oracle is a per-cell python loop)
                i = int(np.argmin([len(x) * len(y) for x, y in zip(sa, sb)]))
                if len(sa[i]) * len(sb[i]) <= 250_000:
                    if is_sw:
                        o = [(h["score"], h["pos_a"], h["pos_b"],
                              h["result_a"], h["result_b"])
                             for h in oracle.SwOracle(sc, sa[i], sb[i]).hits()]
                        if got[i] != o:
                            status, detail = "FAIL", "oracle mismatch (sw)"
                    else:
                        o = oracle.nw_align(sc, sa[i], sb[i])
                        if got[i] != o:
                            status, detail = "FAIL", "oracle mismatch (nw)"
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            status, detail = "ERROR", ("%s: %s" % (type(e).__name__, e))[:200]
        finally:
            os.environ.pop("SEQALIGN_PALLAS", None)
        dt = time.perf_counter() - t0
        rec = {"label": label, "status": status, "secs": round(dt, 1)}
        if detail:
            rec["detail"] = detail
        results.append(rec)
        fails += status != "OK"
        print(json.dumps(rec), flush=True)
        _dump_partial()

    # chunked long fill through the Pallas dirs kernel: equality (inline)
    # and LUT scoring carry paths, pallas vs XLA-off (dp.fill_chunked)
    if not quick:
        for label, mk, alpha, blen in [
            ("nw_long_chunked_inline", scoring_system_default, dna, 4500),
            # the LUT chunked kernel's lane envelope is 4096 (its static
            # VMEM planes take the conservative half-envelope) — size b
            # inside it so the scenario validates the kernel, not the
            # designed XLA fallback beyond it
            ("nw_long_chunked_lut", nwq, dnan, 3500),
        ]:
            rng = np.random.default_rng(_seed(label))
            a = "".join(rng.choice(alpha, 5000))
            b = "".join(rng.choice(alpha, blen))
            t0 = time.perf_counter()
            status, detail = "OK", ""
            try:
                os.environ.pop("SEQALIGN_PALLAS", None)
                n_ev = len(hook.events)
                n_disp = sum(aligners.pallas_dispatch_counts().values())
                nw = NeedlemanWunsch(mk())
                g = nw.align_long(a, b, chunk=2048)
                fell_back = hook.events[n_ev:]
                new_disp = (sum(aligners.pallas_dispatch_counts().values())
                            - n_disp)
                os.environ["SEQALIGN_PALLAS"] = "off"
                w = nw.align_long(a, b, chunk=2048)
                if fell_back:
                    status, detail = "FALLBACK", "; ".join(fell_back)[:160]
                elif new_disp == 0:
                    status, detail = "NOPALLAS", \
                        "no Pallas kernel dispatched"
                elif (g.result_a, g.result_b, g.score) != (
                        w.result_a, w.result_b, w.score):
                    status, detail = "FAIL", "long-chunk mismatch"
            except Exception as e:  # noqa: BLE001
                status = "ERROR"
                detail = ("%s: %s" % (type(e).__name__, e))[:200]
            finally:
                os.environ.pop("SEQALIGN_PALLAS", None)
            rec = {"label": label, "status": status,
                   "secs": round(time.perf_counter() - t0, 1)}
            if detail:
                rec["detail"] = detail
            results.append(rec)
            fails += status != "OK"
            print(json.dumps(rec), flush=True)
            _dump_partial()

    out = {"backend": backend, "fails": fails, "results": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_VALIDATE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("tpu_validate: %d/%d OK -> %s"
          % (len(results) - fails, len(results), path))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
