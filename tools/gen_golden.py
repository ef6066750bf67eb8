#!/usr/bin/env python3
"""Generate golden parity fixtures by driving the REFERENCE C library.

Requires the reference core built as /tmp/refbuild/golden_gen (see
tools/build_reference.sh). Writes tests/golden/cases.tsv (inputs) and
tests/golden/golden.tsv (reference outputs). Both are committed so the test
suite runs without the reference toolchain.

Line protocol (input):
  <mode> <match> <mismatch> <go> <ge> <flags6> <seqa|.> <seqb|.> [extras]
  extras: W <c> <s> | S <a> <b> <s> | U <0|1> | P <preset> | L <min> | H <max>
Outputs: NW\tscore\ta\tb | SWHIT\tscore\tpa\tpb\tla\tlb\ta\tb | SWEND |
         MATRIX\tname\tw\th\t<w*h ints>
"""

import random
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GEN = "/tmp/refbuild/golden_gen"

def rand_seq(rng, maxlen, alpha="acgt", minlen=0):
    n = rng.randint(minlen, maxlen)
    return "".join(rng.choice(alpha) for _ in range(n))


def main():
    # argv: [seed] [out_dir] — default regenerates the COMMITTED fixtures
    # byte-identically; a fresh seed + scratch dir gives an independent
    # soak corpus (run the golden tests against it with
    # SEQALIGN_GOLDEN_DIR=<out_dir>)
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260816
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(REPO, "tests", "golden")
    rng = random.Random(seed)
    lines = []

    def case(mode, m, mm, go, ge, flags, a, b, extras=""):
        a = a or "."
        b = b or "."
        lines.append(f"{mode} {m} {mm} {go} {ge} {flags} {a} {b} {extras}".rstrip())

    # --- README / survey parity anchors ---
    case("nw", 1, -2, -4, -1, "000000", "CAGACGT", "CGATA")
    case("sw", 2, -2, -2, -1, "000000", "CAGACGT", "CGATA")
    case("mat", 1, -2, -4, -1, "000000", "ACAGGT", "AAGGT")
    case("nw", 1, -2, -4, -1, "000000",
         "ACAATAGAC", "ACGAATAGAT")
    case("nw", 1, -2, -4, -1, "000000", "ACGTGAGAGT", "GTGGACGAGTA")

    # --- reference unit tests (tests.c) ---
    case("nw", 1, -2, -4, -1, "001001", "aaaaacg", "acgt")      # no_gaps_in_a
    case("nw", 1, -1, -4, -1, "110001", "acg", "tttacgttt")     # free ends
    case("nw", 1, -2, -4, -1, "000011", "atc", "ac")            # no_mismatches
    case("nw", 1, -2, -4, -1, "000011", "cgatcga", "catcctcga")
    case("sw", 1, -2, -4, -1, "001101", "gacag", "tgaagt")      # no_gaps SW

    # --- randomized DNA, default + varied scoring, all flag combos ---
    flagsets = ["000000", "100000", "010000", "110000", "001000", "000100",
                "001100", "000010", "000001", "100001", "011000", "110001"]
    scoresets = [(1, -2, -4, -1), (2, -2, -2, -1), (1, -1, 0, -1), (5, -4, -10, -1),
                 (1, -2, -4, 0), (3, -3, -6, -2), (0, 0, -10, -10), (1, -1, -1, -1)]
    for i in range(160):
        fl = flagsets[i % len(flagsets)]
        m, mm, go, ge = scoresets[i % len(scoresets)]
        a = rand_seq(rng, 48)
        b = rand_seq(rng, 48)
        # NW can't do no_mismatches+no_gaps (alignment_cmdline.c:502-508)
        nw_ok = not (fl[4] == "1" and (fl[2] == "1" or fl[3] == "1"))
        # With BOTH no-gaps flags, scoring_init omits gap terms from
        # min_penalty (alignment_scoring.c:51-54) so the last-row/col gap
        # transitions (alignment.c:128-155) can wrap int32 (reference UB:
        # sentinel + gap penalty < INT_MIN). Out of contract — skip.
        if fl[2] == "1" and fl[3] == "1" and min(m, mm) > min(go + ge, ge):
            nw_ok = False
        if nw_ok:
            case("nw", m, mm, go, ge, fl, a, b)
        # SW ignores no_START_gap (the is_sw boundary init is all-zero,
        # alignment.c:51-57) but RESPECTS no_END_gap: the free last-col/
        # last-row branches (alignment.c:121-155) are NOT gated on is_sw,
        # so library embedders reach them even though the reference CLI
        # rejects --freeendgap for sw (alignment_cmdline.c:263-267).
        # Round 5: emit sw fixtures for those combos too (dedupe the
        # nsg-only ones, which are fill-identical to plain sw).
        if fl[0] == "0" or fl[1] == "1":
            case("sw", m, mm, go, ge, fl, a, b)

    # mixed-case sequences, case sensitive + insensitive
    for i in range(24):
        a = rand_seq(rng, 30, alpha="acgtACGT")
        b = rand_seq(rng, 30, alpha="acgtACGT")
        case("nw", 1, -2, -4, -1, "000000", a, b)
        case("nw", 1, -2, -4, -1, "000001", a, b)
        case("sw", 2, -2, -2, -1, "000001", a, b)

    # wildcards
    for i in range(24):
        a = rand_seq(rng, 30, alpha="acgtN")
        b = rand_seq(rng, 30, alpha="acgtN")
        if not a or not b:
            continue
        case("nw", 1, -2, -4, -1, "000000", a, b, "W N 0")
        case("sw", 2, -2, -2, -1, "000000", a, b, "W N 1")
        case("nw", 1, -2, -4, -1, "000010", a, b, "W N 0")  # no_mismatch + wild

    # custom substitution pairs (asymmetric, like examples/nw_example.c:50-51)
    for i in range(16):
        a = rand_seq(rng, 24)
        b = rand_seq(rng, 24)
        case("nw", 1, -2, -4, -1, "000000", a, b, "S a c -1 S c a 2 S g t 1")
        case("sw", 2, -2, -2, -1, "000000", a, b, "S t g 3 U 1")

    # protein presets
    prots = [rand_seq(rng, 40, alpha="ARNDCQEGHILKMFPSTWYV", minlen=1) for _ in range(12)]
    for i, (pa, pb) in enumerate(zip(prots[::2], prots[1::2])):
        for preset in ("PAM30", "PAM70", "BLOSUM80", "BLOSUM62"):
            case("nw", 1, -2, -4, -1, "000000", pa, pb, f"P {preset}")
            case("sw", 1, -2, -4, -1, "000000", pa, pb, f"P {preset}")
    # DNA hybridization
    for i in range(6):
        a = rand_seq(rng, 24, minlen=1)
        b = rand_seq(rng, 24, minlen=1)
        case("nw", 1, -2, -4, -1, "000000", a, b, "P DNAHYB")

    # empty / degenerate
    case("nw", 1, -2, -4, -1, "000000", ".", "ACGT")
    case("nw", 1, -2, -4, -1, "000000", "ACGT", ".")
    case("nw", 1, -2, -4, -1, "000000", ".", ".")
    case("nw", 1, -2, -4, -1, "100000", ".", "ACGT")
    case("nw", 1, -2, -4, -1, "000000", "A", "A")
    case("nw", 1, -2, -4, -1, "000000", "A", "T")
    case("sw", 2, -2, -2, -1, "000000", "A", "A")

    # SW with min_score / max_hits filters
    for i in range(10):
        a = rand_seq(rng, 40, minlen=5)
        b = rand_seq(rng, 40, minlen=5)
        case("sw", 2, -2, -2, -1, "000000", a, b, "L 4 H 5")

    # LCS mode: SW self-alignment, nogaps+nomismatch+case_sensitive
    for i in range(8):
        s = rand_seq(rng, 30, minlen=2)
        case("sw", 1, -1, -4, -1, "001111", s, s)

    # matrices dumps for printmatrices parity (incl. free-end + sw)
    case("mat", 1, -2, -4, -1, "110000", "ACGT", "CGT")
    case("mat", 1, -2, -4, -1, "000010", "atc", "ac")
    case("swmat", 2, -2, -2, -1, "000000", "CAGACGT", "CGATA")

    inp = "\n".join(lines) + "\n"
    out = subprocess.run([GEN], input=inp, capture_output=True, text=True, check=True)
    if out.stderr:
        sys.stderr.write(out.stderr)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cases.tsv"), "w") as fh:
        fh.write(inp)
    with open(os.path.join(out_dir, "golden.tsv"), "w") as fh:
        fh.write(out.stdout)
    print(f"seed={seed}: {len(lines)} cases -> "
          f"{len(out.stdout.splitlines())} golden lines -> {out_dir}")


if __name__ == "__main__":
    main()
