#!/bin/sh
# Build the reference seq-align CLI binaries + core library in /tmp/refbuild,
# using the minimal submodule shims in tools/refshim (the reference's git
# submodules are not checked out in the read-only mount).
# Used only to (re)generate tests/golden fixtures; the test suite itself does
# not need this.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
OUT=/tmp/refbuild
mkdir -p "$OUT"


# Patch a genuine reference bug for fixture generation: smith_waterman.c
# clears only (l+31)/32 BYTES of the uint32-word overlap-mask bitset between
# pairs (smith_waterman.c:149), i.e. a quarter of it — stale mask bits from a
# previous pair then suppress hits in later pairs.  Our framework implements
# the intended semantics (full mask reset per alignment), so fixtures are
# generated against the fixed behavior.  Documented in README.
mkdir -p "$OUT/patched"
sed 's#(hist->match_scores_mask.l+31)/32#(hist->match_scores_mask.l+7)/8#' \
    "$REF/src/smith_waterman.c" > "$OUT/patched/smith_waterman.c"

CFLAGS="-O2 -std=gnu99 -Wall -I$REPO/tools/refshim -I$REF/src"
SRCS="$REF/src/alignment.c $REF/src/alignment_scoring.c \
      $REF/src/alignment_scoring_load.c $REF/src/alignment_cmdline.c \
      $REF/src/needleman_wunsch.c $OUT/patched/smith_waterman.c"

gcc $CFLAGS -o "$OUT/needleman_wunsch" $SRCS "$REF/src/tools/nw_cmdline.c" -lz
gcc $CFLAGS -o "$OUT/smith_waterman" $SRCS "$REF/src/tools/sw_cmdline.c" -lz
gcc $CFLAGS -o "$OUT/lcs" $SRCS "$REF/src/tools/lcs_cmdline.c" -lz
# Library-level fixture driver (tests/golden/{cases,golden}.tsv protocol —
# see tools/gen_golden.py)
gcc $CFLAGS -o "$OUT/golden_gen" $SRCS "$REPO/tools/refshim/golden_gen.c" -lz

# Also build the UNPATCHED smith_waterman (the real reference binary, with
# the quarter-mask-reset bug intact) — used by the strict bug-compat parity
# test (tests/test_sw_mask_compat.py, SEQALIGN_SW_REF_MASK=1).
SRCS_UNPATCHED="$REF/src/alignment.c $REF/src/alignment_scoring.c \
      $REF/src/alignment_scoring_load.c $REF/src/alignment_cmdline.c \
      $REF/src/needleman_wunsch.c $REF/src/smith_waterman.c"
gcc $CFLAGS -o "$OUT/smith_waterman_unpatched" $SRCS_UNPATCHED \
    "$REF/src/tools/sw_cmdline.c" -lz
echo "built: $OUT/{needleman_wunsch,smith_waterman,smith_waterman_unpatched,lcs}"
