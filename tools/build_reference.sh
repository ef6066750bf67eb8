#!/bin/sh
# Build the reference seq-align core library + golden_gen driver in /tmp/refbuild.
# Used only to (re)generate tests/golden fixtures; the test suite itself does
# not need this. The reference's git submodules are absent, so sort_r is
# provided as a qsort_r shim.
set -e
mkdir -p /tmp/refbuild/sort_r
# (shim + driver sources are created by tools/gen_golden setup; see repo history)
