"""Large-scale randomized CLI parity vs a real reference build: random
pairs (lengths 1..400) through the NW and SW CLIs, byte-compared against
/tmp/refbuild binaries.  Skipped when the reference toolchain isn't built
(tools/build_reference.sh); the committed fixture battery covers the
format space either way.

SEQALIGN_PARITY_PAIRS sets the pair count (default 2000 — the full run;
CI can dial it down).  Reference loops: alignment_cmdline.c:578-640
(two-at-a-time pair streaming), tools/sw_cmdline.c:125-311 (multi-hit
stream per pair)."""

import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_NW = "/tmp/refbuild/needleman_wunsch"
REF_SW = "/tmp/refbuild/smith_waterman"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_NW), reason="reference build absent"
)

N_PAIRS = int(os.environ.get("SEQALIGN_PARITY_PAIRS", "2000"))


def _write_pairs(path, n_pairs, seed):
    rng = np.random.default_rng(seed)
    with gzip.open(path, "wt") as fh:
        for i in range(2 * n_pairs):
            n = rng.integers(1, 400)
            fh.write(f">r{i}\n" + "".join(rng.choice(list("acgt"), n))
                     + "\n")


def test_random_pairs_byte_parity(tmp_path):
    path = tmp_path / "pairs.fa.gz"
    _write_pairs(path, N_PAIRS, 99)

    ref = subprocess.run(
        [REF_NW, "--printscores", "--pretty", "--file", str(path)],
        capture_output=True, timeout=600,
    )
    ours = subprocess.run(
        [sys.executable, "-m", "seqalign_tpu.cli.needleman_wunsch",
         "--printscores", "--pretty", "--file", str(path)],
        capture_output=True, timeout=2400, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert ours.returncode == 0, ours.stderr[-500:]
    assert ours.stdout == ref.stdout


@pytest.mark.skipif(not os.path.exists(REF_SW),
                    reason="reference sw build absent")
def test_random_pairs_sw_multihit_byte_parity(tmp_path):
    """SW multi-hit streams over random pairs: every hit line, position
    suffix, and block terminator byte-identical to the patched reference
    build (tools/sw_cmdline.c:125-311).  Smaller pair count: each pair
    emits a full best-first hit stream, so the output (and the
    reference's per-hit traceback walks) is much larger than NW's."""
    n = max(50, N_PAIRS // 4)
    path = tmp_path / "sw_pairs.fa.gz"
    _write_pairs(path, n, 1234)

    ref = subprocess.run(
        [REF_SW, "--pretty", "--file", str(path)],
        capture_output=True, timeout=600,
    )
    ours = subprocess.run(
        [sys.executable, "-m", "seqalign_tpu.cli.smith_waterman",
         "--pretty", "--file", str(path)],
        capture_output=True, timeout=2400, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert ours.returncode == 0, ours.stderr[-500:]
    assert ours.stdout == ref.stdout
