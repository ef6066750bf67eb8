"""The README/BASELINE parity anchors (SURVEY.md §6): the dna.fa.gz worked
example and the CAGACGT/CGATA single-pair case, byte-exact through our CLI.
(The reference README's printed scores -3/-5 are stale; the verified
current-code outputs are +1 and -12 — SURVEY.md 'code is ground truth'.)"""

import contextlib
import io
import os

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                    "data", "dna.fa.gz")


def _run_nw(args):
    from seqalign_tpu.cli.needleman_wunsch import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            main(["needleman_wunsch"] + args)
        except SystemExit:
            pass
    return buf.getvalue()


def test_dna_fa_gz_batch_anchor():
    out = _run_nw(["--printscores", "--file", DATA])
    assert out == (
        "AC-AATAGAC\nACGAATAGAT\nscore: 1\n\n"
        "ACGTGAC-AGAT\nGTG-GACGAGTA\nscore: -12\n\n"
    )


def test_single_pair_anchor():
    out = _run_nw(["--printscores", "CAGACGT", "CGATA"])
    assert out == "C-AGACGT\nCGATA---\nscore: -11\n\n"
