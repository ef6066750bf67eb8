"""SEQALIGN_REF_WRAP=1 bug-compat: byte parity with the reference binary's
int32 sentinel-overflow behavior — wrapped matrix values AND the
'Program error: traceback fail' abort (stdout matrices dump, stderr
diagnostics, exit 1).  The overflow is C UB; the emulation matches the
binary tools/build_reference.sh produces (gcc -O2 x86-64: MAX4's head
comparison in 64-bit, else-branch + store in int32 — oracle._max4_ref).
Requires the reference toolchain; the emulation itself is also pinned
below without it."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/tmp/refbuild/needleman_wunsch"

# the round-2 live-sweep repro: reference wraps GAP_A in the end-gap
# exception column and aborts mid-traceback
ABORT_ARGS = ["--printscores", "--gapopen", "-7", "--nogaps",
              "catcgggancncgnaacccnaantcg", "cnnncgagtcgcactnactacntnacct"]


def _run(cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, capture_output=True, text=True, env=e,
                          cwd=REPO, timeout=300)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference build absent")
def test_ref_wrap_abort_byte_parity():
    ref = _run([REF] + ABORT_ARGS)
    ours = _run([sys.executable, "-m", "seqalign_tpu.cli.needleman_wunsch"]
                + ABORT_ARGS, env={"SEQALIGN_REF_WRAP": "1"})
    assert ref.returncode == 1
    assert ours.returncode == ref.returncode
    assert ours.stdout == ref.stdout  # matrices dump incl. wrapped cells
    assert ours.stderr == ref.stderr  # traceback-fail diagnostics


@pytest.mark.skipif(not os.path.exists(REF), reason="reference build absent")
def test_ref_wrap_normal_cases_unchanged():
    """Outside the overflow regime the wrap mode is the identity — normal
    CLI output stays byte-identical to the reference."""
    for args in (["--printscores", "CAGACGT", "CGATA"],
                 ["--printmatrices", "--nogapsin1", "acgtacg", "ttacgtt"]):
        ref = _run([REF] + args)
        ours = _run([sys.executable, "-m",
                     "seqalign_tpu.cli.needleman_wunsch"] + args,
                    env={"SEQALIGN_REF_WRAP": "1"})
        assert (ours.stdout, ours.stderr, ours.returncode) == \
            (ref.stdout, ref.stderr, ref.returncode), args


def test_wrap32_fill_identity_in_range():
    """wrap32 fills equal the default fill whenever nothing overflows."""
    from seqalign_tpu.ops import oracle
    from seqalign_tpu.scoring.config import ScoringConfig

    rng = np.random.default_rng(3)
    # note: both-nogaps at library construction drops gap terms from
    # min_penalty (scoring_init), so gap steps beyond |mismatch| DO wrap —
    # keep that combo's penalties inside the headroom here
    for flags, pens in (({}, (1, -2, -4, -1)),
                        (dict(no_gaps_in_a=True), (1, -2, -4, -1)),
                        (dict(no_gaps_in_a=True, no_gaps_in_b=True),
                         (1, -2, -1, -1))):
        sc = ScoringConfig(*pens, **flags)
        a = "".join(rng.choice(list("acgt"), 20))
        b = "".join(rng.choice(list("acgt"), 15))
        plain = oracle.fill_matrices(sc, a, b, is_sw=False)
        wrapped = oracle.fill_matrices(sc, a, b, is_sw=False, wrap32=True)
        for p, w in zip(plain, wrapped):
            np.testing.assert_array_equal(p, w)


def test_traceback_fail_exception_payload():
    """The TracebackFail raised by the wrap path carries the reference's
    dump values (matrix name, post-move coords, expected triple)."""
    from seqalign_tpu.ops import host_dp, oracle
    from seqalign_tpu.scoring.config import ScoringConfig

    sc = ScoringConfig(1, -2, -4, -1)
    sc.gap_open = -7  # CLI-style mutation: min_penalty stays frozen (-5)
    sc.no_gaps_in_a = sc.no_gaps_in_b = True
    sc._luts = None
    with pytest.raises(oracle.TracebackFail) as ei:
        host_dp.nw_align_ref_wrap(sc, "catcgggancncgnaacccnaantcg",
                                  "cnnncgagtcgcactnactacntnacct")
    tf = ei.value
    assert tf.matrix_name == "GAP_A" and (tf.x, tf.y) == (26, 27)
    assert tf.score == 2147483645 and tf.ega == 2147483645
    assert hasattr(tf, "matrices") and hasattr(tf, "seq_a")
