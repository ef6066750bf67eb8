"""Observability (SEQALIGN_STATS / SEQALIGN_TRACE_DIR) and checkpoint/resume
(SEQALIGN_SKIP_PAIRS / SEQALIGN_RESUME_FILE) — the SURVEY §5 aux-subsystem
rows.  Both are env-gated extensions: with the env unset, CLI bytes stay
reference-identical (covered by tests/test_cli_golden.py)."""

import contextlib
import io
import os
import sys

import pytest

from seqalign_tpu.utils.metrics import RunStats, timed


def _run_cli(main, args, stdin=None):
    out, err = io.StringIO(), io.StringIO()
    old = sys.stdin
    try:
        if stdin is not None:
            sys.stdin = io.StringIO(stdin)
        with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
            try:
                rc = main(["prog"] + args) or 0
            except SystemExit as e:
                rc = e.code or 0
    finally:
        sys.stdin = old
    return rc, out.getvalue(), err.getvalue()


def test_runstats_counters():
    rs = RunStats()
    rs.add([10, 20], [30, 5], 2.0)
    assert rs.pairs == 2
    assert rs.cells == 10 * 30 + 20 * 5
    assert rs.gcups == pytest.approx(rs.cells / 2.0 / 1e9)
    assert rs.pairs_per_s == pytest.approx(1.0)
    s = rs.summary()
    assert "pairs=2" in s and "cells=400" in s


def test_timed_accumulates():
    rs = RunStats()
    with timed(rs, [4], [5]):
        pass
    assert rs.pairs == 1 and rs.cells == 20 and rs.seconds > 0


def test_nw_cli_stats_line(monkeypatch):
    from seqalign_tpu.cli.needleman_wunsch import main

    monkeypatch.setenv("SEQALIGN_STATS", "1")
    rc, out, err = _run_cli(main, ["ACGT", "ACAT"])
    assert rc == 0
    assert "seqalign stats: pairs=1 cells=16" in err
    # stdout stays byte-identical: the summary never touches it
    assert "stats" not in out


def test_sw_cli_stats_line(monkeypatch, tmp_path):
    from seqalign_tpu.cli.smith_waterman import main

    fa = tmp_path / "p.fa"
    fa.write_text(">a\nACGTACGT\n>b\nCGTA\n>c\nTTTT\n>d\nTATT\n")
    monkeypatch.setenv("SEQALIGN_STATS", "1")
    rc, out, err = _run_cli(main, ["--file", str(fa)])
    assert rc == 0
    assert "seqalign stats: pairs=2" in err


def test_lcs_cli_stats_line(monkeypatch):
    from seqalign_tpu.cli.lcs import main

    monkeypatch.setenv("SEQALIGN_STATS", "1")
    rc, out, err = _run_cli(main, ["abcabc"])
    assert rc == 0
    assert "seqalign stats: pairs=1 cells=36" in err


def test_stats_off_no_line():
    from seqalign_tpu.cli.needleman_wunsch import main

    os.environ.pop("SEQALIGN_STATS", None)
    rc, out, err = _run_cli(main, ["ACGT", "ACAT"])
    assert rc == 0 and "stats" not in err


PAIRS_FA = (">a1\nACGTACGT\n>b1\nACTTACGT\n"
            ">a2\nGGGG\n>b2\nGGCG\n"
            ">a3\nTTTTA\n>b3\nTTATA\n")


def _nw_file_run(tmp_path, monkeypatch, env):
    from seqalign_tpu.cli.needleman_wunsch import main

    fa = tmp_path / "pairs.fa"
    fa.write_text(PAIRS_FA)
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    return _run_cli(main, ["--printscores", "--file", str(fa)])


def test_skip_pairs(tmp_path, monkeypatch):
    rc0, full, _ = _nw_file_run(tmp_path, monkeypatch, {})
    rc1, skipped, _ = _nw_file_run(tmp_path, monkeypatch,
                                   {"SEQALIGN_SKIP_PAIRS": "1"})
    assert rc0 == rc1 == 0
    blocks = full.split("\n\n")
    assert skipped == "\n\n".join(blocks[1:])


def test_skip_all_pairs_no_empty_warning(tmp_path, monkeypatch):
    # skipped pairs still count toward the reference's empty-input check
    rc, out, err = _nw_file_run(tmp_path, monkeypatch,
                                {"SEQALIGN_SKIP_PAIRS": "99"})
    assert rc == 0 and out == "" and "empty input" not in err


def test_resume_file_roundtrip(tmp_path, monkeypatch):
    off = tmp_path / "resume.off"
    rc, out1, _ = _nw_file_run(tmp_path, monkeypatch,
                               {"SEQALIGN_RESUME_FILE": str(off)})
    assert rc == 0
    assert off.read_text().strip() == "3"
    # second run with the same offset file: everything already done
    rc, out2, _ = _nw_file_run(tmp_path, monkeypatch,
                               {"SEQALIGN_RESUME_FILE": str(off)})
    assert rc == 0 and out2 == ""
    # a partially-complete offset file resumes mid-stream
    off.write_text("2\n")
    rc, out3, _ = _nw_file_run(tmp_path, monkeypatch,
                               {"SEQALIGN_RESUME_FILE": str(off)})
    assert rc == 0
    assert out3 == "\n\n".join(out1.split("\n\n")[2:])
    assert off.read_text().strip() == "3"


def test_resume_file_overrides_skip_env(tmp_path, monkeypatch):
    off = tmp_path / "resume.off"
    off.write_text("2\n")
    rc, out, _ = _nw_file_run(tmp_path, monkeypatch,
                              {"SEQALIGN_RESUME_FILE": str(off),
                               "SEQALIGN_SKIP_PAIRS": "0"})
    monkeypatch.delenv("SEQALIGN_RESUME_FILE")
    monkeypatch.delenv("SEQALIGN_SKIP_PAIRS")
    rc2, full, _ = _nw_file_run(tmp_path, monkeypatch, {})
    assert out == "\n\n".join(full.split("\n\n")[2:])


def test_sw_resume_alignment_index(tmp_path, monkeypatch):
    """Resumed SW output must continue '== Alignment N' numbering so the
    concatenation equals one uninterrupted run."""
    from seqalign_tpu.cli.smith_waterman import main

    fa = tmp_path / "p.fa"
    fa.write_text(PAIRS_FA)
    rc, full, _ = _run_cli(main, ["--file", str(fa)])
    monkeypatch.setenv("SEQALIGN_SKIP_PAIRS", "2")
    rc2, tail, _ = _run_cli(main, ["--file", str(fa)])
    assert rc == rc2 == 0
    assert "== Alignment 2 " in tail
    assert full.endswith(tail) and tail.count("== Alignment") == 1


def test_sw_resume_with_empty_pairs(tmp_path, monkeypatch):
    """Empty-sequence pairs don't consume an alignment index
    (sw_cmdline.c:136-150), so a resume must restore the INDEX from the
    offset file, not assume index == pairs completed."""
    from seqalign_tpu.cli.smith_waterman import main

    fa = tmp_path / "p.fa"
    # pair 0 ok, pair 1 has an empty sequence, pair 2 ok
    fa.write_text(">a0\nACGTACGT\n>b0\nCGTA\n"
                  ">a1\n\n>b1\nTTTT\n"
                  ">a2\nTTTTA\n>b2\nTTATA\n")
    rc, full, _ = _run_cli(main, ["--file", str(fa)])
    assert "== Alignment 1 " in full and "== Alignment 2" not in full

    off = tmp_path / "r.off"
    monkeypatch.setenv("SEQALIGN_RESUME_FILE", str(off))
    off.write_text("2 1\n")  # 2 pairs done, but only 1 alignment emitted
    rc, tail, _ = _run_cli(main, ["--file", str(fa)])
    assert rc == 0
    assert full.endswith(tail) and "== Alignment 1 " in tail
    assert off.read_text().split() == ["3", "2"]


def test_trace_dir_writes_profile(tmp_path, monkeypatch):
    from seqalign_tpu.cli.needleman_wunsch import main

    monkeypatch.setenv("SEQALIGN_TRACE_DIR", str(tmp_path / "trace"))
    rc, out, err = _run_cli(main, ["ACGT", "ACAT"])
    assert rc == 0 and "ACGT" in out
    assert (tmp_path / "trace").exists()
