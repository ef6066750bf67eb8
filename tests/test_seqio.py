"""Sequence reader tests: python and native (C++) readers must agree with
each other and with the reference's record semantics on every format."""

import gzip
import os

import pytest

from seqalign_tpu.io import native, seqio

INP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden",
                   "cli", "inputs")


CASES = ["pairs.fa", "left.fa", "plain.txt", "reads.fq", "pairs.fa.gz",
         "odd.fa", "empty.txt"]


@pytest.mark.parametrize("fname", CASES)
def test_python_reader_parses(fname):
    recs = list(seqio.read_seqs(os.path.join(INP, fname)))
    if fname == "empty.txt":
        assert recs == []
        return
    assert all(s for _, s in recs)
    if fname == "pairs.fa":
        assert recs[0] == ("seqA", "ACAATAGAC")
        assert recs[2] == ("seqC hello", "ACGTGACAGAT")  # multiline seq
    if fname == "plain.txt":
        assert recs[0] == (None, "acgtacgtaa")
    if fname == "reads.fq":
        assert recs[0] == ("r1", "acgtacgncc")


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.parametrize("fname", CASES)
def test_native_reader_matches_python(fname):
    path = os.path.join(INP, fname)
    py = list(seqio.read_seqs(path))
    nat = list(native.read_seqs_native(path))
    assert nat == py


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_reader_large_roundtrip(tmp_path):
    import numpy as np

    rng = np.random.default_rng(0)
    p = tmp_path / "big.fa.gz"
    recs = []
    with gzip.open(p, "wt") as fh:
        for i in range(5000):
            seq = "".join(rng.choice(list("acgt"), rng.integers(1, 80)))
            recs.append((f"r{i}", seq))
            fh.write(f">r{i}\n{seq}\n")
    nat = list(native.read_seqs_native(str(p)))
    assert nat == recs
