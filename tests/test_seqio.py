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


# ---------------------------------------------------------------------------
# SAM / BAM (reference seq_file surface, README.md:28)
# ---------------------------------------------------------------------------

SAM_TEXT = (
    "@HD\tVN:1.6\tSO:unsorted\n"
    "@SQ\tSN:chr1\tLN:1000\n"
    "r1\t0\tchr1\t10\t60\t4M\t*\t0\t0\tACGT\tFFFF\n"
    "r2\t16\tchr1\t20\t60\t6M\t*\t0\t0\tGGTACA\t*\tNM:i:0\n"
    "rstar\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n"
)
SAM_RECORDS = [("r1", "ACGT"), ("r2", "GGTACA"), ("rstar", "")]


def _make_bam_bytes():
    """Hand-build a minimal BAM (SAM spec 4.2) with the SAM_RECORDS reads."""
    import struct

    code = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}

    def rec(name, seq):
        nb = name.encode() + b"\x00"
        packed = bytearray()
        for i in range(0, len(seq), 2):
            hi = code[seq[i]] << 4
            lo = code[seq[i + 1]] if i + 1 < len(seq) else 0
            packed.append(hi | lo)
        body = struct.pack(
            "<iiBBHHHiiii", -1, -1, len(nb), 0, 4680, 0, 0, len(seq),
            -1, -1, 0,
        ) + nb + bytes(packed) + b"\xff" * len(seq)
        return struct.pack("<i", len(body)) + body

    header = b"BAM\x01" + struct.pack("<i", 11) + b"@HD\tVN:1.6\n"
    header += struct.pack("<i", 1)  # n_ref
    header += struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i", 1000)
    payload = header + b"".join(rec(n, s) for n, s in SAM_RECORDS)
    return gzip.compress(payload)


@pytest.fixture()
def sam_path(tmp_path):
    p = tmp_path / "reads.sam"
    p.write_text(SAM_TEXT)
    return str(p)


@pytest.fixture()
def bam_path(tmp_path):
    p = tmp_path / "reads.bam"
    p.write_bytes(_make_bam_bytes())
    return str(p)


def test_python_reads_sam(sam_path):
    assert list(seqio.read_seqs(sam_path)) == SAM_RECORDS


def test_python_reads_headerless_sam(tmp_path):
    p = tmp_path / "nohdr.sam"
    p.write_text("".join(
        line + "\n" for line in SAM_TEXT.splitlines()
        if not line.startswith("@")
    ))
    assert list(seqio.read_seqs(str(p))) == SAM_RECORDS


def test_python_reads_sam_gz(tmp_path):
    p = tmp_path / "reads.sam.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(SAM_TEXT)
    assert list(seqio.read_seqs(str(p))) == SAM_RECORDS


def test_python_reads_bam(bam_path):
    assert list(seqio.read_seqs(bam_path)) == SAM_RECORDS


def test_fastq_at_name_not_misdetected_as_sam(tmp_path):
    # '@SQ...' as a FASTQ read name must still parse as FASTQ when the
    # line has no SAM header shape
    p = tmp_path / "t.fq"
    p.write_text("@SQ99 read\nacgt\n+\nFFFF\n")
    assert list(seqio.read_seqs(str(p))) == [("SQ99 read", "acgt")]


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_reads_sam(sam_path):
    assert list(native.read_seqs_native(sam_path)) == SAM_RECORDS


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_reads_sam_gz(tmp_path):
    p = tmp_path / "reads.sam.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(SAM_TEXT)
    assert list(native.read_seqs_native(str(p))) == SAM_RECORDS


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_reads_headerless_sam(tmp_path):
    p = tmp_path / "nohdr.sam"
    p.write_text("".join(
        line + "\n" for line in SAM_TEXT.splitlines()
        if not line.startswith("@")
    ))
    assert list(native.read_seqs_native(str(p))) == SAM_RECORDS


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_reads_bam(bam_path):
    assert list(native.read_seqs_native(bam_path)) == SAM_RECORDS
