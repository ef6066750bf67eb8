"""Streaming sequence reader — the framework's equivalent of the bundled
``seq_file`` submodule (reference L1a; API known from call sites in
alignment_cmdline.c:570-640).

Auto-detects FASTA / FASTQ / plain-line input, with transparent gzip.
Yields (name, sequence) records; plain lines have name None (matching
``read->name.end == 0`` => NULL name in the reference CLI glue,
nw_cmdline.c:151-156).
"""

from __future__ import annotations

import gzip
import io
import os
import sys
from typing import Iterator, Optional, TextIO, Tuple

Record = Tuple[Optional[str], str]


def _open_stream(path: str, use_zlib: bool = True):
    """'-' = stdin; gzip sniffed by magic bytes (like seq_open).  When
    use_zlib is False and path is '-', read raw stdin without gzip wrapping
    (interactive mode, alignment_cmdline.c:570-574)."""
    if path == "-":
        if not use_zlib or not hasattr(sys.stdin, "buffer"):
            # interactive mode shares sys.stdin with the h/a keystroke
            # prompt (sw_cmdline.c:84-122) — never re-wrap/buffer it
            return sys.stdin
        raw = sys.stdin.buffer
        head = raw.peek(2)[:2] if hasattr(raw, "peek") else b""
        if head == b"\x1f\x8b":
            return io.TextIOWrapper(gzip.GzipFile(fileobj=raw),
                                    encoding="latin-1")
        return io.TextIOWrapper(raw, encoding="latin-1")
    fh = open(path, "rb")
    head = fh.read(2)
    fh.seek(0)
    if head == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.GzipFile(fileobj=fh), encoding="latin-1")
    return io.TextIOWrapper(fh, encoding="latin-1")


def read_seqs(path_or_fh, use_zlib: bool = True) -> Iterator[Record]:
    """Yield (name | None, seq) from FASTA/FASTQ/plain input."""
    fh = (
        path_or_fh
        if hasattr(path_or_fh, "read")
        else _open_stream(path_or_fh, use_zlib)
    )
    pushback: Optional[str] = None

    def getline():
        nonlocal pushback
        if pushback is not None:
            ln, pushback = pushback, None
            return ln
        return fh.readline()

    while True:
        line = getline()
        if not line:
            return
        line = line.rstrip("\r\n")
        if line == "":
            continue
        if line.startswith(">"):
            # FASTA: sequence continues until next header/@/EOF
            name = line[1:]
            seq_parts = []
            while True:
                nxt = fh.readline()
                if not nxt:
                    break
                if nxt.startswith(">") or nxt.startswith("@"):
                    pushback = nxt
                    break
                seq_parts.append(nxt.strip())
            yield (name, "".join(seq_parts))
        elif line.startswith("@"):
            # FASTQ: 4-line record
            name = line[1:]
            seq = (fh.readline() or "").rstrip("\r\n")
            plus = fh.readline()  # '+' line
            _qual = fh.readline()
            del plus, _qual
            yield (name, seq)
        else:
            # plain sequence line
            yield (None, line)


def align_from_file(path1: str, path2: Optional[str], callback,
                    use_zlib: bool = True) -> None:
    """Pair-streaming driver mirroring ``align_from_file``
    (alignment_cmdline.c:578-640): one file => two records at a time;
    two files => one record from each.  Warnings byte-match the reference."""
    def _open_records(path):
        if path != "-" and use_zlib:
            from . import native

            if native.available():
                if not os.path.exists(path):
                    raise OSError(path)
                return native.read_seqs_native(path)
        return read_seqs(path, use_zlib)

    try:
        s1 = _open_records(path1)
    except OSError:
        sys.stderr.write("Alignment Error: couldn't open file %s\n" % path1)
        sys.stderr.flush()
        return
    if path2 is None:
        s2 = s1
    else:
        try:
            s2 = _open_records(path2)
        except OSError:
            # (the reference prints path1 here too — bug-compatible,
            # alignment_cmdline.c:598)
            sys.stderr.write("Alignment Error: couldn't open file %s\n" % path1)
            sys.stderr.flush()
            return

    alignments = 0
    for r1 in s1:
        r2 = next(s2, None)
        if r2 is None:
            sys.stderr.write(
                "Alignment Error: Odd number of sequences - I read in pairs!\n"
            )
            sys.stderr.flush()
            break
        callback(r1, r2)
        alignments += 1
    if alignments == 0:
        sys.stderr.write("Alignment Warning: empty input\n")
        sys.stderr.flush()


def read_seqs_sharded(path: str, shard_index: int, num_shards: int,
                      use_zlib: bool = True) -> Iterator[Record]:
    """Round-robin record sharding for multi-host input streaming (each host
    reads every num_shards-th record; SURVEY §2.4 distributed input).  For
    pair-per-two-records files, shard by PAIR so hosts get whole pairs."""
    it = read_seqs(path, use_zlib)
    pair_idx = 0
    while True:
        r1 = next(it, None)
        if r1 is None:
            return
        r2 = next(it, None)
        if pair_idx % num_shards == shard_index:
            yield r1
            if r2 is not None:
                yield r2
        if r2 is None:
            return
        pair_idx += 1
