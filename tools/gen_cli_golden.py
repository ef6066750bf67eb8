#!/usr/bin/env python3
"""Generate CLI byte-parity fixtures by running the REFERENCE binaries
(built by tools/build_reference.sh into /tmp/refbuild) over a battery of
invocations.  Outputs committed under tests/golden/cli/ so the test suite
runs without the reference toolchain.

Each case: id, tool, args, stdin.  Stored: <id>.out (stdout), <id>.err
(stderr), <id>.rc (exit code).  The usage footer's build timestamp
('(compiled: __DATE__ __TIME__)', alignment_cmdline.c:165) is normalised to
'(compiled: STAMP)' — the only inherently build-varying bytes; the rest of
the footer line is compared exactly.
"""

import gzip
import json
import os
import re
import subprocess
import sys

STAMP_RE = re.compile(
    r"\(compiled: [A-Z][a-z]{2} [ \d]\d \d{4} \d\d:\d\d:\d\d\)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBIN = "/tmp/refbuild"
OUT = os.path.join(REPO, "tests", "golden", "cli")
INP = os.path.join(OUT, "inputs")


def build_inputs():
    os.makedirs(INP, exist_ok=True)
    with open(os.path.join(INP, "pairs.fa"), "w") as fh:
        fh.write(">seqA\nACAATAGAC\n>seqB\nACGAATAGAT\n"
                 ">seqC hello\nACGTGAC\nAGAT\n>seqD world\nGTGGACGAGTA\n")
    with open(os.path.join(INP, "left.fa"), "w") as fh:
        fh.write(">L1\nacgtacgt\n>L2\ntttggctta\n")
    with open(os.path.join(INP, "right.fa"), "w") as fh:
        fh.write(">R1\nacgttcgt\n>R2\ntttgcgtta\n")
    with open(os.path.join(INP, "plain.txt"), "w") as fh:
        fh.write("acgtacgtaa\nacttacgtca\ngggg\ngcgc\n")
    with open(os.path.join(INP, "reads.fq"), "w") as fh:
        fh.write("@r1\nacgtacgncc\n+\nIIIIIIIIII\n"
                 "@r2\nacgtacktcc\n+\nIIIIIIIIII\n")
    # mtime=0 so regeneration is byte-reproducible (no gzip-header churn)
    with open(os.path.join(INP, "pairs.fa.gz"), "wb") as raw, \
            gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as fh:
        fh.write(b">gz1\nacgtacgtgg\n>gz2\nacgtccgtgg\n")
    with open(os.path.join(INP, "submat.txt"), "w") as fh:
        fh.write("# test matrix\n  a c g t\na 2 -1 -2 -1\nc -1 3 -1 -2\n"
                 "g -2 -1 3 -1\nt -1 -2 -1 2\n")
    with open(os.path.join(INP, "subpairs.txt"), "w") as fh:
        fh.write("a a 5\na c -2\nc a -2\nc c 5\ng g 4\nt t 4\n"
                 "a g -3\ng a -3\nc t -3\nt c -3\na t -4\nt a -4\n"
                 "c g -4\ng c -4\ng t -1\nt g -1\n")
    with open(os.path.join(INP, "odd.fa"), "w") as fh:
        fh.write(">o1\nacgt\n>o2\nacct\n>o3\nagggt\n")
    with open(os.path.join(INP, "empty.txt"), "w") as fh:
        fh.write("")


def cases():
    P = lambda name: os.path.join(INP, name)
    nw = []

    def case(cid, tool, args, stdin=None):
        return dict(id=cid, tool=tool, args=args, stdin=stdin)

    protein1 = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"
    protein2 = "MKTAYIARQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ"
    out = [
        # --- NW basics ---
        case("nw_plain", "needleman_wunsch", ["CAGACGT", "CGATA"]),
        case("nw_scores", "needleman_wunsch", ["--printscores", "CAGACGT", "CGATA"]),
        case("nw_pretty", "needleman_wunsch", ["--pretty", "CAGACGT", "CGATA"]),
        case("nw_colour", "needleman_wunsch", ["--colour", "CAGACGT", "CGATA"]),
        case("nw_zam", "needleman_wunsch", ["--zam", "CAGACGT", "CGATA"]),
        case("nw_matrices", "needleman_wunsch",
             ["--printmatrices", "ACAGGT", "AAGGT"]),
        case("nw_freestart", "needleman_wunsch",
             ["--freestartgap", "--printscores", "acg", "tttacgttt"]),
        case("nw_freeboth", "needleman_wunsch",
             ["--freestartgap", "--freeendgap", "--printscores", "acg",
              "tttacgttt"]),
        case("nw_nogaps1", "needleman_wunsch",
             ["--nogapsin1", "--printscores", "aaaaacg", "acgt"]),
        case("nw_nogaps2", "needleman_wunsch",
             ["--nogapsin2", "--printscores", "aaaaacg", "acgt"]),
        # NEG_INF sentinel parity: the reference never recomputes
        # min_penalty after scoring_init, so the --printmatrices sentinel
        # stays at the PRESET's value even when --nogaps*/--mismatch change
        # the effective penalties (alignment.c:41, scoring_init 49-54)
        case("nw_nogaps_matrices", "needleman_wunsch",
             ["--printmatrices", "--nogapsin1", "--nogapsin2",
              "CAGACGT", "CGATA"]),
        case("nw_mismatch_sentinel", "needleman_wunsch",
             ["--printmatrices", "--match", "1", "--mismatch", "-9",
              "CAG", "CGA"]),
        # scoring_lookup's fatal unknown-pair error (alignment_scoring.c:
        # 177-182): --case_sensitive loads the matrix unfolded but is never
        # propagated into scoring_t (bug-compat), so folded lookups miss
        case("nw_unknown_pair", "needleman_wunsch",
             ["--case_sensitive", "--substitution_matrix",
              "seqalign_tpu/data/scoring/BLOSUM62.txt", "--nomismatches",
              "L", "RYGINL"]),
        case("sw_unknown_pair", "smith_waterman",
             ["--case_sensitive", "--substitution_matrix",
              "seqalign_tpu/data/scoring/BLOSUM62.txt", "L", "RYGINL"]),
        case("nw_nomismatch", "needleman_wunsch",
             ["--nomismatches", "--printscores", "cgatcga", "catcctcga"]),
        case("nw_custom_scores", "needleman_wunsch",
             ["--match", "3", "--mismatch", "-5", "--gapopen", "-2",
              "--gapextend", "-2", "--printscores", "acgtacgt", "acttacct"]),
        case("nw_case_sensitive", "needleman_wunsch",
             ["--case_sensitive", "--printscores", "AcGt", "acgt"]),
        case("nw_wildcard", "needleman_wunsch",
             ["--wildcard", "n", "2", "--printscores", "acgnt", "acggt"]),
        case("nw_scoring_pam30", "needleman_wunsch",
             ["--scoring", "PAM30", "--printscores", protein1, protein2]),
        case("nw_scoring_blosum62", "needleman_wunsch",
             ["--scoring", "BLOSUM62", "--pretty", "--printscores",
              protein1, protein2]),
        case("nw_scoring_dnahyb", "needleman_wunsch",
             ["--scoring", "DNA_HYBRIDIZATION", "--case_sensitive",
              "--printscores", "ACGTacgt", "ACcTaagt"]),
        case("nw_submat", "needleman_wunsch",
             ["--substitution_matrix", P("submat.txt"), "--printscores",
              "acgtacgt", "acttacct"]),
        case("nw_subpairs", "needleman_wunsch",
             ["--substitution_pairs", P("subpairs.txt"), "--printscores",
              "acgtacgt", "acttacct"]),
        # --- NW file input ---
        case("nw_file_fa", "needleman_wunsch",
             ["--printscores", "--file", P("pairs.fa")]),
        case("nw_file_fa_fasta", "needleman_wunsch",
             ["--printfasta", "--printscores", "--file", P("pairs.fa")]),
        case("nw_file_fa_fasta_pretty", "needleman_wunsch",
             ["--printfasta", "--pretty", "--file", P("pairs.fa")]),
        case("nw_file_plain", "needleman_wunsch",
             ["--printscores", "--file", P("plain.txt")]),
        case("nw_file_fq", "needleman_wunsch",
             ["--printscores", "--file", P("reads.fq")]),
        case("nw_file_gz", "needleman_wunsch",
             ["--printscores", "--file", P("pairs.fa.gz")]),
        case("nw_files_two", "needleman_wunsch",
             ["--printscores", "--files", P("left.fa"), P("right.fa")]),
        case("nw_file_odd", "needleman_wunsch",
             ["--printscores", "--file", P("odd.fa")]),
        case("nw_file_empty", "needleman_wunsch",
             ["--printscores", "--file", P("empty.txt")]),
        case("nw_stdin_pipe", "needleman_wunsch",
             ["--printscores", "--stdin"], stdin="acgtacgt\nacttacct\n"),
        case("nw_stdin_pretty", "needleman_wunsch",
             ["--stdin", "--pretty", "--printscores"],
             stdin="CAGACGT\nCGATA\nacg\nacgt\n"),
        # --- NW errors ---
        case("nw_err_matchonly", "needleman_wunsch",
             ["--match", "2", "a", "c"]),
        case("nw_err_matchless", "needleman_wunsch",
             ["--match", "-3", "--mismatch", "2", "a", "c"]),
        case("nw_err_zam_pretty", "needleman_wunsch",
             ["--zam", "--pretty", "a", "c"]),
        case("nw_err_nogap_nomismatch", "needleman_wunsch",
             ["--nogaps", "--nomismatches", "a", "c"]),
        case("nw_err_unknown", "needleman_wunsch", ["--bogus", "a", "c"]),
        case("nw_err_noinput", "needleman_wunsch", ["--printscores"]),
        case("nw_err_swflag", "needleman_wunsch",
             ["--minscore", "2", "a", "c"]),
        # --- SW ---
        case("sw_plain", "smith_waterman", ["CAGACGT", "CGATA"]),
        case("sw_pretty", "smith_waterman",
             ["--pretty", "CAGACGT", "CGATA"]),
        case("sw_colour", "smith_waterman",
             ["--colour", "CAGACGT", "CGATA"]),
        case("sw_minscore", "smith_waterman",
             ["--minscore", "2", "CAGACGT", "CGATA"]),
        case("sw_maxhits", "smith_waterman",
             ["--maxhits", "2", "--minscore", "1", "CAGACGT", "CGATA"]),
        case("sw_context", "smith_waterman",
             ["--context", "3", "--minscore", "2", "CAGACGTAAGG",
              "TTCGATAGG"]),
        case("sw_context_pretty", "smith_waterman",
             ["--context", "5", "--pretty", "--minscore", "2",
              "CAGACGTAAGG", "TTCGATAGG"]),
        case("sw_context_colour", "smith_waterman",
             ["--context", "4", "--colour", "--minscore", "2",
              "CAGACGTAAGG", "TTCGATAGG"]),
        case("sw_printseq", "smith_waterman",
             ["--printseq", "--minscore", "3", "gacag", "tgaagt"]),
        case("sw_nogaps", "smith_waterman",
             ["--nogaps", "--minscore", "1", "--match", "1", "--mismatch",
              "-2", "gacag", "tgaagt"]),
        case("sw_matrices", "smith_waterman",
             ["--printmatrices", "gacag", "tgaag"]),
        case("sw_file", "smith_waterman",
             ["--minscore", "2", "--file", P("pairs.fa")]),
        case("sw_file_fasta", "smith_waterman",
             ["--printfasta", "--printseq", "--minscore", "2", "--file",
              P("pairs.fa")]),
        case("sw_files_two", "smith_waterman",
             ["--minscore", "2", "--files", P("left.fa"), P("right.fa")]),
        case("sw_scoring_blosum62", "smith_waterman",
             ["--scoring", "BLOSUM62", "--minscore", "8", protein1,
              protein2]),
        case("sw_wildcard", "smith_waterman",
             ["--wildcard", "n", "3", "--minscore", "3", "acgnt", "ccgga"]),
        case("sw_err_empty_seq", "smith_waterman", ["", "acgt"]),
        case("sw_err_nwflag", "smith_waterman", ["--zam", "a", "c"]),
        case("sw_interactive", "smith_waterman", ["--stdin"],
             stdin="CAGACGT\nCGATA\nh\nh\na\nacgt\nacgt\nh\n"),
        # --- LCS ---
        case("lcs_basic", "lcs", ["abcxyzabc"]),
        case("lcs_repeat", "lcs", ["banana"]),
        case("lcs_dna", "lcs", ["acgtacgtgacgt"]),
        case("lcs_case", "lcs", ["ABab"]),
        case("lcs_usage", "lcs", []),
    ]
    return out


def main():
    build_inputs()
    os.makedirs(OUT, exist_ok=True)
    manifest = []
    for c in cases():
        exe = os.path.join(REFBIN, c["tool"])
        proc = subprocess.run(
            [exe] + [a.replace(INP, "@INP") if isinstance(a, str) else a
                     for a in c["args"]] if False else [exe] + c["args"],
            input=(c["stdin"] or "").encode() if c["stdin"] is not None else b"",
            capture_output=True,
        )
        stdout = proc.stdout.decode("latin-1")
        stdout = STAMP_RE.sub("(compiled: STAMP)", stdout)
        stdout = stdout.replace(REFBIN + "/", "")
        stderr = proc.stderr.decode("latin-1").replace(REFBIN + "/", "")
        with open(os.path.join(OUT, c["id"] + ".out"), "w") as fh:
            fh.write(stdout)
        with open(os.path.join(OUT, c["id"] + ".err"), "w") as fh:
            fh.write(stderr)
        rec = dict(c, rc=proc.returncode)
        rec["args"] = [a.replace(INP, "@INP") for a in c["args"]]
        manifest.append(rec)
        print(c["id"], proc.returncode)
    with open(os.path.join(OUT, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)


if __name__ == "__main__":
    main()
