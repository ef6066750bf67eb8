"""The reference's Perl wrapper modules (perl/NeedlemanWunsch.pm,
perl/SmithWaterman.pm) screen-scrape the CLI stdout and drive the interactive
keystroke protocol — they are executable specifications of the output
contract.  Run them UNMODIFIED against OUR CLIs."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PERL_DIR = "/root/reference/perl"

pytestmark = pytest.mark.skipif(
    shutil.which("perl") is None or not os.path.isdir(PERL_DIR),
    reason="perl or reference perl modules unavailable",
)


def _run_perl(script: str) -> str:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        ["perl", "-I", PERL_DIR, "-e", script],
        capture_output=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    return proc.stdout.decode()


def _py_cmd(tool: str) -> str:
    return os.path.join(REPO, "bin", tool)


def test_perl_needleman_wunsch_module_drives_our_cli():
    script = r"""
use strict; use warnings;
use NeedlemanWunsch;
my $nw = new NeedlemanWunsch(cmd => '%s', timeout => 600);
for my $pair (['asdfasdf','asdfasdf'], ['dogg','ggod'], ['CAGACGT','CGATA']) {
  my $r = $nw->do_alignment(@$pair);
  print join("|", $r->{'align1'}, $r->{'align2'}, $r->{'score'}), "\n";
}
$nw->destructor();
""" % _py_cmd("needleman_wunsch")
    out = _run_perl(script)
    lines = out.strip().split("\n")
    # NeedlemanWunsch.pm prints a debug "running '...'" line first (pm:87)
    lines = [ln for ln in lines if not ln.startswith("running ")]
    assert lines[0] == "asdfasdf|asdfasdf|8"
    assert lines[2] == "C-AGACGT|CGATA---|-11"


def test_perl_smith_waterman_module_drives_our_cli():
    script = r"""
use strict; use warnings;
use SmithWaterman;
my $sw = new SmithWaterman(cmd => '%s', timeout => 600);
$sw->do_alignment('CAGACGT', 'CGATA');
for (1..2) {
  my $h = $sw->get_next_hit();
  last if !defined($h);
  print join("|", $h->{'align1'}, $h->{'align2'}, $h->{'score'},
             $h->{'pos1'}, $h->{'pos2'}), "\n";
}
$sw->destructor();
""" % _py_cmd("smith_waterman")
    out = _run_perl(script)
    lines = out.strip().split("\n")
    assert lines[0] == "GA|GA|4|2|1"
    assert lines[1] == "CG|CG|4|4|0"
